"""Round-2 compiler fixes: BEGIN/END word boundaries, quote-aware @var
expansion, parenthesized hint values (WITH (JSON PATH (a,b))), procedure
OUT params (core:ops/sql/Procedure.scala:10-26), and AVRO hint routing
(core:SQLLanguageParser.scala:455-459)."""

import json
import os

import pytest

from qwery_spark.compiler import ScriptEngine
from qwery_spark.compiler.engine import parse_hints, split_statements


@pytest.fixture()
def eng(spark):
    return ScriptEngine(spark)


# ---------------- BEGIN/END boundaries ----------------
def test_split_ignores_identifiers_ending_in_end():
    """'trend' / 'weekend' / 'end_time' must not close a block."""
    script = (
        "CREATE PROCEDURE p() AS BEGIN "
        "SET @x = (SELECT max(trend) FROM t); "
        "SELECT weekend, end_time FROM u; "
        "END; SELECT 9"
    )
    stmts = split_statements(script)
    assert len(stmts) == 2
    assert "end_time" in stmts[0]
    assert stmts[1] == "SELECT 9"


def test_split_ignores_identifiers_starting_with_keywords():
    script = "SELECT beginner, ending FROM t; SELECT 2"
    assert len(split_statements(script)) == 2


def test_procedure_body_with_trend_column(eng, tmp_path):
    import pandas as pd

    src = str(tmp_path / "trend.csv")
    pd.DataFrame({"trend": [1, 5, 3]}).to_csv(src, index=False)
    out = eng.run_script(
        f"CREATE PROCEDURE p() AS BEGIN "
        f"SET @m = (SELECT max(CAST(trend AS INT)) FROM '{src}'); "
        f"SELECT @m AS max_trend; END; "
        f"CALL p()"
    )
    assert out[-1].collect()[0]["max_trend"] == 5


# ---------------- quote-aware @var expansion ----------------
def test_at_sign_inside_string_literal_is_not_a_variable(eng):
    df = eng.execute("SELECT 'bob@example.com' AS email")
    assert df.collect()[0]["email"] == "bob@example.com"


def test_at_var_still_expands_outside_quotes(eng):
    eng.execute("SET @lim = 3")
    row = eng.execute("SELECT @lim AS v, 'keep @lim literal' AS s").collect()[0]
    assert row["v"] == 3
    assert row["s"] == "keep @lim literal"


def test_escaped_quotes_dont_break_tracking(eng):
    eng.execute("SET @x = 1")
    row = eng.execute("SELECT 'it''s @here' AS s, @x AS v").collect()[0]
    assert row["s"] == "it's @here"
    assert row["v"] == 1


def test_template_vars_expand_inside_quoted_paths(eng, tmp_path):
    import pandas as pd

    src = str(tmp_path / "f.csv")
    pd.DataFrame({"a": [1, 2]}).to_csv(src, index=False)
    eng.variables["work.file.path"] = src
    assert eng.execute("SELECT COUNT(*) AS n FROM '{{ work.file.path }}'").collect()[0]["n"] == 2


# ---------------- parenthesized hints ----------------
def test_parse_hints_parenthesized_json_path():
    assert parse_hints("JSON PATH (a,b)") == {"json_path": "a,b"}
    assert parse_hints("JSON PATH 'a,b'") == {"json_path": "a,b"}


def test_parse_hints_avro_schema():
    assert parse_hints("AVRO 'schema.avsc'") == {"avro_schema": "schema.avsc"}


def test_json_path_parenthesized_end_to_end(eng, tmp_path):
    src = str(tmp_path / "nested.json")
    with open(src, "w") as fh:
        for i in range(3):
            fh.write(json.dumps({"meta": {"v": 1}, "items": [{"k": i, "x": i * 2}]}) + "\n")
    df = eng.execute(f"SELECT k, x FROM '{src}' WITH (JSON PATH (items))")
    rows = sorted((r["k"], r["x"]) for r in df.collect())
    assert rows == [(0, 0), (1, 2), (2, 4)]


def test_avro_hint_routes_to_avro_reader(eng, tmp_path):
    """The jar is absent in this sandbox: assert the hint ROUTES to the
    avro reader (failure mentions the avro data source, not a parse
    error) — the cluster-side path needs only the spark-avro package."""
    schema_file = str(tmp_path / "s.avsc")
    with open(schema_file, "w") as fh:
        fh.write(json.dumps({
            "type": "record", "name": "r",
            "fields": [{"name": "a", "type": "int"}],
        }))
    with pytest.raises(Exception, match="(?i)avro"):
        eng.execute(f"SELECT * FROM '{tmp_path}/x.avro' WITH (AVRO '{schema_file}')")


# ---------------- procedure OUT params ----------------
def test_out_param_survives_into_caller_scope(eng):
    eng.execute("SET @result = 0")
    eng.execute(
        "CREATE PROCEDURE addone(n, OUT @result) AS BEGIN "
        "SET @result = @n + 1; END"
    )
    eng.execute("CALL addone(41, @result)")
    assert eng.variables["result"] == 42


def test_out_param_requires_variable_argument(eng):
    eng.execute("CREATE PROCEDURE q(OUT @r) AS BEGIN SET @r = 1; END")
    with pytest.raises(ValueError, match="OUT param"):
        eng.execute("CALL q(5)")


def test_in_params_still_restored(eng):
    eng.execute("SET @v = 7")
    eng.execute("SET @o = 0")
    eng.execute(
        "CREATE PROCEDURE m(v, OUT @o) AS BEGIN SET @o = @v * 2; END"
    )
    eng.execute("CALL m(50, @o)")
    assert eng.variables["o"] == 100
    assert eng.variables["v"] == 7  # IN param did not leak


def test_show_procedures_marks_out_params(eng):
    eng.execute("CREATE PROCEDURE sp(a, OUT @b) AS BEGIN SET @b = @a; END")
    rows = {r["name"]: r["params"] for r in eng.execute("SHOW PROCEDURES").collect()}
    assert rows["sp"] == "a, OUT b"


# ---------------- write_sink observation count ----------------
def test_rows_inserted_counts_written_rows_once(eng, tmp_path):
    import pandas as pd

    src = str(tmp_path / "s.csv")
    pd.DataFrame({"a": range(10)}).to_csv(src, index=False)
    out = str(tmp_path / "out.json")
    res = eng.execute(f"SELECT a INTO '{out}' FROM '{src}' WHERE CAST(a AS INT) >= 4")
    assert res.collect()[0]["ROWS_INSERTED"] == 6
    written = sum(
        1 for f in os.listdir(out) if f.endswith(".json")
        for _ in open(os.path.join(out, f))
    )
    assert written == 6


def test_rows_inserted_zero_on_empty_write(eng, tmp_path):
    import pandas as pd

    src = str(tmp_path / "s2.csv")
    pd.DataFrame({"a": range(3)}).to_csv(src, index=False)
    out = str(tmp_path / "out_empty.json")
    res = eng.execute(f"SELECT a INTO '{out}' FROM '{src}' WHERE CAST(a AS INT) > 99")
    assert res.collect()[0]["ROWS_INSERTED"] == 0


# ---------------- lake introspection + kafka sink ----------------
def test_show_snapshots_and_describe_lake(eng, spark, tmp_path):
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.datagen import make_events
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA

    path = str(tmp_path / "lake")
    tbl = LakeTable.create(path, TARGET_SCHEMA, n_buckets=4, write_mode="mor")
    ev = make_events(500, seed=3)
    apply_changes(spark, tbl, spark.createDataFrame(ev.to_pandas(), schema=EVENT_SCHEMA),
                  epoch_id=0)
    tbl.add_column("lang", "string")

    snaps = {r["version"]: r for r in eng.execute(f"SHOW SNAPSHOTS '{path}'").collect()}
    assert snaps[0]["operation"] == "create"
    # epoch keys surface as strings (streams write 'run:epoch' keys)
    assert snaps[1]["operation"] == "append-delta" and snaps[1]["epoch_id"] == "0"
    assert snaps[1]["files_added"] > 0
    assert snaps[2]["operation"] == "add_column"

    cols = {r["column"]: r for r in eng.execute(f"DESCRIBE LAKE '{path}'").collect()}
    assert cols["doc_id"]["type"] == "string" and not cols["doc_id"]["engine_col"]
    assert cols["lang"]["type"] == "string"
    assert cols["last_ordinal"]["engine_col"] and cols["_deleted"]["engine_col"]


def test_kafka_sink_shapes_payload_jar_gated(spark):
    """write_events_kafka keys by doc_id and JSON-encodes the event; the
    jar is absent so the failure must come from the kafka data source,
    proving the route."""
    import pytest as _pytest

    from qwery_spark.streaming.stream import write_events_kafka

    df = spark.createDataFrame([("d1", "U", 1)], "doc_id string, op string, ordinal long")
    with _pytest.raises(Exception, match="(?i)kafka"):
        write_events_kafka(df, "localhost:9092", "changes")
    with _pytest.raises(ValueError, match="checkpoint_dir"):
        write_events_kafka(df, "localhost:9092", "changes", streaming=True)


def test_alter_lake_schema_evolution(eng, spark, tmp_path):
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.datagen import make_events
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA

    path = str(tmp_path / "lake")
    tbl = LakeTable.create(path, TARGET_SCHEMA, n_buckets=4)
    apply_changes(
        spark, tbl,
        spark.createDataFrame(make_events(300, seed=41).to_pandas(), schema=EVENT_SCHEMA),
        epoch_id=0,
    )
    eng.execute(f"ALTER LAKE '{path}' ADD COLUMN lang string")
    eng.execute(f"ALTER LAKE '{path}' RENAME COLUMN lang TO language")
    eng.execute(f"ALTER LAKE '{path}' WIDEN COLUMN n_tok TO bigint")
    cols = {r["column"]: r["type"] for r in eng.execute(f"DESCRIBE LAKE '{path}'").collect()}
    assert cols["language"] == "string" and "lang" not in cols
    assert cols["n_tok"] == "bigint"
    # old data reads through the evolved schema (null-fill + widen cast)
    df = tbl.read(spark)
    assert df.schema["n_tok"].dataType.simpleString() == "bigint"
    assert df.filter("language IS NOT NULL").count() == 0 and df.count() > 0
    with pytest.raises(ValueError, match="illegal widen"):
        eng.execute(f"ALTER LAKE '{path}' WIDEN COLUMN source TO int")


def test_double_quoted_literal_protects_at_sign(eng):
    row = eng.execute('SELECT "amy@x.org" AS email').collect()[0]
    assert row["email"] == "amy@x.org"


def test_show_snapshots_survives_expired_log(eng, spark, tmp_path):
    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.datagen import make_events
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA

    path = str(tmp_path / "lake")
    tbl = LakeTable.create(path, TARGET_SCHEMA, n_buckets=2, write_mode="mor")
    pdf = make_events(600, seed=5).to_pandas()
    for e in range(3):
        apply_changes(spark, tbl,
                      spark.createDataFrame(pdf.iloc[e*200:(e+1)*200], schema=EVENT_SCHEMA),
                      epoch_id=e)
    tbl.expire_snapshots(keep_last=2)
    snaps = eng.execute(f"SHOW SNAPSHOTS '{path}'").collect()
    assert [r["version"] for r in snaps] == [2, 3]  # only surviving records


# ---------------- anonymous blocks + typed DECLARE ----------------
def test_anonymous_begin_end_block(eng):
    out = eng.execute("BEGIN SET @x = 2; SET @y = 3; SELECT @x * @y AS p; END")
    assert out.collect()[0]["p"] == 6
    assert eng.variables["x"] == 2  # block shares the session scope


def test_declare_type_enforced_on_set(eng):
    eng.execute("DECLARE @d Double")
    eng.execute("SET @d = 3")
    assert eng.variables["d"] == 3.0 and isinstance(eng.variables["d"], float)
    eng.execute("DECLARE @i Integer")
    eng.execute("SET @i = '42'")
    assert eng.variables["i"] == 42
    # lenient cast: unparseable -> NULL (reference Cast.scala Try->None)
    eng.execute("SET @i = 'nope'")
    assert eng.variables["i"] is None
    with pytest.raises(ValueError, match="unknown DECLARE type"):
        eng.execute("DECLARE @z Decimal")


def test_undeclared_set_keeps_native_type(eng):
    eng.execute("SET @free = 7")
    assert eng.variables["free"] == 7 and isinstance(eng.variables["free"], int)


# ---------------- second review-pass regressions ----------------
def test_comment_with_lone_quote_does_not_merge_statements():
    from qwery_spark.compiler.engine import split_statements

    stmts = split_statements('SELECT 1 AS a -- inches: 6"\n; SELECT 2 AS b')
    assert len(stmts) == 2


def test_at_sign_in_comment_does_not_expand(eng):
    row = eng.execute("SELECT 1 AS v -- ping @nobody\n").collect()[0]
    assert row["v"] == 1


def test_begin_block_missing_end_raises(eng):
    with pytest.raises(ValueError, match="missing END"):
        eng.execute("BEGIN SET @x = 1; SELECT weekend")
    # and BEGINNER is not a block statement
    with pytest.raises(Exception):
        eng.execute("BEGINNER")  # falls through to spark.sql -> parse error


def test_declare_inside_procedure_does_not_leak_type(eng):
    eng.execute(
        "CREATE PROCEDURE dp() AS BEGIN DECLARE @tmp Integer; SET @tmp = 1; END"
    )
    eng.execute("CALL dp()")
    eng.execute("SET @tmp = 'hello'")  # no lingering int cast
    assert eng.variables["tmp"] == "hello"


def test_typed_set_preserves_backslashes(eng):
    """The declared-type cast must not round-trip the value through a
    second SQL literal (which would re-interpret backslash escapes)."""
    eng.execute("DECLARE @s String")
    # Spark SQL escape: '\\n' in the literal yields a real backslash-n
    eng.execute("SET @s = (SELECT 'C:\\\\new' AS p)")
    assert eng.variables["s"] == "C:\\new"


def test_alter_lake_widens_array_types(eng, spark, tmp_path):
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import TARGET_SCHEMA

    path = str(tmp_path / "lake_arr")
    LakeTable.create(path, TARGET_SCHEMA, n_buckets=2)
    eng.execute(f"ALTER LAKE '{path}' WIDEN COLUMN tokens TO array<bigint>")
    cols = {r["column"]: r["type"] for r in eng.execute(f"DESCRIBE LAKE '{path}'").collect()}
    assert cols["tokens"] == "array<bigint>"
