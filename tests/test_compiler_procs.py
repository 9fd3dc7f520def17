"""Procedures, CALL, UPDATE LAKE (matched-only), and block splitting."""

import pandas as pd
import pytest

from qwery_spark.compiler import ScriptEngine
from qwery_spark.compiler.engine import split_statements


def test_split_respects_begin_end():
    script = (
        "SET @x = 1; CREATE PROCEDURE p() AS BEGIN SELECT 1; SELECT 2; END; SELECT 3"
    )
    stmts = split_statements(script)
    assert len(stmts) == 3
    assert stmts[1].upper().startswith("CREATE PROCEDURE")
    assert "SELECT 2" in stmts[1]


@pytest.fixture()
def eng(spark):
    return ScriptEngine(spark)


def test_procedure_call_binds_args(eng, tmp_path):
    src = str(tmp_path / "nums.csv")
    pd.DataFrame({"n": range(20), "grp": ["a", "b"] * 10}).to_csv(src, index=False)
    results = eng.run_script(f"""
      CREATE PROCEDURE top_group(minval) AS BEGIN
        SELECT grp, COUNT(*) AS cnt FROM '{src}'
          WHERE CAST(n AS INT) >= @minval GROUP BY grp;
      END;
      CALL top_group(10)
    """)
    rows = {r["grp"]: r["cnt"] for r in results[-1].collect()}
    assert rows == {"a": 5, "b": 5}
    shows = eng.execute("SHOW PROCEDURES").collect()
    assert shows[0]["name"] == "top_group"


def test_call_restores_scope(eng):
    eng.execute("SET @v = 7")
    eng.execute("CREATE PROCEDURE setv(v) AS BEGIN SELECT @v AS x; END")
    out = eng.execute("CALL setv(99)")
    assert out.collect()[0]["x"] == 99
    assert eng.variables["v"] == 7  # restored


def test_update_lake_matched_only(eng, tmp_path):
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import TARGET_SCHEMA

    path = str(tmp_path / "lake")
    LakeTable.create(path, TARGET_SCHEMA, n_buckets=4)
    eng.execute(
        f"UPSERT INTO LAKE '{path}' KEYED ON doc_id ORDINAL ord "
        "SELECT * FROM VALUES (1, 'a', array(1), 1, 'web') AS t(ord, doc_id, tokens, n_tok, source)"
    )
    res = eng.execute(
        f"UPDATE LAKE '{path}' KEYED ON doc_id ORDINAL ord "
        "SELECT * FROM VALUES "
        "(5, 'a', array(2, 2), 2, 'web'), "     # matched -> update
        "(6, 'zzz', array(9), 1, 'web') "       # unmatched -> no-op
        "AS t(ord, doc_id, tokens, n_tok, source)"
    ).collect()[0]
    tbl = LakeTable(path)
    state = tbl.read(eng.spark).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in state] == ["a"]
    assert list(state[0]["tokens"]) == [2, 2]


def test_show_files_and_explain(eng, tmp_path):
    pd.DataFrame({"a": [1]}).to_csv(tmp_path / "x.csv", index=False)
    files = eng.execute(f"SHOW FILES '{tmp_path}'").collect()
    assert any(r["name"] == "x.csv" for r in files)
    # EXPLAIN passes through with source rewriting intact
    plan = eng.execute(f"EXPLAIN SELECT a FROM '{tmp_path}/x.csv'").collect()
    assert "Relation" in plan[0][0] or "Scan" in plan[0][0]


def test_partitioned_by_sink(eng, tmp_path):
    import os

    out = str(tmp_path / "part.parquet")
    eng.execute(
        f"INSERT OVERWRITE '{out}' WITH (PARTITIONED BY 'grp') (n, grp) "
        "SELECT * FROM VALUES (1, 'a'), (2, 'b'), (3, 'a') AS t(n, grp)"
    )
    dirs = {d for d in os.listdir(out) if d.startswith("grp=")}
    assert dirs == {"grp=a", "grp=b"}
    assert eng.spark.read.parquet(out).count() == 3


def test_quarantine_reprocess_workflow(eng, tmp_path):
    """The reject queue round-trip: quarantined events, fixed upstream,
    re-applied in a later epoch."""
    from pyspark.sql import functions as F

    from qwery_spark.cdc.apply import apply_changes, read_quarantine
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA

    spark = eng.spark
    tbl = LakeTable.create(str(tmp_path / "lake"), TARGET_SCHEMA, n_buckets=4)
    qdir = str(tmp_path / "quarantine")
    bad = pd.DataFrame(
        [(1, "I", "a", [1, 2], 3, "web", None)],  # n_tok mismatch -> quarantined
        columns=["ordinal", "op", "doc_id", "tokens", "n_tok", "source", "ddl"],
    )
    r = apply_changes(spark, tbl, spark.createDataFrame(bad, schema=EVENT_SCHEMA),
                      epoch_id=0, quarantine_dir=qdir)
    assert r.rows_rejected == 1 and tbl.read(spark).count() == 0

    q = read_quarantine(spark, qdir)
    assert q.count() == 1 and q.collect()[0]["reject_reason"] == "n_tok_mismatch"
    # fix: recompute n_tok, bump ordinal (the corrected event is a NEW
    # WAL entry), strip bookkeeping columns, re-apply
    fixed = (
        q.withColumn("n_tok", F.size("tokens"))
        .withColumn("ordinal", F.col("ordinal") + 100)
        .drop("reject_reason", "epoch_id")
    )
    r2 = apply_changes(spark, tbl, fixed, epoch_id=1)
    assert r2.rows_rejected == 0
    state = tbl.read(spark).collect()
    assert len(state) == 1 and state[0]["n_tok"] == 2


def test_delete_from_lake(eng, tmp_path):
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import TARGET_SCHEMA

    path = str(tmp_path / "lake")
    LakeTable.create(path, TARGET_SCHEMA, n_buckets=4, write_mode="mor")
    eng.execute(
        f"UPSERT INTO LAKE '{path}' KEYED ON doc_id ORDINAL ord "
        "SELECT * FROM VALUES "
        "(1, 'a', array(1), 1, 'web'), (2, 'b', array(2), 1, 'code'), "
        "(3, 'c', array(3), 1, 'web') AS t(ord, doc_id, tokens, n_tok, source)"
    )
    res = eng.execute(
        f"DELETE FROM LAKE '{path}' KEYED ON doc_id ORDINAL 10 WHERE source = 'web'"
    ).collect()[0]
    assert res["ROWS_DELETED"] == 2
    tbl = LakeTable(path)
    state = tbl.read(eng.spark).collect()
    assert [r["doc_id"] for r in state] == ["b"]
    # straggler below the delete ordinal cannot resurrect
    eng.execute(
        f"UPSERT INTO LAKE '{path}' KEYED ON doc_id ORDINAL ord "
        "SELECT * FROM VALUES (5, 'a', array(9), 1, 'web') AS t(ord, doc_id, tokens, n_tok, source)"
    )
    assert sorted(r["doc_id"] for r in tbl.read(eng.spark).collect()) == ["b"]
