"""DDL-driven schema evolution: add / rename / widen, mid-stream, with
pre- and post-evolution rows coexisting (field-id resolution on read)."""

import json

import pandas as pd
import pytest

from qwery_spark.cdc.apply import apply_changes, apply_ddl
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA

COLS = ["ordinal", "op", "doc_id", "tokens", "n_tok", "source", "ddl"]


def _ev(rows):
    return pd.DataFrame(rows, columns=COLS)


@pytest.fixture(params=["cow", "mor"])
def tbl(request, tmp_table_dir):
    return LakeTable.create(
        tmp_table_dir + "/tbl", TARGET_SCHEMA, n_buckets=4, write_mode=request.param
    )


def test_add_column_mid_stream(spark, tbl):
    b1 = _ev([(1, "I", "a", [1], 1, "web", None)])
    apply_changes(spark, tbl, spark.createDataFrame(b1, schema=EVENT_SCHEMA), epoch_id=0)
    b2 = _ev([
        (2, "DDL", None, None, None, None,
         json.dumps({"action": "add_column", "name": "meta", "type": "string"})),
        (3, "I", "b", [2], 1, "code", None),
    ])
    apply_changes(spark, tbl, spark.createDataFrame(b2, schema=EVENT_SCHEMA), epoch_id=1)
    state = tbl.read(spark).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in state] == ["a", "b"]
    # pre-evolution row null-fills the added column on read
    assert state[0]["meta"] is None and state[1]["meta"] is None
    assert "meta" in tbl.read(spark).columns


def test_rename_column(spark, tbl):
    b1 = _ev([(1, "I", "a", [1], 1, "web", None)])
    apply_changes(spark, tbl, spark.createDataFrame(b1, schema=EVENT_SCHEMA), epoch_id=0)
    apply_ddl(tbl, {"action": "rename_column", "from": "source", "to": "origin"})
    state = tbl.read(spark).collect()
    assert "origin" in tbl.read(spark).columns and "source" not in tbl.read(spark).columns
    assert state[0]["origin"] == "web"  # old files resolve by field id
    # further ingest binds by the new name via null-fill of missing cols;
    # events still carry 'source', which no longer maps -> column dropped
    b2 = _ev([(2, "I", "b", [2], 1, "books", None)])
    apply_changes(spark, tbl, spark.createDataFrame(b2, schema=EVENT_SCHEMA), epoch_id=1)
    rows = {r["doc_id"]: r["origin"] for r in tbl.read(spark).collect()}
    assert rows["a"] == "web" and rows["b"] is None


def test_widen_type(spark, tbl):
    b1 = _ev([(1, "I", "a", [1], 1, "web", None)])
    apply_changes(spark, tbl, spark.createDataFrame(b1, schema=EVENT_SCHEMA), epoch_id=0)
    apply_ddl(tbl, {"action": "widen_type", "name": "n_tok", "type": "bigint"})
    schema = dict((f.name, f.dataType.simpleString()) for f in tbl.read(spark).schema.fields)
    assert schema["n_tok"] == "bigint"
    assert tbl.read(spark).collect()[0]["n_tok"] == 1  # cast-on-read of old file


def test_illegal_widen_rejected(spark, tbl):
    with pytest.raises(ValueError):
        tbl.widen_type("n_tok", "string")


def test_ddl_idempotent_on_redelivery(spark, tbl):
    spec = {"action": "add_column", "name": "x1", "type": "string"}
    assert apply_ddl(tbl, spec) is True
    v = tbl.snapshot().version
    assert apply_ddl(tbl, spec) is False  # re-delivery no-op
    assert tbl.snapshot().version == v


def test_drop_column_and_no_id_reuse(spark, tmp_table_dir):
    """drop is metadata-only; time travel still sees the column; a
    re-added same-name column gets a FRESH field id so old bytes never
    resurface under it."""
    import pandas as pd

    from qwery_spark.cdc.apply import apply_changes
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA

    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2)
    ev = pd.DataFrame(
        [(1, "U", "a", [1], 1, "web", None)],
        columns=["ordinal", "op", "doc_id", "tokens", "n_tok", "source", "ddl"],
    )
    apply_changes(spark, tbl, spark.createDataFrame(ev, schema=EVENT_SCHEMA), epoch_id=0)
    pre = tbl.current_version()
    tbl.drop_column("source")
    assert "source" not in [f["name"] for f in tbl.snapshot().fields()]
    assert "source" not in tbl.read(spark).columns
    # time travel: pre-drop read still has the column + its value
    old = tbl.read(spark, snapshot_version=pre).collect()[0]
    assert old["source"] == "web"
    # reincarnation: fresh id, old bytes must NOT leak back
    tbl.add_column("source", "string")
    row = tbl.read(spark).collect()[0]
    assert row["source"] is None
    ids = {}
    for sv, fields in tbl.snapshot().m["schemas"].items():
        for f in fields:
            if f["name"] == "source":
                ids[sv] = f["id"]
    assert len(set(ids.values())) == 2  # old and new 'source' differ

    # guards
    with pytest.raises(ValueError):
        tbl.drop_column("doc_id")
    with pytest.raises(ValueError):
        tbl.drop_column("nope")


def test_drop_column_via_ddl_event_and_alter(spark, tmp_table_dir):
    import json as _json

    import pandas as pd

    from qwery_spark.cdc.apply import apply_changes, apply_ddl
    from qwery_spark.compiler.engine import ScriptEngine
    from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA

    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2)
    spec = {"action": "drop_column", "name": "source"}
    ev = pd.DataFrame(
        [
            (1, "U", "a", [1], 1, "web", None),
            (2, "DDL", None, None, None, None, _json.dumps(spec)),
        ],
        columns=["ordinal", "op", "doc_id", "tokens", "n_tok", "source", "ddl"],
    )
    res = apply_changes(
        spark, tbl, spark.createDataFrame(ev, schema=EVENT_SCHEMA), epoch_id=0
    )
    assert res.ddl_applied == 1
    assert "source" not in tbl.read(spark).columns
    assert apply_ddl(tbl, spec) is False  # re-delivery no-op

    eng = ScriptEngine(spark)
    eng.execute(f"ALTER LAKE '{tbl.path}' ADD COLUMN q double")
    eng.execute(f"ALTER LAKE '{tbl.path}' DROP COLUMN q")
    assert "q" not in tbl.read(spark).columns
