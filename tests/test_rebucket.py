"""Partition-spec evolution: rebucket() must move every row to its new
hash bucket in one commit while preserving live state, tombstone
guards, per-snapshot bucket routing (time travel), and the ability to
keep merging afterwards."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from qwery_spark.cdc.apply import apply_changes
from qwery_spark.lake.merge import rebucket
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA


def _hand_events(rows):
    cols = ["ordinal", "op", "doc_id", "tokens", "n_tok", "source", "ddl"]
    return pd.DataFrame(rows, columns=cols)


def _apply(spark, tbl, rows, epoch):
    df = spark.createDataFrame(_hand_events(rows), schema=EVENT_SCHEMA)
    apply_changes(spark, tbl, df, epoch_id=epoch, collect_stats=False)


def _state(spark, tbl, version=None):
    return {
        (r["doc_id"], tuple(r["tokens"] or []))
        for r in tbl.read(spark, snapshot_version=version).collect()
    }


@pytest.mark.parametrize("mode,new_n", [("cow", 16), ("mor", 2)])
def test_rebucket_preserves_state_and_guards(spark, tmp_table_dir, mode, new_n):
    tbl = LakeTable.create(
        tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=4, write_mode=mode
    )
    _apply(spark, tbl, [
        (i, "I", f"doc-{i}", [i], 1, "web", None) for i in range(40)
    ], 0)
    _apply(spark, tbl, [(100, "D", "doc-7", None, None, "web", None)], 1)
    before = _state(spark, tbl)
    pre_version = tbl.current_version()

    res = rebucket(spark, tbl, new_n)
    assert res["to_buckets"] == new_n
    snap = tbl.snapshot()
    assert snap.n_buckets == new_n
    assert {f["bucket"] for f in snap.files()} <= set(range(new_n))
    assert _state(spark, tbl) == before
    # time travel still routes by the OLD bucket count
    assert tbl.snapshot(pre_version).n_buckets == 4
    assert _state(spark, tbl, version=pre_version) == before

    # tombstone guard survived the move: a straggler below the delete
    # ordinal must NOT resurrect doc-7
    _apply(spark, tbl, [(50, "U", "doc-7", [9], 1, "web", None)], 2)
    assert not [r for r in tbl.read(spark).collect() if r["doc_id"] == "doc-7"]

    # fresh merges land in the new layout and lookups still find rows
    _apply(spark, tbl, [(200, "U", "doc-3", [3, 3], 2, "code", None)], 3)
    row = tbl.lookup(spark, "doc-3").collect()
    assert len(row) == 1 and list(row[0]["tokens"]) == [3, 3]


def test_rebucket_script_verb_and_validation(spark, tmp_table_dir):
    from qwery_spark.compiler.engine import ScriptEngine

    eng = ScriptEngine(spark)
    p = tmp_table_dir + "/lk"
    eng.execute(f"CREATE LAKE '{p}' (doc_id string, v int) KEYED ON doc_id BUCKETS 2")
    eng.execute(
        f"UPSERT INTO LAKE '{p}' KEYED ON doc_id "
        "SELECT 'a' AS doc_id, 1 AS v, 'U' AS op, 1 AS ordinal"
    )
    res = eng.execute(f"ALTER LAKE '{p}' REBUCKET 8").collect()[0]
    assert (res["from_buckets"], res["to_buckets"]) == (2, 8)
    assert LakeTable(p).snapshot().n_buckets == 8
    with pytest.raises(ValueError):
        rebucket(spark, LakeTable(p), 0)
