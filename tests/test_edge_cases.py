"""Lake edge cases: empty table reads, tombstone-only state, unknown-key
delete, schema of empty reads."""

import pandas as pd

from qwery_spark.cdc.apply import apply_changes
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA

COLS = ["ordinal", "op", "doc_id", "tokens", "n_tok", "source", "ddl"]


def test_empty_table_read(spark, tmp_table_dir):
    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=4)
    df = tbl.read(spark)
    assert df.count() == 0
    assert df.columns == ["doc_id", "tokens", "n_tok", "source"]


def test_tombstone_only_table(spark, tmp_table_dir):
    """Deleting every row leaves only tombstones: public read is empty,
    physical read retains the guards."""
    for mode in ("cow", "mor"):
        tbl = LakeTable.create(f"{tmp_table_dir}/{mode}", TARGET_SCHEMA, n_buckets=4,
                               write_mode=mode)
        b = pd.DataFrame(
            [(1, "I", "a", [1], 1, "web", None),
             (2, "I", "b", [2], 1, "web", None),
             (3, "D", "a", None, None, None, None),
             (4, "D", "b", None, None, None, None)], columns=COLS)
        apply_changes(spark, tbl, spark.createDataFrame(b, schema=EVENT_SCHEMA), epoch_id=0)
        assert tbl.read(spark).count() == 0, mode
        phys = tbl.read_physical(spark).collect()
        assert all(r["_deleted"] for r in phys), mode
        assert {r["last_ordinal"] for r in phys} == {3, 4}, mode


def test_delete_unknown_key_then_low_insert(spark, tmp_table_dir):
    """D for a never-seen key creates a guard tombstone; a later batch's
    LOWER-ordinal insert must not resurrect it."""
    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=4)
    b1 = pd.DataFrame([(10, "D", "ghost", None, None, None, None)], columns=COLS)
    b2 = pd.DataFrame([(5, "I", "ghost", [5], 1, "web", None)], columns=COLS)
    apply_changes(spark, tbl, spark.createDataFrame(b1, schema=EVENT_SCHEMA), epoch_id=0)
    apply_changes(spark, tbl, spark.createDataFrame(b2, schema=EVENT_SCHEMA), epoch_id=1)
    assert tbl.read(spark).count() == 0
