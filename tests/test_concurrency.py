"""Optimistic-concurrency commit protocol: a writer whose base snapshot
went stale must fail loudly (the CAS-retry seam on a real catalog),
never silently clobber."""

import pytest

from qwery_spark.cdc.dedup import lww_dedup
from qwery_spark.cdc.validate import split_valid
from qwery_spark.datagen import make_events
from qwery_spark.lake.merge import merge_changes
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA


def test_stale_base_commit_rejected(spark, tmp_table_dir):
    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=4)
    ev = make_events(500, seed=91)
    df = spark.createDataFrame(ev.to_pandas(), schema=EVENT_SCHEMA)

    base = tbl.snapshot()  # writer A captures the base
    # writer B commits first
    from pyspark.sql import functions as F

    valid, _ = split_valid(df.filter(F.col("op") != "DDL").drop("ddl"))
    merge_changes(spark, tbl, lww_dedup(valid), epoch_id=0)

    # writer A now tries to commit against the stale base
    with pytest.raises(RuntimeError, match="concurrent commit"):
        tbl.commit_rewrite(
            base=base, new_files=[], replaced_buckets=set(), epoch_id=99
        )


def test_manifest_create_exclusive(tmp_table_dir):
    """Two writers racing to the same manifest version: second loses
    (os.link create-exclusive)."""
    tbl = LakeTable.create(tmp_table_dir + "/t", TARGET_SCHEMA, n_buckets=2)
    snap = tbl.snapshot()
    m = dict(snap.m)
    m["version"] = snap.version + 1
    tbl._write_manifest(dict(m))
    with pytest.raises(FileExistsError):
        tbl._write_manifest(dict(m))
