"""Manifest-level file statistics (key_min/key_max per data file) and
the point-lookup pruning stack built on them."""

import pandas as pd
import pytest

from qwery_spark.cdc.apply import apply_changes
from qwery_spark.lake.merge import compact
from qwery_spark.lake.table import LakeTable
from qwery_spark.schema import EVENT_SCHEMA, TARGET_SCHEMA


def _events(n):
    return pd.DataFrame(
        {
            "ordinal": range(n),
            "op": ["U"] * n,
            "doc_id": [f"doc-{i:06d}" for i in range(n)],
            "tokens": [[i % 50257] for i in range(n)],
            "n_tok": [1] * n,
            "source": ["web"] * n,
            "ddl": [None] * n,
        }
    )


@pytest.fixture(scope="module")
def sorted_tbl(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stats"))
    tbl = LakeTable.create(d + "/t", TARGET_SCHEMA, n_buckets=2, write_mode="mor")
    df = spark.createDataFrame(_events(2000), schema=EVENT_SCHEMA)
    apply_changes(spark, tbl, df, epoch_id=0, collect_stats=False)
    # tiny files => many files per bucket => file skipping has teeth
    compact(spark, tbl, sort_cols=["doc_id"], max_records_per_file=100)
    return tbl


def test_merge_writes_key_stats(sorted_tbl):
    files = sorted_tbl.snapshot().files()
    assert len(files) > 10
    assert all("key_min" in f and f["key_min"] <= f["key_max"] for f in files)


def test_key_range_prunes_files_conservatively(sorted_tbl):
    snap = sorted_tbl.snapshot()
    all_files = snap.files()
    probe = "doc-000777"
    pruned = snap.files(key_range=(probe, probe))
    assert 0 < len(pruned) < len(all_files) / 4
    # unbounded sides and entries without stats are kept
    assert len(snap.files(key_range=(None, None))) == len(all_files)
    snap.m["files"] = [dict(f) for f in all_files]
    del snap.m["files"][0]["key_min"], snap.m["files"][0]["key_max"]
    assert snap.m["files"][0] in snap.files(key_range=("zzz", "zzz"))


def test_lookup_matches_full_scan(spark, sorted_tbl):
    for probe in ("doc-000000", "doc-001234", "doc-001999", "doc-nosuch"):
        fast = sorted_tbl.lookup(spark, probe).collect()
        slow = sorted_tbl.read(spark).filter(f"doc_id = '{probe}'").collect()
        assert sorted(map(str, fast)) == sorted(map(str, slow)), probe


def test_lookup_sees_uncompacted_mor_deltas(spark, sorted_tbl):
    """A fresh delta (unsorted, post-compaction) must still be found and
    must win LWW over the compacted row."""
    upd = pd.DataFrame(
        {
            "ordinal": [100000],
            "op": ["U"],
            "doc_id": ["doc-000777"],
            "tokens": [[42]],
            "n_tok": [1],
            "source": ["code"],
            "ddl": [None],
        }
    )
    apply_changes(
        spark,
        sorted_tbl,
        spark.createDataFrame(upd, schema=EVENT_SCHEMA),
        epoch_id=1,
        collect_stats=False,
    )
    row = sorted_tbl.lookup(spark, "doc-000777").collect()
    assert len(row) == 1 and list(row[0]["tokens"]) == [42]


def test_lookup_plan_scans_few_files(spark, sorted_tbl):
    """The executed plan's scan should list only the stats-surviving
    files, not the whole bucket."""
    n_all = len(sorted_tbl.snapshot().files())
    n_pruned = len(sorted_tbl.snapshot().files(key_range=("doc-000050", "doc-000050")))
    assert n_pruned <= max(3, n_all // 10)
