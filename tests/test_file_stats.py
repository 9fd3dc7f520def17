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
    from qwery_spark.lake.table import Snapshot

    snap = sorted_tbl.snapshot()
    all_files = snap.files()
    probe = "doc-000777"
    pruned = snap.files(key_range=(probe, probe))
    assert 0 < len(pruned) < len(all_files) / 4
    # unbounded sides and entries without stats are kept
    assert len(snap.files(key_range=(None, None))) == len(all_files)
    # a stats-less entry must never be pruned — check on a deep-copied
    # Snapshot (snap.m aliases the shared folded-state cache)
    iso_m = dict(snap.m)
    iso_m["files"] = [dict(f) for f in all_files]
    del iso_m["files"][0]["key_min"], iso_m["files"][0]["key_max"]
    iso = Snapshot(iso_m, snap.table_path)
    assert iso_m["files"][0] in iso.files(key_range=("zzz", "zzz"))


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
    """The lookup DataFrame must actually be BACKED by only the
    stats-surviving files (inputFiles reflects the scan's file list),
    not just report a pruned manifest count."""
    n_all = len(sorted_tbl.snapshot().files())
    probe = "doc-000050"
    n_pruned = len(sorted_tbl.snapshot().files(key_range=(probe, probe)))
    scanned = sorted_tbl.lookup(spark, probe).inputFiles()
    assert len(scanned) <= n_pruned < n_all / 4
    full_scan = sorted_tbl.read(spark).inputFiles()
    assert len(scanned) < len(full_scan) / 4
