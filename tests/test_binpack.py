"""Binpack partial compaction: merge only a bucket's small files,
leave the large compacted files untouched, state bit-identical."""

import os

import pytest
from pyspark.sql import types as T

from qwery_spark.lake.merge import append_changes, binpack, compact, merge_changes
from qwery_spark.lake.table import CommitConflict, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("v", T.IntegerType()),
    ]
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, op string, ordinal long, v int")


def _mk(tmp_table_dir, mode="mor", n_buckets=2):
    return LakeTable.create(
        tmp_table_dir + "/t", SCHEMA, n_buckets=n_buckets, write_mode=mode
    )


def _state(spark, t):
    return sorted(tuple(r) for r in t.read(spark).collect())


def _sizes(t):
    return {
        f["path"]: os.path.getsize(os.path.join(t.path, f["path"]))
        for f in t.snapshot().m["files"]
    }


def test_binpack_merges_small_leaves_large(spark, tmp_table_dir):
    t = _mk(tmp_table_dir, n_buckets=1)
    # big base file: one compacted write of 20k rows
    merge_changes(
        spark, t,
        _batch(spark, [(f"k{i}", "U", i, i) for i in range(20000)]),
        epoch_id=0,
    )
    compact(spark, t)
    big = {f["path"] for f in t.snapshot().m["files"]}
    assert len(big) == 1
    # a tail of small delta appends, incl. updates and a delete
    for e in range(1, 7):
        append_changes(
            spark, t,
            _batch(spark, [
                (f"k{e}", "U", 100000 + e, -e),
                (f"k{20000 + e}", "U", 200000 + e, e),
                (f"k{e + 10}", "D", 300000 + e, None),
            ]),
            epoch_id=e,
        )
    before = _state(spark, t)
    n_files_before = len(t.snapshot().m["files"])
    big_size = max(_sizes(t).values())

    res = binpack(spark, t, small_bytes=big_size, min_files=2)
    assert res["binpacked_buckets"] == 1
    assert res["files_merged"] == n_files_before - 1  # all but the big file
    after_files = {f["path"] for f in t.snapshot().m["files"]}
    assert big <= after_files  # the large file was NOT rewritten
    assert len(after_files) == 1 + res["files_written"]
    # state identical, tombstones still suppressing
    assert _state(spark, t) == before
    # the bucket is still unresolved (subset merge resolves nothing
    # about the untouched big file)
    assert t.snapshot().unresolved_buckets == {0}
    # a later FULL compact folds everything and resolves
    compact(spark, t)
    assert _state(spark, t) == before
    assert not t.snapshot().unresolved_buckets


def test_binpack_noop_below_min_files(spark, tmp_table_dir):
    t = _mk(tmp_table_dir, n_buckets=1)
    merge_changes(spark, t, _batch(spark, [("a", "U", 1, 1)]), epoch_id=0)
    res = binpack(spark, t, min_files=4)
    assert res == {"binpacked_buckets": 0, "files_merged": 0, "files_written": 0}
    assert t.snapshot().version == 1  # no empty commit


def test_binpack_strict_cas_conflict(spark, tmp_table_dir):
    t = _mk(tmp_table_dir, n_buckets=1)
    for e in range(4):
        append_changes(spark, t, _batch(spark, [(f"k{e}", "U", e + 1, e)]), epoch_id=e)
    base = t.snapshot()
    # head moves between plan and commit
    merge_changes(spark, t, _batch(spark, [("z", "U", 99, 9)]), epoch_id=9)
    with pytest.raises(CommitConflict):
        t.commit_remove_add(base, ["data/nope.parquet"], [], {"operation": "binpack"})


def test_binpack_resolved_bucket_stays_resolved(spark, tmp_table_dir):
    t = _mk(tmp_table_dir, mode="cow", n_buckets=1)
    # COW with tiny max_records_per_file -> many small files, resolved
    for e in range(3):
        merge_changes(
            spark, t,
            _batch(spark, [(f"k{i}", "U", e * 100 + i, i) for i in range(40)]),
            epoch_id=e, max_records_per_file=10,
        )
    assert not t.snapshot().unresolved_buckets
    before = _state(spark, t)
    n_before = len(t.snapshot().m["files"])
    res = binpack(spark, t, min_files=2)
    assert res["files_merged"] == n_before
    assert len(t.snapshot().m["files"]) < n_before
    assert not t.snapshot().unresolved_buckets  # concatenation, not a delta
    assert _state(spark, t) == before


def test_binpack_changelog_and_vacuum(spark, tmp_table_dir):
    """A binpack commit is logically empty: the changelog emits nothing
    for it, and the removed files become vacuumable only after the
    pre-binpack snapshots expire."""
    from qwery_spark.lake.changes import read_changes

    t = _mk(tmp_table_dir, n_buckets=1)
    for e in range(5):
        append_changes(spark, t, _batch(spark, [(f"k{e}", "U", e + 1, e)]), epoch_id=e)
    v_before = t.current_version()
    res = binpack(spark, t, min_files=2)
    assert res["files_merged"] == 5
    assert read_changes(spark, t, v_before).count() == 0  # no logical change
    # removed files still referenced by pre-binpack manifests
    assert t.vacuum(grace_sec=0) == 0
    t.expire_snapshots(keep_last=1)
    assert t.vacuum(grace_sec=0) == res["files_merged"]
    assert t.read(spark).count() == 5


def test_binpack_statement_verb(spark, tmp_table_dir):
    from qwery_spark.compiler.engine import ScriptEngine

    eng = ScriptEngine(spark)
    p = tmp_table_dir + "/t"
    eng.execute(
        f"CREATE LAKE '{p}' (doc_id string, v int) KEYED ON doc_id "
        "BUCKETS 1 MODE mor"
    )
    for e in range(4):
        eng.execute(
            f"UPSERT INTO LAKE '{p}' KEYED ON doc_id "
            f"SELECT 'k{e}' AS doc_id, {e} AS v, {e + 1} AS ordinal"
        )
    r = eng.execute(f"BINPACK LAKE '{p}' SMALL 1048576 MIN FILES 2").collect()[0]
    assert r["files_merged"] == 4 and r["files_written"] >= 1
    assert eng.execute(f"SELECT count(*) AS n FROM '{p}'").collect()[0]["n"] == 4


def test_policy_binpack_cheap_tick(spark, tmp_table_dir):
    """With binpack_small_bytes set, a file-count-triggered tick merges
    only the small delta tail; the big compacted file is never
    rewritten, and the bound still holds."""
    from qwery_spark.lake.maintenance import CompactionPolicy, maybe_compact

    t = _mk(tmp_table_dir, n_buckets=1)
    merge_changes(
        spark, t,
        _batch(spark, [(f"k{i}", "U", i, i) for i in range(20000)]),
        epoch_id=0,
    )
    compact(spark, t)
    big = {f["path"] for f in t.snapshot().m["files"]}
    for e in range(1, 7):
        append_changes(spark, t, _batch(spark, [(f"k{e}", "U", 1000 + e, -e)]), epoch_id=e)
    before = _state(spark, t)

    pol = CompactionPolicy(
        max_files_per_bucket=4, binpack_small_bytes=max(_sizes(t).values())
    )
    rep = maybe_compact(spark, t, pol)
    assert rep.triggered and rep.binpacked_files == 6
    files = {f["path"] for f in t.snapshot().m["files"]}
    assert big <= files  # the base was not rewritten
    assert len(files) <= 1 + pol.max_files_per_bucket
    assert _state(spark, t) == before
    # bound satisfied -> the next tick is a no-op
    rep2 = maybe_compact(spark, t, pol)
    assert not rep2.triggered and rep2.binpacked_files == 0


def test_policy_binpack_falls_back_when_all_large(spark, tmp_table_dir):
    """Due bucket whose files are all over the binpack threshold: the
    tick must fall through to a full compact — the read-amplification
    bound is a guarantee."""
    from qwery_spark.lake.maintenance import CompactionPolicy, maybe_compact

    t = _mk(tmp_table_dir, n_buckets=1)
    for e in range(6):
        append_changes(spark, t, _batch(spark, [(f"k{e}", "U", e + 1, e)]), epoch_id=e)
    before = _state(spark, t)
    pol = CompactionPolicy(max_files_per_bucket=4, binpack_small_bytes=1)
    rep = maybe_compact(spark, t, pol)
    assert rep.triggered and rep.binpacked_files == 0  # nothing under 1 byte
    assert len(t.snapshot().m["files"]) <= pol.max_files_per_bucket
    assert _state(spark, t) == before
