"""Payload-column manifest statistics (stats_cols / col_ranges): file
skipping on non-key predicates, with the MOR soundness rule (unresolved
buckets prune all-or-nothing)."""

from pyspark.sql import types as T

from qwery_spark.lake.merge import append_changes, compact
from qwery_spark.lake.table import LakeTable

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("v", T.LongType()),
    ]
)
_DDL = "doc_id long, v long, op string, ordinal long"


def _mk(spark, path, n=200):
    tbl = LakeTable.create(
        path, _SCHEMA, n_buckets=2, key_col="doc_id", write_mode="mor",
        stats_cols=["v"],
    )
    rows = [(i, i * 10, "U", i) for i in range(n)]
    append_changes(spark, tbl, spark.createDataFrame(rows, _DDL))
    return tbl


def _state(tbl, spark, lo):
    return sorted(
        (r["doc_id"], r["v"])
        for r in tbl.read(spark).filter(f"v >= {lo}").collect()
    )


def test_col_stats_prune_resolved_files(spark, tmp_table_dir):
    tbl = _mk(spark, tmp_table_dir + "/t")
    # sorted compact with tiny files -> tight per-file v ranges
    compact(spark, tbl, sort_cols=["v"], max_records_per_file=25)
    snap = tbl.snapshot()
    all_files = snap.files()
    assert len(all_files) >= 8
    assert all("col_stats" in f and "v" in f["col_stats"] for f in all_files)
    pruned = snap.files(col_ranges={"v": (1500, None)})
    assert 0 < len(pruned) < len(all_files)
    # the pruned read + row filter equals ground truth
    got = sorted(
        (r["doc_id"], r["v"])
        for r in tbl.read(spark, col_ranges={"v": (1500, None)})
        .filter("v >= 1500")
        .collect()
    )
    assert got == _state(tbl, spark, 1500)


def test_col_stats_unresolved_bucket_is_all_or_nothing(spark, tmp_table_dir):
    """A delta moves a key's v ACROSS the range boundary (and another
    key gets a tombstone) — the unresolved bucket must be read whole;
    dropping just the out-of-range delta file would resurrect stale
    versions."""
    tbl = _mk(spark, tmp_table_dir + "/t", n=100)
    compact(spark, tbl, sort_cols=["v"], max_records_per_file=20)
    # deltas: doc 5 (v=50, below range) jumps to 9999 (inside range);
    # doc 90 (v=900 -> would match v>=500) gets DELETED; doc 60 drops
    # below the range (v=600 -> 1)
    append_changes(spark, tbl, spark.createDataFrame(
        [(5, 9999, "U", 1000), (90, None, "D", 1001), (60, 1, "U", 1002)],
        _DDL,
    ))
    assert tbl.snapshot().unresolved_buckets  # deltas present
    lo = 500
    got = sorted(
        (r["doc_id"], r["v"])
        for r in tbl.read(spark, col_ranges={"v": (lo, None)})
        .filter(f"v >= {lo}")
        .collect()
    )
    want = _state(tbl, spark, lo)
    assert got == want
    assert (5, 9999) in got and all(d != 90 for d, _ in got)
    assert all(d != 60 for d, _ in got)


def test_col_stats_absent_means_conservative(spark, tmp_table_dir):
    """A table created WITHOUT stats_cols records no col_stats; a
    col_ranges read must keep every file (no wrong pruning), and the
    manifest entries stay stat-free."""
    tbl = LakeTable.create(
        tmp_table_dir + "/t", _SCHEMA, n_buckets=2, key_col="doc_id",
        write_mode="mor",
    )
    append_changes(spark, tbl, spark.createDataFrame(
        [(i, i * 10, "U", i) for i in range(50)], _DDL))
    snap = tbl.snapshot()
    assert all("col_stats" not in f for f in snap.files())
    assert snap.files(col_ranges={"v": (100, 200)}) == snap.files()


def test_rename_remaps_stats_cols_and_distrusts_stale_stats(spark, tmp_table_dir):
    """Renaming a stats column keeps stats flowing under the new name,
    and a rename chain that REUSES a name cannot let old files' stats
    (describing a different logical column) prune wrongly."""
    from pyspark.sql import types as T

    tbl = LakeTable.create(
        tmp_table_dir + "/t",
        T.StructType([T.StructField("doc_id", T.LongType()),
                      T.StructField("a", T.LongType()),
                      T.StructField("c", T.LongType())]),
        n_buckets=1, key_col="doc_id", write_mode="mor", stats_cols=["a"],
    )
    ddl = "doc_id long, a long, c long, op string, ordinal long"
    append_changes(spark, tbl, spark.createDataFrame(
        [(i, i, 1000 + i, "U", i) for i in range(40)], ddl))
    old_files = tbl.snapshot().files()
    assert all("col_stats" in f and "a" in f["col_stats"] for f in old_files)

    # rename a -> b: stats_cols follows, new writes record under 'b'
    tbl.rename_column("a", "b")
    assert tbl.snapshot().stats_cols == ["b"]
    append_changes(spark, tbl, spark.createDataFrame(
        [(100 + i, 7, 2000, "U", 100 + i) for i in range(5)], ddl.replace(" a ", " b ")))
    newest = tbl.snapshot().files()[-1]
    assert "b" in (newest.get("col_stats") or {})

    # rename chain reusing 'a': c -> a. Old files' col_stats['a'] now
    # describe a DIFFERENT logical column (today's b) — a range read on
    # the reincarnated 'a' must NOT prune them (field-id distrust)
    tbl.rename_column("c", "a")
    snap = tbl.snapshot()
    # old files' stale 'a' stats (0..39) are disjoint from (900, None),
    # but their real a-values (old c: 1000+) DO match — must be kept
    kept = snap.files(col_ranges={"a": (900, None)})
    for f in old_files:
        assert any(k["path"] == f["path"] for k in kept)
    got = sorted(
        r["doc_id"]
        for r in tbl.read(spark, col_ranges={"a": (900, None)})
        .filter("a >= 900").collect()
    )
    want = sorted(
        r["doc_id"] for r in tbl.read(spark).filter("a >= 900").collect()
    )
    assert got == want and len(got) >= 40
