"""Z-order compaction (compact(zorder_cols=...)): both clustered
columns' per-file manifest bounds stay tight simultaneously, so
col_ranges pruning works on EITHER column — a 1D sort only serves its
leading column."""

from pyspark.sql import types as T

from qwery_spark.lake.merge import append_changes, compact
from qwery_spark.lake.table import LakeTable

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
    ]
)
_DDL = "doc_id long, x long, y long, op string, ordinal long"


def _mk(spark, path, n=1024):
    tbl = LakeTable.create(
        path, _SCHEMA, n_buckets=1, key_col="doc_id", write_mode="mor",
        stats_cols=["x", "y"],
    )
    # a 32x32 grid (x = column, y = row): genuinely independent axes —
    # a 1D x-sort leaves every y value in every file
    rows = [(i, i % 32, (i // 32) % 32, "U", i) for i in range(n)]
    append_changes(spark, tbl, spark.createDataFrame(rows, _DDL))
    return tbl


def _pruned(tbl, col, lo, hi):
    snap = tbl.snapshot()
    return len(snap.files(col_ranges={col: (lo, hi)})), len(snap.files())


def test_zorder_prunes_on_both_columns(spark, tmp_table_dir):
    zt = _mk(spark, tmp_table_dir + "/z")
    compact(spark, zt, zorder_cols=["x", "y"], max_records_per_file=64)
    xt = _mk(spark, tmp_table_dir + "/x")
    compact(spark, xt, sort_cols=["x"], max_records_per_file=64)

    n_files = len(zt.snapshot().files())
    assert n_files >= 8

    # x-range: both layouts prune
    zx, _ = _pruned(zt, "x", 0, 3)
    sx, _ = _pruned(xt, "x", 0, 3)
    assert zx < n_files and sx < n_files
    # y-range: ONLY the z-ordered layout prunes; the x-sort reads all
    zy, _ = _pruned(zt, "y", 0, 3)
    sy, s_total = _pruned(xt, "y", 0, 3)
    assert zy < n_files
    assert sy == s_total

    # correctness: pruned reads + filter equal ground truth on both axes
    for col, lo, hi in (("x", 0, 3), ("y", 0, 3)):
        got = sorted(
            (r["doc_id"], r["x"], r["y"])
            for r in zt.read(spark, col_ranges={col: (lo, hi)})
            .filter(f"{col} between {lo} and {hi}")
            .collect()
        )
        want = sorted(
            (r["doc_id"], r["x"], r["y"])
            for r in zt.read(spark)
            .filter(f"{col} between {lo} and {hi}")
            .collect()
        )
        assert got == want and len(got) > 0


def test_zorder_state_unchanged_and_guards(spark, tmp_table_dir):
    import pytest

    tbl = _mk(spark, tmp_table_dir + "/t", n=200)
    before = sorted(map(tuple, tbl.read(spark).collect()))
    compact(spark, tbl, zorder_cols=["x", "y"], max_records_per_file=50)
    assert sorted(map(tuple, tbl.read(spark).collect())) == before
    with pytest.raises(ValueError, match="exclusive"):
        compact(spark, tbl, sort_cols=["x"], zorder_cols=["y"])
    from qwery_spark.operators.zorder import zorder_col

    with pytest.raises(ValueError, match="exceeds a long"):
        zorder_col({c: (0, 1) for c in "abcdefgh"}, list("abcdefgh"), 8)


def test_zorder_constant_and_null_columns(spark, tmp_table_dir):
    """Degenerate columns (constant, all-NULL) rank 0 and never break
    the interleave."""
    tbl = LakeTable.create(
        tmp_table_dir + "/t", _SCHEMA, n_buckets=1, key_col="doc_id",
        write_mode="mor", stats_cols=["x"],
    )
    rows = [(i, 7, None, "U", i) for i in range(100)]
    append_changes(spark, tbl, spark.createDataFrame(rows, _DDL))
    compact(spark, tbl, zorder_cols=["x", "y"], max_records_per_file=30)
    assert tbl.read(spark).count() == 100


def test_compact_zorder_statement(spark, tmp_table_dir):
    from qwery_spark.compiler.engine import ScriptEngine

    tbl = _mk(spark, tmp_table_dir + "/t", n=256)
    eng = ScriptEngine(spark)
    res = eng.execute(
        f"COMPACT LAKE '{tbl.path}' ZORDER BY (x, y)"
    ).collect()[0]
    assert res["compacted_buckets"] == 1
    snap = tbl.snapshot()
    assert all("col_stats" in f for f in snap.files())


def test_zorder_rejects_non_numeric_columns(spark, tmp_table_dir):
    from pyspark.sql import types as T
    import pytest

    tbl = LakeTable.create(
        tmp_table_dir + "/t",
        T.StructType([T.StructField("doc_id", T.LongType()),
                      T.StructField("lang", T.StringType())]),
        n_buckets=1, key_col="doc_id", write_mode="mor",
    )
    append_changes(spark, tbl, spark.createDataFrame(
        [(1, "en", "U", 1)], "doc_id long, lang string, op string, ordinal long"))
    with pytest.raises(ValueError, match="numeric"):
        compact(spark, tbl, zorder_cols=["lang"])
