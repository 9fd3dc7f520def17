"""Persisted incremental IVF (ANN) index (operators/annindex.py): built
once from fixed centroids, maintained from the change feed — cell
assignments always equal a full rebuild, drifted vectors migrate cells,
deleted vectors leave the probe set, replays are commit-level no-ops."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwery_spark.lake.merge import append_changes
from qwery_spark.lake.table import LakeTable
from qwery_spark.operators.annindex import (
    build_ann_index,
    index_topk,
    update_ann_index,
)

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ]
)

# 4 well-separated 4-dim centroids
_CENTROIDS = [
    [10.0, 0.0, 0.0, 0.0],
    [0.0, 10.0, 0.0, 0.0],
    [0.0, 0.0, 10.0, 0.0],
    [0.0, 0.0, 0.0, 10.0],
]


def _vec(cell: int, i: int) -> list[float]:
    v = [0.1 * ((i * 7 + d) % 5) for d in range(4)]
    v[cell] += 9.0
    return v


def _mk_src(spark, path, n=40):
    tbl = LakeTable.create(
        path, _SCHEMA, n_buckets=4, key_col="vec_id", write_mode="mor"
    )
    rows = [(i, _vec(i % 4, i), "U", i) for i in range(n)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, op string, ordinal long"
    )
    append_changes(spark, tbl, df)
    return tbl


def _cells(spark, idx):
    return {
        r["vec_id"]: r["cell"]
        for r in idx.read(spark).select("vec_id", "cell").collect()
    }


def test_build_then_update_matches_full_rebuild(spark, tmp_table_dir):
    src = _mk_src(spark, tmp_table_dir + "/src")
    v1 = src.current_version()
    idx = build_ann_index(spark, src, tmp_table_dir + "/idx", _CENTROIDS)
    assert _cells(spark, idx) == {i: i % 4 for i in range(40)}

    # window: drift vector 5 (cell 1) into cell 2, add 100 (cell 3),
    # delete 6
    batch = spark.createDataFrame(
        [
            (5, _vec(2, 5), "U", 900),
            (100, _vec(3, 100), "U", 901),
            (6, None, "D", 902),
        ],
        "vec_id long, embedding array<double>, op string, ordinal long",
    )
    append_changes(spark, src, batch)
    st = update_ann_index(spark, src, idx, _CENTROIDS, from_version=v1)
    assert st.vectors_reassigned == 2 and st.vectors_deleted == 1

    got = _cells(spark, idx)
    rebuilt = build_ann_index(
        spark, src, tmp_table_dir + "/idx2", _CENTROIDS
    )
    assert got == _cells(spark, rebuilt)
    assert got[5] == 2 and got[100] == 3 and 6 not in got


def test_update_window_replay_is_commit_noop(spark, tmp_table_dir):
    src = _mk_src(spark, tmp_table_dir + "/src", n=12)
    v1 = src.current_version()
    idx = build_ann_index(spark, src, tmp_table_dir + "/idx", _CENTROIDS)
    append_changes(spark, src, spark.createDataFrame(
        [(0, _vec(1, 0), "U", 500)],
        "vec_id long, embedding array<double>, op string, ordinal long",
    ))
    update_ann_index(spark, src, idx, _CENTROIDS, from_version=v1)
    files = len(idx.snapshot().files())
    ver = idx.current_version()
    update_ann_index(spark, src, idx, _CENTROIDS, from_version=v1)
    assert len(idx.snapshot().files()) == files
    assert idx.current_version() == ver
    assert _cells(spark, idx)[0] == 1


def test_index_topk_probes_the_right_cell(spark, tmp_table_dir):
    src = _mk_src(spark, tmp_table_dir + "/src")
    idx = build_ann_index(spark, src, tmp_table_dir + "/idx", _CENTROIDS)
    q = _CENTROIDS[2]
    got = index_topk(spark, idx, _CENTROIDS, q, k=5, n_probe=1).collect()
    # every hit lives in cell 2, ranked by true cosine
    cells = _cells(spark, idx)
    assert all(cells[r["vec_id"]] == 2 for r in got)

    def cos(v):
        d = sum(a * b for a, b in zip(v, q))
        return d / (math.sqrt(sum(a * a for a in v)) * math.sqrt(sum(b * b for b in q)))

    brute = sorted(
        ((i, cos(_vec(2, i))) for i in range(2, 40, 4)),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert [r["vec_id"] for r in got] == [i for i, _ in brute]


def test_sorted_compaction_clusters_cells_for_probe_pruning(spark, tmp_table_dir):
    from qwery_spark.lake.merge import compact

    src = _mk_src(spark, tmp_table_dir + "/src")
    idx = build_ann_index(spark, src, tmp_table_dir + "/idx", _CENTROIDS)
    compact(spark, idx, sort_cols=["cell"], max_records_per_file=10)
    snap = idx.snapshot()
    with_stats = [f for f in snap.files() if "col_stats" in f]
    assert with_stats, "index files must carry cell col_stats"
    # a probe of cell 0 skips every file whose cell range excludes it
    kept = snap.files(col_ranges={"cell": (0, 0)})
    assert len(kept) < len(snap.files())


def test_build_replay_is_commit_noop(spark, tmp_table_dir):
    """A crashed-and-replayed build must adopt the existing index and
    no-op via the version-keyed epoch — not crash in create, not append
    a duplicate corpus."""
    src = _mk_src(spark, tmp_table_dir + "/src", n=12)
    idx = build_ann_index(spark, src, tmp_table_dir + "/idx", _CENTROIDS)
    files = len(idx.snapshot().files())
    ver = idx.current_version()
    again = build_ann_index(spark, src, tmp_table_dir + "/idx", _CENTROIDS)
    assert len(again.snapshot().files()) == files
    assert again.current_version() == ver
    assert _cells(spark, again) == {i: i % 4 for i in range(12)}


def test_index_topk_multi_probe_no_duplicates(spark, tmp_table_dir):
    """n_probe=2 with multi-cell files (col_ranges is only a file-level
    hint): each candidate must appear at most once in the top-k."""
    src = _mk_src(spark, tmp_table_dir + "/src")
    idx = build_ann_index(spark, src, tmp_table_dir + "/idx", _CENTROIDS)
    q = [0.0, 7.0, 7.0, 0.0]  # between cells 1 and 2
    got = index_topk(spark, idx, _CENTROIDS, q, k=20, n_probe=2).collect()
    ids = [r["vec_id"] for r in got]
    assert len(ids) == len(set(ids)), ids
    cells = _cells(spark, idx)
    assert {cells[i] for i in ids} <= {1, 2}
