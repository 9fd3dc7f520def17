"""Incrementally maintained materialized JOIN view
(operators/joinview.py): the delta-join decomposition over two lake
tables' change feeds, checked against a full recompute of the join
after every window."""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwery_spark.lake.merge import append_changes
from qwery_spark.lake.table import LakeTable
from qwery_spark.operators.joinview import build_join, update_join

_FACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)
_FACT_DDL = "doc_id long, source string, n_chars long, op string, ordinal long"
_DIM_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("weight", T.LongType()),
    ]
)
_DIM_DDL = "source string, weight long, op string, ordinal long"


def _mk_tables(spark, d, n=40, n_dims=6):
    left = LakeTable.create(d + "/fact", _FACT_SCHEMA, n_buckets=4,
                            key_col="doc_id", write_mode="mor")
    right = LakeTable.create(d + "/dim", _DIM_SCHEMA, n_buckets=2,
                             key_col="source", write_mode="cow")
    facts = [(i, f"s{i % n_dims}", 100 + i, "U", i) for i in range(n)]
    append_changes(spark, left, spark.createDataFrame(facts, _FACT_DDL))
    dims = [(f"s{j}", 10 * j, "U", j) for j in range(n_dims - 1)]  # s<n_dims-1> missing
    append_changes(spark, right, spark.createDataFrame(dims, _DIM_DDL))
    return left, right


def _recompute(spark, left, right, how):
    lf = left.read(spark).select("doc_id", "source", "n_chars")
    rt = right.read(spark).select("source", "weight")
    return sorted(
        tuple(r)
        for r in lf.join(rt, "source", how)
        .select("doc_id", "source", "n_chars", "weight")
        .collect()
    )


def _view_rows(spark, view):
    return sorted(
        tuple(r)
        for r in view.read(spark)
        .select("doc_id", "source", "n_chars", "weight")
        .collect()
    )


@pytest.mark.parametrize("how", ["inner", "left"])
def test_build_matches_recompute(spark, tmp_table_dir, how):
    left, right = _mk_tables(spark, tmp_table_dir)
    view = build_join(spark, left, right, tmp_table_dir + "/v",
                      "source", ["n_chars"], ["weight"], how=how)
    assert _view_rows(spark, view) == _recompute(spark, left, right, how)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_combined_window_matches_recompute(spark, tmp_table_dir, how):
    left, right = _mk_tables(spark, tmp_table_dir)
    vl, vr = left.current_version(), right.current_version()
    view = build_join(spark, left, right, tmp_table_dir + "/v",
                      "source", ["n_chars"], ["weight"], how=how)
    # left window: new docs, fk moves (0->s0 stays, 1 moves to the
    # previously-missing dim s5), payload update, deletes
    append_changes(spark, left, spark.createDataFrame(
        [
            (100, "s1", 900, "U", 1000),      # insert
            (1, "s5", 901, "U", 1001),        # fk move to missing dim
            (2, "s2", 902, "U", 1002),        # payload update, same fk
            (3, None, 903, "D", 1003),        # delete
        ],
        _FACT_DDL,
    ))
    # right window: weight update (fans out to every s0 doc), dim
    # delete (drops every s4 doc from the inner view), dim insert
    # (REVIVES the pre-existing s5-pointing rows under inner join)
    append_changes(spark, right, spark.createDataFrame(
        [
            ("s0", 777, "U", 100),
            ("s4", None, "D", 101),
            ("s5", 555, "U", 102),
        ],
        _DIM_DDL,
    ))
    st = update_join(spark, left, right, view, "source",
                     ["n_chars"], ["weight"], vl, vr, how=how)
    assert st.affected_keys > 0
    assert _view_rows(spark, view) == _recompute(spark, left, right, how)


def test_dim_insert_revives_unmatched_fact_rows(spark, tmp_table_dir):
    left, right = _mk_tables(spark, tmp_table_dir, n=12, n_dims=3)
    # s2 docs exist in the fact table but s2 is NOT in the dim (only
    # s0, s1 were inserted): absent from the inner view
    vl, vr = left.current_version(), right.current_version()
    view = build_join(spark, left, right, tmp_table_dir + "/v",
                      "source", ["n_chars"], ["weight"])
    assert all(r[1] != "s2" for r in _view_rows(spark, view))
    append_changes(spark, right, spark.createDataFrame(
        [("s2", 22, "U", 50)], _DIM_DDL))
    update_join(spark, left, right, view, "source",
                ["n_chars"], ["weight"], vl, vr)
    rows = _view_rows(spark, view)
    assert any(r[1] == "s2" and r[3] == 22 for r in rows)
    assert rows == _recompute(spark, left, right, "inner")


def test_window_replay_is_noop(spark, tmp_table_dir):
    left, right = _mk_tables(spark, tmp_table_dir)
    vl, vr = left.current_version(), right.current_version()
    view = build_join(spark, left, right, tmp_table_dir + "/v",
                      "source", ["n_chars"], ["weight"])
    append_changes(spark, left, spark.createDataFrame(
        [(0, "s1", 555, "U", 999)], _FACT_DDL))
    update_join(spark, left, right, view, "source",
                ["n_chars"], ["weight"], vl, vr)
    v_after = view.current_version()
    before = _view_rows(spark, view)
    # same window again: epoch key makes the merge a no-op commit-wise
    update_join(spark, left, right, view, "source",
                ["n_chars"], ["weight"], vl, vr)
    assert view.current_version() == v_after
    assert _view_rows(spark, view) == before


def test_empty_window_is_noop(spark, tmp_table_dir):
    left, right = _mk_tables(spark, tmp_table_dir)
    vl, vr = left.current_version(), right.current_version()
    view = build_join(spark, left, right, tmp_table_dir + "/v",
                      "source", ["n_chars"], ["weight"])
    st = update_join(spark, left, right, view, "source",
                     ["n_chars"], ["weight"], vl, vr)
    assert st.affected_keys == 0
    assert st.snapshot_version is None


def test_right_cols_collision_rejected(spark, tmp_table_dir):
    left, right = _mk_tables(spark, tmp_table_dir)
    right2 = LakeTable.create(
        tmp_table_dir + "/dim2",
        T.StructType([T.StructField("source", T.StringType()),
                      T.StructField("n_chars", T.LongType())]),
        n_buckets=2, key_col="source",
    )
    with pytest.raises(ValueError, match="collide"):
        build_join(spark, left, right2, tmp_table_dir + "/v2",
                   "source", ["n_chars"], ["n_chars"])


def test_renamed_source_column_fails_actionably(spark, tmp_table_dir):
    left, right = _mk_tables(spark, tmp_table_dir)
    vl, vr = left.current_version(), right.current_version()
    view = build_join(spark, left, right, tmp_table_dir + "/v",
                      "source", ["n_chars"], ["weight"])
    left.rename_column("n_chars", "nc")
    append_changes(spark, left, spark.createDataFrame(
        [(0, "s1", 5, "U", 999)],
        "doc_id long, source string, nc long, op string, ordinal long"))
    with pytest.raises(ValueError, match="rebuild the view"):
        update_join(spark, left, right, view, "source",
                    ["n_chars"], ["weight"], vl, vr)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_random_window_soak_matches_recompute(spark, tmp_table_dir, how):
    """4 in-order windows of seeded-random ops on BOTH tables; after
    each window the incrementally maintained view must equal a full
    recompute of the join at the new heads."""
    rng = random.Random(7)
    left, right = _mk_tables(spark, tmp_table_dir, n=30, n_dims=5)
    vl, vr = left.current_version(), right.current_version()
    view = build_join(spark, left, right, tmp_table_dir + "/v",
                      "source", ["n_chars"], ["weight"], how=how)
    ordinal = 10_000
    for w in range(4):
        facts, dims = [], []
        for _ in range(rng.randint(1, 10)):
            k = rng.randrange(40)
            if rng.random() < 0.25:
                facts.append((k, None, None, "D", ordinal))
            else:
                facts.append((k, f"s{rng.randrange(7)}",
                              rng.randrange(1000), "U", ordinal))
            ordinal += 1
        for _ in range(rng.randint(0, 3)):
            j = rng.randrange(7)
            if rng.random() < 0.3:
                dims.append((f"s{j}", None, "D", ordinal))
            else:
                dims.append((f"s{j}", rng.randrange(100), "U", ordinal))
            ordinal += 1
        if facts:
            append_changes(spark, left,
                           spark.createDataFrame(facts, _FACT_DDL))
        if dims:
            append_changes(spark, right,
                           spark.createDataFrame(dims, _DIM_DDL))
        update_join(spark, left, right, view, "source",
                    ["n_chars"], ["weight"], vl, vr, how=how)
        vl, vr = left.current_version(), right.current_version()
        assert _view_rows(spark, view) == _recompute(spark, left, right, how), \
            f"window {w} diverged"
