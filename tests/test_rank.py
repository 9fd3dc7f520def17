"""operators.rank: the distributed ranker must match Spark's own
window ntile / row_number EXACTLY on every shape (ties broken by key,
total % n != 0, n > total, empty input)."""

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from qwery_spark.operators.rank import with_global_rank, with_ntile


def _df(spark, n, seed=5):
    return spark.range(n).selectExpr(
        "id", f"cast(pmod(hash(id, {seed}), 97) as int) AS v"
    )


@pytest.mark.parametrize("rows,tiles", [(100, 4), (103, 4), (7, 10), (1, 1), (64, 3)])
def test_ntile_matches_window_ntile(spark, rows, tiles):
    df = _df(spark, rows)
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["t"]
        for r in df.select("id", F.ntile(tiles).over(w).alias("t")).collect()
    }
    got = {
        r["id"]: r["tile"]
        for r in with_ntile(df, tiles, ["v", "id"], num_partitions=8).collect()
    }
    assert got == want


def test_global_rank_matches_row_number(spark):
    df = _df(spark, 500)
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["rn"]
        for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
    }
    ranked, total = with_global_rank(df, ["v", "id"], num_partitions=8)
    assert total == 500
    got = {r["id"]: r["_rank"] for r in ranked.collect()}
    assert got == want


def test_empty_input(spark):
    df = _df(spark, 10).filter("v < -1")
    out = with_ntile(df, 4, ["v", "id"], num_partitions=4)
    assert out.count() == 0


# ---------------- connected components (operators.graph) ----------------
def test_connected_components_chain_and_islands(spark):
    """A 5-node chain (needs >1 propagation round), a triangle, and an
    isolated pair — labels must be the min node id per component."""
    from qwery_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),      # chain 1-5
         (10, 11), (11, 12), (12, 10),        # triangle
         (20, 21)],                           # pair
        "a long, b long",
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_direction_irrelevant(spark):
    from qwery_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(5, 1), (1, 3)], "a long, b long")
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 3: 1, 5: 1}


def test_connected_components_iteration_cap_raises(spark):
    """A chain longer than max_iter can't converge — strict mode must
    raise rather than silently return over-segmented labels."""
    import pytest

    from qwery_spark.operators.graph import connected_components

    chain = [(i, i + 1) for i in range(12)]
    edges = spark.createDataFrame(chain, "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=2).collect()
    # non-strict: warns, returns (possibly split) labels
    with pytest.warns(UserWarning, match="did not converge"):
        out = connected_components(edges, max_iter=2, strict=False).collect()
    assert len(out) == 13


def test_lsh_topk_unknown_query_id_returns_empty(spark):
    from qwery_spark.operators.similarity import lsh_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = lsh_topk(e, query_id=10**9, k=5)
    assert out.count() == 0
    assert out.columns == ["vec_id", "cosine"]


def test_star_cc_matches_label_propagation(spark):
    """large-star/small-star (O(log n) rounds) must produce identical
    components to min-label propagation on random graphs."""
    import random

    from qwery_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(11)
    edges = [(rng.randint(0, 60), rng.randint(0, 60)) for _ in range(80)]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "a long, b long")
    base = {r["node"]: r["component"] for r in connected_components(df).collect()}
    star = {r["node"]: r["component"] for r in connected_components_star(df).collect()}
    assert star == base


def test_star_cc_long_chain_beats_diameter_bound(spark):
    """A 150-node chain: label propagation needs 150 rounds (strict mode
    raises at the default 50-round cap) — the star algorithm converges
    in O(log n) rounds and labels the whole chain with its minimum."""
    from qwery_spark.operators.graph import connected_components_star

    chain = [(i, i + 1) for i in range(150)]
    df = spark.createDataFrame(chain, "a long, b long")
    out = connected_components_star(df, max_iter=12).collect()
    assert len(out) == 151
    assert {r["component"] for r in out} == {0}


def test_star_cc_self_loop_only_node(spark):
    from qwery_spark.operators.graph import connected_components_star

    edges = spark.createDataFrame([(1, 2), (5, 5)], "a long, b long")
    got = {r["node"]: r["component"] for r in connected_components_star(edges).collect()}
    assert got == {1: 1, 2: 1, 5: 5}


def test_lsh_multi_table_dominates_single(spark):
    """Multi-table LSH (round 6): the L=2 candidate set is a superset
    of L=1's (table 0 keeps the original plane derivation), so per-rank
    top-k cosines dominate; unknown-id empty contract holds with
    n_tables>1 too."""
    import hashlib

    from qwery_spark.operators.similarity import (
        lsh_topk,
        plane_weights,
    )

    # table 0 derivation unchanged (oracle-compat pin)
    w0 = plane_weights(2, 4)
    assert w0[0][0] == (
        1.0 if int(hashlib.md5(b"0-0").hexdigest()[0], 16) >= 8 else -1.0
    )
    assert plane_weights(2, 4, table=1) != w0  # independent planes

    rows = [
        (i, [((i * 37 + d * 11) % 17 - 8) / 8.0 for d in range(8)])
        for i in range(120)
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    one = lsh_topk(e, 5, 10, n_planes=4, dims=8, n_tables=1).collect()
    two = lsh_topk(e, 5, 10, n_planes=4, dims=8, n_tables=2).collect()
    assert len(two) >= len(one)
    for r1, r2 in zip(one, two):
        assert r2["cosine"] >= r1["cosine"] - 1e-9
    assert lsh_topk(e, 10**9, 5, n_planes=4, dims=8, n_tables=3).count() == 0
