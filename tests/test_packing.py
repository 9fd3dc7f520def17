"""with_packing: greedy sequence packing — global and sharded forms."""

from pyspark.sql import functions as F

from qwery_spark.operators.packing import with_packing


def _rows(n_toks, shards=None):
    if shards is None:
        return [(i, t) for i, t in enumerate(n_toks)]
    return [(i, t, s) for i, (t, s) in enumerate(zip(n_toks, shards))]


def _expected_packs(ordered_n_toks, budget):
    """Reference greedy packing: pack = floor(prefix_before / budget)."""
    out, prefix = [], 0
    for t in ordered_n_toks:
        out.append(prefix // budget)
        prefix += t
    return out


def test_global_packing_matches_reference(spark):
    toks = [10, 30, 30, 5, 64, 1, 100, 3]
    df = spark.createDataFrame(_rows(toks), "ordinal long, n_tok int")
    got = {
        r["ordinal"]: r["pack_id"]
        for r in with_packing(df, 64, "n_tok", ["ordinal"]).collect()
    }
    exp = _expected_packs(toks, 64)
    assert [got[i] for i in range(len(toks))] == exp


def test_sharded_packing_offsets_are_dense_and_unique(spark):
    # two shards with different pack counts; ids must be globally dense
    toks = [50, 50, 50, 10, 10, 200]
    shards = [0, 0, 0, 1, 1, 1]
    df = spark.createDataFrame(
        _rows(toks, shards), "ordinal long, n_tok int, shard int"
    )
    out = with_packing(df, 64, "n_tok", ["ordinal"], partition_col="shard").collect()
    by_ord = {r["ordinal"]: r for r in out}
    # shard 0 (ordinals 0-2): prefixes 0,50,100 -> local packs 0,0,1
    assert [by_ord[i]["pack_id"] for i in (0, 1, 2)] == [0, 0, 1]
    # shard 1 (ordinals 3-5): prefixes 0,10,20 -> local 0,0,0; offset = 2
    assert [by_ord[i]["pack_id"] for i in (3, 4, 5)] == [2, 2, 2]
    # global ids dense: 0..max with no gaps
    ids = sorted({r["pack_id"] for r in out})
    assert ids == list(range(len(ids)))


def test_sharded_equals_global_per_shard(spark):
    """Within each shard, sharded pack membership == global packing of
    that shard's rows alone (pack boundaries don't cross shards)."""
    import random

    rng = random.Random(7)
    toks = [rng.randint(1, 80) for _ in range(200)]
    shards = [i % 4 for i in range(200)]
    df = spark.createDataFrame(
        _rows(toks, shards), "ordinal long, n_tok int, shard int"
    )
    out = with_packing(df, 64, "n_tok", ["ordinal"], partition_col="shard").collect()
    for s in range(4):
        rows = sorted((r for r in out if r["shard"] == s), key=lambda r: r["ordinal"])
        exp = _expected_packs([r["n_tok"] for r in rows], 64)
        local = [r["pack_id"] for r in rows]
        base = local[0]
        assert [p - base for p in local] == exp


def test_packing_budget_respected(spark):
    """No pack's STARTING prefix exceeds its window: every pack holds
    docs whose pre-doc prefix sums lie in [pack*budget, (pack+1)*budget)."""
    toks = [13, 29, 7, 64, 64, 1, 1, 1, 90, 2]
    df = spark.createDataFrame(_rows(toks), "ordinal long, n_tok int")
    out = sorted(
        with_packing(df, 64, "n_tok", ["ordinal"]).collect(),
        key=lambda r: r["ordinal"],
    )
    prefix = 0
    for r in out:
        assert r["pack_id"] == prefix // 64
        prefix += r["n_tok"]


def test_empty_input(spark):
    df = spark.createDataFrame([], "ordinal long, n_tok int, shard int")
    assert with_packing(df, 64, "n_tok", ["ordinal"], partition_col="shard").count() == 0


def test_sharded_packing_null_shard(spark):
    """A NULL shard is its own pack group (nullable partition columns
    exist at scale) — no crash, no silently-null pack ids."""
    rows = [(0, 10, 0), (1, 10, 0), (2, 10, None), (3, 60, None)]
    df = spark.createDataFrame(rows, "ordinal long, n_tok int, shard int")
    out = with_packing(df, 64, "n_tok", ["ordinal"], partition_col="shard")
    got = {r["ordinal"]: r["pack_id"] for r in out.collect()}
    assert None not in got.values()
    assert len(set(got.values())) >= 2  # null group offset from shard 0
