"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design rules for 100 TB:
  * hashes are md5 (engine-portable, verified bit-identical vs DuckDB);
    at cluster scale swap for xxhash64 behind the same signatures.
  * candidate generation is ALWAYS a bucket-join (band signature or
    simhash block), never an all-pairs product.
  * verification (jaccard) runs only on candidate pairs.
  * every stage is built-in Catalyst expressions — no Python in the
    hot path; explode->groupBy stages partial-aggregate before shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NBANDS = 8


def _word_shingles(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Explode word n-gram shingles (docs with < n words drop out)."""
    with_ws = df.withColumn("_ws", F.split(F.col(text_col), r"\s+")).filter(
        F.size("_ws") >= n
    )
    words = F.col("_ws")
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + k) for k in range(n)]
        ),
    )
    return with_ws.select(*df.columns, F.explode(shingles).alias("shingle")).drop("_ws")


def exact_duplicates(df: DataFrame, key: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: (text_hash, n_copies, keeper=min key)."""
    return (
        df.groupBy(F.md5(text_col).alias("text_hash"))
        .agg(F.count("*").alias("n_copies"), F.min(key).alias("keeper"))
        .filter(F.col("n_copies") > 1)
    )


def minhash_signatures(
    df: DataFrame, key: str, text_col: str, n_bands: int = DEFAULT_NBANDS, n: int = 3
) -> DataFrame:
    """Banded MinHash sketch: per (key, band) minimum of md5(shingle);
    band = md5-derived bucket of the shingle (so each band samples a
    deterministic shingle subset)."""
    sh = _word_shingles(df.select(key, text_col), text_col, n)
    return (
        sh.withColumn("h", F.md5("shingle"))
        .withColumn("band", F.conv(F.substring("h", 1, 2), 16, 10).cast("int") % n_bands)
        .groupBy(key, "band")
        .agg(F.min("h").alias("minhash"))
    )


def minhash_candidates(
    df: DataFrame, key: str, text_col: str, n_bands: int = DEFAULT_NBANDS, n: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """LSH candidate pairs: keys whose minhash collides in >=1 band.
    The join key is (band, minhash) — a bucket join, O(collisions).

    With materialize=True (default) the signature stage (shingle
    explosion + banded min) runs ONCE via eager localCheckpoint:
    Spark's ReuseExchange does not fire across the self-join's aliased
    branches, so the expensive subplan would otherwise execute twice
    (measured 1.4x slower at sf0.1). Trade-offs: construction becomes
    eager and checkpoint blocks are not fault-tolerant — pass
    materialize=False for lazy plans, or use the real cluster answer:
    operators/sigindex.py persists the signatures as a lake table
    maintained incrementally from the change feed (durable parquet,
    only changed docs re-shingle), and index_candidates() runs this
    same bucket join against it."""
    sig = minhash_signatures(df, key, text_col, n_bands, n)
    if materialize:
        sig = sig.localCheckpoint(eager=True)
    a, b = sig.alias("a"), sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col(f"a.{key}") < F.col(f"b.{key}")),
        )
        .groupBy(F.col(f"a.{key}").alias("doc_a"), F.col(f"b.{key}").alias("doc_b"))
        # count, not countDistinct: signatures carry exactly one row per
        # (key, band), so a pair can hit a band at most once and the
        # distinct-agg's second shuffle/expand is pure overhead on the
        # collision-pair stream (the largest intermediate of the query)
        .agg(F.count("a.band").cast("long").alias("bands_hit"))
    )


def ngram_jaccard(
    pairs: DataFrame, docs: DataFrame, key: str, text_col: str, n: int = 3
) -> DataFrame:
    """Exact n-gram Jaccard for candidate ``pairs`` (doc_a, doc_b).
    Runs after LSH pruning — never all-pairs."""
    grams = docs.withColumn("_ws", F.split(F.col(text_col), r"\s+")).filter(
        F.size("_ws") >= n
    )
    words = F.col("_ws")
    gs = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(words, i + k) for k in range(n)]),
        )
    )
    g = grams.select(F.col(key), gs.alias("gs"))
    ga = g.select(F.col(key).alias("doc_a"), F.col("gs").alias("gs_a"))
    gb = g.select(F.col(key).alias("doc_b"), F.col("gs").alias("gs_b"))
    inter = F.size(F.array_intersect("gs_a", "gs_b"))
    union = F.size(F.array_distinct(F.concat("gs_a", "gs_b")))
    return (
        pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
    )


def simhash64(df: DataFrame, key: str, text_col: str) -> DataFrame:
    """64-bit SimHash over word shingles: bit b of the signature is the
    sign of sum over shingles of (bit b of md5(shingle) ? +1 : -1).

    Expressed as explode -> per-bit conditional sums in ONE aggregation
    (64 conditional-count aggregates, all whole-stage codegen; the
    shuffle carries 64 longs per key, partial-aggregated map-side).
    Near-dup candidates = keys sharing a 16-bit block of the signature
    (hamming-distance LSH) — see simhash blocks in the suite.
    """
    sh = _word_shingles(df.select(key, text_col), text_col, 1)
    # bit b of md5: take hex nibble b//4, test bit b%4
    h = F.md5("shingle")
    aggs = []
    for b in range(64):
        nibble = F.conv(F.substring(h, (b // 4) + 1, 1), 16, 10).cast("int")
        bit = F.shiftright(nibble, b % 4) % 2
        aggs.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"s{b}"))
    sums = sh.groupBy(key).agg(*aggs)
    sig = None
    for b in range(64):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(0) * F.lit(
            2**b if b < 63 else -(2**63)
        )
        sig = term if sig is None else sig + term
    return sums.select(F.col(key), sig.alias("simhash"))
