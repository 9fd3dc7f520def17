"""Deterministic seeded global shuffle for training-data ordering —
the last step of every LLM data pipeline: fix a seed, get the SAME
document order on any engine, any cluster size, any re-run, with no
RNG state to checkpoint.

Order key = md5(seed || '|' || id): shard = first 8 hex digits mod
n_shards, position = rank of the key within the shard. Both are pure
projections of the row — membership and order survive partial re-runs
and speculative retries by construction (same property as the
hash-threshold samplers in suite/text.py, extended from membership to
ORDER).

100-TB shape: ONE shuffle (hash-partition by shard), per-shard sort —
never a global ORDER BY. Shards are the unit of training-loader
parallelism, so a per-shard order is exactly as useful as a total
order and costs a fraction: Spark sorts each shard independently
inside its own task set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def shuffle_key(id_col: str, seed: int):
    """The deterministic order key: md5 over seed + id."""
    return F.md5(
        F.concat(F.lit(f"{seed}|"), F.col(f"`{id_col}`").cast("string"))
    )


def shard_assignments(
    df: DataFrame, id_col: str, seed: int, n_shards: int
) -> DataFrame:
    """(id, shard, pos): the complete deterministic shuffle order.
    shard = first 32 bits of the key mod n_shards; pos = 1-based rank
    within the shard (key, then id as the md5-collision tie-break).
    One shuffle on shard, per-shard sort."""
    k = shuffle_key(id_col, seed)
    shard = F.pmod(
        F.conv(F.substring(k, 1, 8), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    w = Window.partitionBy("shard").orderBy("_k", id_col)
    return (
        df.select(F.col(f"`{id_col}`"), k.alias("_k"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_k")
    )


def write_shards(
    df: DataFrame, id_col: str, seed: int, n_shards: int, path: str
) -> None:
    """Materialize the shuffled corpus as shard=N/ parquet dirs, rows
    inside each shard in shuffle order (training loaders read shards
    sequentially and interleave across shards). One shuffle + one
    per-partition sort; re-running with the same seed reproduces the
    identical layout."""
    k = shuffle_key(id_col, seed)
    shard = F.pmod(
        F.conv(F.substring(k, 1, 8), 16, 10).cast("long"), F.lit(n_shards)
    ).cast("int")
    (
        df.withColumn("_k", k)
        .withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_k", id_col)
        .drop("_k")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
