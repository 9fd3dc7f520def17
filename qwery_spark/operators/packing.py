"""Sequence packing: greedy assignment of token sequences into
fixed-budget context windows — the packing pass every pre-training
data pipeline runs before writing training shards.

pack_id(row) = floor((running_token_sum - n_tok) / budget) over the
pack order, i.e. a document starts a new pack exactly when the tokens
before it fill the previous window.

Scale shape: packing is order-DEFINED, and at 100 TB the order key is
(shard, position-within-shard) — no pipeline packs one global stream.
``with_packing(partition_col=...)`` therefore runs the running-sum
window PER SHARD (parallel across shards, no single-task stage) and
then offsets each shard's local pack ids by the total pack count of
the shards before it (the same two-pass offset scheme as
operators/rank.py), so pack ids stay globally unique and dense.
The offsets pass collects one row per shard — bounded like a bucket
list, driver-safe.

The unpartitioned form (a global ORDER BY window, every row through
one task) is kept only for small/oracle use and explicitly documented
as non-scalable.

No reference analogue (the reference has no array/token ops); this
serves the training-data brief (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _pack_expr(n_tok: Column, budget: int, w) -> Column:
    """floor((prefix_sum - n_tok) / budget): the pack a row STARTS in."""
    return F.floor(((F.sum(n_tok).over(w) - n_tok).cast("double")) / budget).cast(
        "bigint"
    )


def local_packs(
    df: DataFrame,
    budget: int,
    n_tok_col: str,
    order_cols: list[str],
    partition_col: str,
    pack_col: str = "_lp",
) -> DataFrame:
    """df + shard-local pack ids: the per-shard running-sum window.
    Exposed separately so plan tests can assert the window partitions
    by the shard (hash exchange, NOT Exchange SinglePartition)."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(pack_col, _pack_expr(F.col(n_tok_col), budget, w))


def with_packing(
    df: DataFrame,
    budget: int,
    n_tok_col: str,
    order_cols: list[str],
    partition_col: str | None = None,
    pack_col: str = "pack_id",
) -> DataFrame:
    """Assign every row a global pack id under greedy sequence packing.

    With ``partition_col``: per-shard windows + per-shard offsets —
    fully parallel, the scalable form. Without it: one global-order
    window (single task; only for small inputs / oracle parity).
    """
    if partition_col is None:
        w = Window.orderBy(*order_cols).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        return df.withColumn(pack_col, _pack_expr(F.col(n_tok_col), budget, w))

    spark = df.sparkSession
    local = local_packs(df, budget, n_tok_col, order_cols, partition_col)
    # eager localCheckpoint: the offsets pass and the final projection
    # MUST see one materialization (and the window isn't recomputed);
    # blocks free when the returned DataFrame is garbage-collected.
    local = local.localCheckpoint(eager=True)
    per_shard = local.groupBy(partition_col).agg(F.max("_lp").alias("_mx")).collect()
    total, offsets = 0, []
    # NULL shard (nullable partition columns exist at real scale) is its
    # own group: sort it first, join null-safely below
    for r in sorted(per_shard, key=lambda r: (r[0] is not None, r[0] if r[0] is not None else 0)):
        offsets.append((r[0], total))
        total += int(r["_mx"]) + 1
    shard_type = dict(df.dtypes)[partition_col]
    off_df = spark.createDataFrame(
        offsets or [(None, 0)], f"`{partition_col}` {shard_type}, _off long"
    )
    joined = local.join(
        F.broadcast(off_df.withColumnRenamed(partition_col, "_off_key")),
        local[partition_col].eqNullSafe(F.col("_off_key")),
        "left",
    )
    return (
        joined.withColumn(pack_col, (F.col("_lp") + F.col("_off")).cast("bigint"))
        .drop("_lp", "_off", "_off_key")
    )
