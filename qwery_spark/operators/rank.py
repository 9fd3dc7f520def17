"""Distributed global ranking / ntile without a single-task window.

``Window.orderBy(...)`` with no partition key funnels EVERY row through
one task (Exchange SinglePartition) — fine at sf0.01, fatal at 100 TB.
The scalable equivalent is the classic range-partition + offset scheme
(what Spark's own zipWithIndex/sortWithinPartitions machinery does):

  1. ``repartitionByRange`` on the sort key: partition i holds a
     contiguous key range, partitions ordered by id.
  2. one skinny job collects per-partition counts (P rows, driver-safe);
     prefix sums give each partition's global offset.
  3. per-partition ``row_number`` (parallel across P tasks) + broadcast
     offset = exact global rank. No global sort, no single-task stage.

The reference has no ranking at all (SURVEY.md §2.5); this serves the
ntile/top-k analytics the suite exposes beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int | None = None,
    rank_col: str = "_rank",
) -> tuple[DataFrame, int]:
    """Return (df + exact 1-based global rank by ``order_cols``, total
    row count). The input is persisted so the two passes (count, rank)
    see identical range-partition boundaries (range sampling is not
    re-run against cached partitions)."""
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    parted = df.repartitionByRange(p, *[F.col(c) for c in order_cols]).withColumn(
        "_pid", F.spark_partition_id()
    )
    # eager localCheckpoint, not persist(): (a) both passes MUST see the
    # same materialization (range-partition sampling reseeds per query
    # execution, so a recompute could move partition boundaries), and
    # (b) the blocks' lifetime is tied to the returned DataFrame — when
    # it is garbage-collected the ContextCleaner frees them, instead of
    # a session-lifetime cache entry leaking per call.
    parted = parted.localCheckpoint(eager=True)
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total, offsets = 0, []
    for pid in sorted(counts):
        offsets.append((pid, total))
        total += counts[pid]
    off_df = spark.createDataFrame(offsets or [(0, 0)], "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    ranked = (
        parted.join(F.broadcast(off_df), "_pid", "left")
        .withColumn(rank_col, (F.row_number().over(w) + F.col("_off")).cast("bigint"))
        .drop("_pid", "_off")
    )
    return ranked, total


def with_ntile(
    df: DataFrame,
    n: int,
    order_cols: list[str],
    num_partitions: int | None = None,
    tile_col: str = "tile",
) -> DataFrame:
    """Exact SQL ``ntile(n) OVER (ORDER BY order_cols)`` semantics —
    the first (total % n) tiles get one extra row — computed without a
    global-sort window."""
    ranked, total = with_global_rank(df, order_cols, num_partitions)
    if total == 0:
        return ranked.withColumn(tile_col, F.lit(None).cast("int")).drop("_rank")
    base, rem = divmod(total, n)
    big = base + 1  # rows per tile in the first `rem` tiles
    cutoff = rem * big
    r = F.col("_rank")
    tile = F.when(
        (F.lit(rem) > 0) & (r <= cutoff), ((r - 1) / big).cast("int") + 1
    ).otherwise(
        # guard base==0 (n > total): every row landed in the rem branch
        (F.lit(rem) + ((r - 1 - cutoff) / F.greatest(F.lit(base), F.lit(1))).cast("int") + 1)
    )
    return ranked.withColumn(tile_col, tile.cast("int")).drop("_rank")


def with_group_cumsum(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    val_col: str,
    num_partitions: int | None = None,
    cum_col: str = "_cum",
) -> DataFrame:
    """Exact per-group running sum of ``val_col`` by ``order_cols`` —
    ``sum(v) OVER (PARTITION BY g ORDER BY o)`` — without a per-group
    single-task window. Same scheme as with_global_rank, keyed by
    (group, order):

      1. repartitionByRange on (group, *order): each group occupies a
         contiguous run of partitions.
      2. one skinny job sums val per (partition, group) — at most
         P + |groups| rows (contiguity!), driver-safe; per-group prefix
         sums over partition ids give each (partition, group) offset.
      3. per-partition window (parallel) + broadcast offset join.

    A 100-TB mixture with 5 domains still spreads each domain across
    ~P/5 partitions instead of 5 tasks."""
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    keys = [F.col(group_col)] + [F.col(c) for c in order_cols]
    parted = df.repartitionByRange(p, *keys).withColumn(
        "_pid", F.spark_partition_id()
    )
    # same eager-localCheckpoint rationale as with_global_rank: both
    # passes must see identical range boundaries
    parted = parted.localCheckpoint(eager=True)
    sums = (
        parted.groupBy("_pid", group_col)
        .agg(F.sum(val_col).alias("_s"))
        .collect()
    )
    by_group: dict = {}
    for r in sums:
        by_group.setdefault(r[group_col], []).append((r["_pid"], r["_s"]))
    offsets = []
    for g, parts in by_group.items():
        acc = 0
        for pid, s in sorted(parts):
            offsets.append((pid, g, acc))
            acc += s or 0
    gtype = df.schema[group_col].dataType.simpleString()
    off_df = spark.createDataFrame(
        offsets or [(0, None, 0)], f"_pid int, `{group_col}` {gtype}, _off long"
    )
    w = Window.partitionBy("_pid", group_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        parted.join(F.broadcast(off_df), ["_pid", group_col], "left")
        .withColumn(
            cum_col,
            (F.sum(F.col(val_col)).over(w) + F.coalesce(F.col("_off"), F.lit(0))).cast(
                "bigint"
            ),
        )
        .drop("_pid", "_off")
    )
