"""Incrementally maintained materialized aggregates over a CDC lake
table — the classic reason a change feed exists: keep a per-group
COUNT/SUM rollup current by applying only each window's change rows,
never re-reading the base table.

Works on the feed's preimage/postimage contract
(read_changes(include_preimages=True), Delta CDF shape):

  insert            -> +1 count, +value sums for its group
  update_preimage   -> -1 count, -old values for the OLD group
  update_postimage  -> +1 count, +new values for the NEW group
  delete            -> -1 count, -preimage values (delete rows carry
                       the preimage payload)

A group-changing update therefore moves the row between groups with no
special casing, and groups whose count reaches 0 are deleted from the
rollup. The rollup itself is a lake table keyed by the group column,
updated with ordinal = the window's end version — windows applied in
order (or replayed) converge via the normal LWW guard.

100-TB shape: one shuffle per window on the group column, sized by the
WINDOW's change volume (partial-aggregated map-side), then a broadcast
merge into the (small) rollup table. The equivalent recompute scans
the full base table per refresh.

Aggregates: COUNT/SUM (and mean as sum/count at read time) are fully
delta-maintained. MIN/MAX (``min_cols``/``max_cols``) use the standard
retraction fallback: additions tighten the stored extremum for free
(least/greatest), and ONLY when a window retracts a value equal to a
group's current extremum is that group recomputed from the base table
— a semi-join on the affected groups (window-bounded, usually a
handful), col-stats-pruned via read(col_ranges=) when the base carries
file stats for the group column. Windows that never delete the max
cost exactly what a count/sum window costs.

Reference anchor: beyond the reference (no change feed there); the
design is standard incremental view maintenance (counting algorithm)
restated on the lake's feed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwery_spark.lake.changes import read_changes
from qwery_spark.lake.table import LakeTable


@dataclass
class AggUpdateStats:
    change_rows: int = 0
    groups_touched: int = 0
    # groups whose min/max was recomputed from the base table because a
    # retraction reached the stored extremum (0 on count/sum-only views
    # and on windows that never delete an extremum)
    groups_recomputed: int = 0
    from_version: int = 0
    to_version: int = 0
    snapshot_version: int | None = None


def _agg_schema(group_col: str, group_type: T.DataType, sum_cols: list[str],
                min_cols: list[str] = (), max_cols: list[str] = ()):
    # nn_<c> = count of NON-NULL values feeding sum_<c>. SQL SUM is NULL
    # over an all-NULL (or empty) group, and a pure +/- accumulator
    # cannot tell that apart from a zero sum — so the rollup stores the
    # non-null count and nulls the sum when it hits 0. The accumulator
    # is recoverable as coalesce(sum, 0): sum is NULL only when nn = 0,
    # where the accumulator is exactly 0 too. min_/max_ columns are
    # naturally NULL when the group has no non-null values.
    return T.StructType(
        [
            T.StructField(group_col, group_type),
            T.StructField("n_rows", T.LongType()),
            *[T.StructField(f"sum_{c}", T.DoubleType()) for c in sum_cols],
            *[T.StructField(f"nn_{c}", T.LongType()) for c in sum_cols],
            *[T.StructField(f"min_{c}", T.DoubleType()) for c in min_cols],
            *[T.StructField(f"max_{c}", T.DoubleType()) for c in max_cols],
        ]
    )


def _reuse_or_create(path: str, schema: T.StructType, n_buckets: int,
                     key_col: str, write_mode: str,
                     stats_cols: list | None = None,
                     additive_cols: list | None = None) -> LakeTable:
    """Create the view table, or adopt an existing EMPTY one (version 0
    = a build that crashed between create and its first merge). A
    non-empty table is also adopted as-is — the build merge's epoch key
    makes re-building a completed view a no-op. Shared by every derived
    artifact whose build advertises replay idempotency (agg/SCD2
    rollups, signature index, ANN index)."""
    import os

    if os.path.exists(path):
        return LakeTable(path)
    return LakeTable.create(
        path, schema, n_buckets=n_buckets, key_col=key_col,
        write_mode=write_mode, stats_cols=stats_cols,
        additive_cols=additive_cols,
    )


def _minmax_aggs(min_cols: list[str], max_cols: list[str]) -> list:
    return [
        *[
            F.min(F.col(f"`{c}`").cast("double")).alias(f"min_{c}")
            for c in min_cols
        ],
        *[
            F.max(F.col(f"`{c}`").cast("double")).alias(f"max_{c}")
            for c in max_cols
        ],
    ]


def build_agg(
    spark: SparkSession,
    src: LakeTable,
    agg_path: str,
    group_col: str,
    sum_cols: list[str],
    n_buckets: int = 8,
    at_version: int | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> LakeTable:
    """Full build of the rollup from the source's live state (pinned to
    ``at_version`` when given — a follower builds at its resume point
    so later windows don't double-apply); ordinal = the source version
    it reflects, so incremental windows (which carry their own end
    versions) continue the same LWW order."""
    from qwery_spark.lake.merge import merge_changes

    min_cols = min_cols or []
    max_cols = max_cols or []
    version = src.current_version() if at_version is None else at_version
    # schema comes from the PINNED snapshot, not the head — a resume-
    # point build after schema evolution must see the columns as they
    # were at that version
    group_type = src.snapshot(version).spark_schema()[group_col].dataType
    agg = _reuse_or_create(
        agg_path, _agg_schema(group_col, group_type, sum_cols, min_cols, max_cols),
        n_buckets, group_col, "cow",
    )
    rows = (
        src.read(spark, snapshot_version=version)
        # NULL groups are excluded (a lake key cannot be null — and a
        # null group is not a group); same filter on the update path
        .filter(F.col(f"`{group_col}`").isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            *[
                F.sum(F.col(f"`{c}`").cast("double")).alias(f"sum_{c}")
                for c in sum_cols
            ],
            *[
                F.count(F.col(f"`{c}`")).cast("long").alias(f"nn_{c}")
                for c in sum_cols
            ],
            *_minmax_aggs(min_cols, max_cols),
        )
        .select(
            F.col(f"`{group_col}`"),
            "n_rows",
            *[f"sum_{c}" for c in sum_cols],
            *[f"nn_{c}" for c in sum_cols],
            *[f"min_{c}" for c in min_cols],
            *[f"max_{c}" for c in max_cols],
            F.lit("U").alias("op"),
            F.lit(version).cast("bigint").alias("ordinal"),
        )
    )
    merge_changes(spark, agg, rows, epoch_id=f"agg:{version}")
    return agg


def agg_deltas(
    feed: DataFrame, group_col: str, sum_cols: list[str],
    min_cols: list[str] = (), max_cols: list[str] = (),
) -> DataFrame:
    """Fold one preimage/postimage change window into per-group deltas
    — ONE group-column shuffle sized by the window, partial-aggregated
    map-side (plan-gated in tests/test_plans.py). Accumulator deltas
    treat a NULL value as 0 (SQL SUM skips nulls) and coalesce the
    aggregate itself so an all-NULL window can never null out the
    running accumulator; the non-null count delta (dnn_*) decides when
    the EXPOSED sum is NULL.

    For min/max columns the window folds to FOUR scalars per column:
    the tightest added value (addmin_/addmax_, from insert/postimage
    rows — merges into the stored extremum for free) and the most
    extreme retracted value (retmin_/retmax_, from delete/preimage
    rows — update_agg recomputes a group from the base table only when
    the retracted value reaches the stored extremum)."""
    add = F.col("_change_type").isin("insert", "update_postimage")
    sign = F.when(add, F.lit(1.0)).otherwise(F.lit(-1.0))
    return (
        feed.filter(F.col(f"`{group_col}`").isNotNull())
        .select(
            F.col(f"`{group_col}`"),
            sign.alias("_sign"),
            *[
                F.col(f"`{c}`").cast("double").alias(c)
                for c in dict.fromkeys([*sum_cols, *min_cols, *max_cols])
            ],
        )
        .groupBy(group_col)
        .agg(
            F.sum("_sign").cast("long").alias("d_n"),
            *[
                F.coalesce(
                    F.sum(F.coalesce(F.col(f"`{c}`"), F.lit(0.0)) * F.col("_sign")),
                    F.lit(0.0),
                ).alias(f"d_{c}")
                for c in sum_cols
            ],
            *[
                F.coalesce(
                    F.sum(
                        F.when(F.col(f"`{c}`").isNotNull(), F.col("_sign"))
                    ).cast("long"),
                    F.lit(0),
                ).alias(f"dnn_{c}")
                for c in sum_cols
            ],
            *[
                F.min(F.when(F.col("_sign") > 0, F.col(f"`{c}`")))
                .alias(f"addmin_{c}")
                for c in min_cols
            ],
            *[
                F.min(F.when(F.col("_sign") < 0, F.col(f"`{c}`")))
                .alias(f"retmin_{c}")
                for c in min_cols
            ],
            *[
                F.max(F.when(F.col("_sign") > 0, F.col(f"`{c}`")))
                .alias(f"addmax_{c}")
                for c in max_cols
            ],
            *[
                F.max(F.when(F.col("_sign") < 0, F.col(f"`{c}`")))
                .alias(f"retmax_{c}")
                for c in max_cols
            ],
        )
    )


def update_agg(
    spark: SparkSession,
    src: LakeTable,
    agg: LakeTable,
    group_col: str,
    sum_cols: list[str],
    from_version: int,
    to_version: int | None = None,
    feed: DataFrame | None = None,
    min_cols: list[str] | None = None,
    max_cols: list[str] | None = None,
) -> AggUpdateStats:
    """One change-feed window becomes one rollup commit. Reads the
    window's preimage/postimage rows, folds them into per-group deltas
    (one shuffle, window-sized), applies the deltas to the current
    rollup values, and merges: updated groups at ordinal = the window's
    end version, emptied groups as deletes. Idempotent per window via
    the agg table's epoch key (re-applying a window no-ops). Windows
    must be applied IN ORDER (each delta folds onto the rollup state
    the previous window left) — the same contract as a replicate
    follower, enforced naturally by follow_changes' ordered delivery.

    ``min_cols``/``max_cols`` maintain per-group MIN/MAX: additions
    tighten the stored extremum in-delta (least/greatest); a retraction
    that reaches a group's stored extremum triggers a recompute of THAT
    group only, from the base table at the window's end version —
    semi-joined on the affected groups and col-stats-pruned
    (read(col_ranges=)) when the base has file stats for the group
    column. stats.groups_recomputed counts them.

    Pass ``feed`` (a preimage-bearing changelog for the same range) to
    share one endpoint diff between several view maintainers — the same
    reuse contract as replicate(feed=)."""
    from qwery_spark.lake.merge import merge_changes

    min_cols = min_cols or []
    max_cols = max_cols or []
    to_version = src.current_version() if to_version is None else to_version
    stats = AggUpdateStats(from_version=from_version, to_version=to_version)
    if to_version <= from_version:
        return stats
    # a rollup built without these aggregate columns would otherwise
    # fail every window with an opaque unresolved-column error (e.g. a
    # follower restarted with new --agg-min/--agg-max flags against an
    # old rollup) — fail ONCE with the actionable mismatch instead
    have = {f["name"] for f in agg.snapshot().fields()}
    need = (
        ["n_rows"]
        + [f"sum_{c}" for c in sum_cols] + [f"nn_{c}" for c in sum_cols]
        + [f"min_{c}" for c in min_cols] + [f"max_{c}" for c in max_cols]
    )
    missing = [c for c in need if c not in have]
    if missing:
        raise ValueError(
            f"update_agg: rollup {agg.path!r} lacks columns {missing} — "
            f"it was built with different sum/min/max column sets; "
            f"rebuild it (new path or delete it) or match the original "
            f"aggregate spec"
        )
    # the rollup references source columns BY NAME; a source rename of
    # the group/aggregate columns mid-stream (schema evolution the
    # replica/SCD2 maintainers replay automatically) cannot be replayed
    # onto an aggregate view — its identity IS those names. Fail with
    # the rebuild contract instead of an unresolved-column error deep
    # in the delta fold.
    src_cols = {f["name"] for f in src.snapshot(to_version).fields()}
    gone = [c for c in [group_col, *sum_cols, *min_cols, *max_cols]
            if c not in src_cols]
    if gone:
        raise ValueError(
            f"update_agg: source {src.path!r} no longer has columns "
            f"{gone} at v{to_version} (renamed or dropped mid-stream) — "
            "rebuild the rollup against the new column names "
            "(build_agg at the current version) and resume from there"
        )
    if feed is None:
        feed = read_changes(
            spark, src, from_version, to_version, granular=False,
            include_preimages=True,
        )
    deltas = agg_deltas(feed, group_col, sum_cols, min_cols, max_cols).persist()
    merged = None
    try:
        stats.groups_touched = deltas.count()
        if stats.groups_touched == 0:
            return stats
        cur = agg.read(spark)
        # a retraction can only invalidate a stored extremum when it
        # REACHES it (a retracted value strictly inside the range
        # leaves min/max intact); only those groups pay a base read
        recompute = F.lit(False)
        for c in min_cols:
            recompute = recompute | (
                F.col(f"d.`retmin_{c}`").isNotNull()
                & F.col(f"c.`min_{c}`").isNotNull()
                & (F.col(f"d.`retmin_{c}`") <= F.col(f"c.`min_{c}`"))
            )
        for c in max_cols:
            recompute = recompute | (
                F.col(f"d.`retmax_{c}`").isNotNull()
                & F.col(f"c.`max_{c}`").isNotNull()
                & (F.col(f"d.`retmax_{c}`") >= F.col(f"c.`max_{c}`"))
            )
        # stored sum is NULL exactly when nn = 0, where the accumulator
        # is 0 — so coalesce(sum, 0) recovers the accumulator
        merged = (
            deltas.alias("d")
            .join(cur.alias("c"), group_col, "left")
            .select(
                F.col(f"`{group_col}`"),
                (F.coalesce(F.col("c.n_rows"), F.lit(0)) + F.col("d.d_n"))
                .cast("long")
                .alias("n_rows"),
                *[
                    (
                        F.coalesce(F.col(f"c.`sum_{c}`"), F.lit(0.0))
                        + F.col(f"d.`d_{c}`")
                    ).alias(f"acc_{c}")
                    for c in sum_cols
                ],
                *[
                    (
                        F.coalesce(F.col(f"c.`nn_{c}`"), F.lit(0))
                        + F.col(f"d.`dnn_{c}`")
                    )
                    .cast("long")
                    .alias(f"nn_{c}")
                    for c in sum_cols
                ],
                # least/greatest skip NULLs: a new group takes the
                # window's added extremum, an all-NULL column stays NULL
                *[
                    F.least(F.col(f"c.`min_{c}`"), F.col(f"d.`addmin_{c}`"))
                    .alias(f"imin_{c}")
                    for c in min_cols
                ],
                *[
                    F.greatest(F.col(f"c.`max_{c}`"), F.col(f"d.`addmax_{c}`"))
                    .alias(f"imax_{c}")
                    for c in max_cols
                ],
                recompute.alias("_recompute"),
            )
        )
        live = F.col("n_rows") > 0
        rec = None
        if min_cols or max_cols:
            # merged is consumed twice (recompute scan + final batch);
            # window-sized, so the persist is cheap
            merged = merged.persist()
            rec_groups = merged.filter(F.col("_recompute") & live).select(
                F.col(f"`{group_col}`")
            )
            stats.groups_recomputed = rec_groups.count()
            if stats.groups_recomputed:
                b = rec_groups.agg(
                    F.min(f"`{group_col}`").alias("lo"),
                    F.max(f"`{group_col}`").alias("hi"),
                ).first()
                base = src.read(
                    spark, snapshot_version=to_version,
                    col_ranges={group_col: (b["lo"], b["hi"])},
                )
                rec = (
                    base.filter(F.col(f"`{group_col}`").isNotNull())
                    .join(F.broadcast(rec_groups), group_col, "left_semi")
                    .groupBy(group_col)
                    .agg(*_minmax_aggs(min_cols, max_cols))
                )
        sel = (
            merged.alias("m")
            if rec is None
            else merged.alias("m").join(rec.alias("r"), group_col, "left")
        )

        def _final(c: str, kind: str):
            inc = F.col(f"m.`i{kind}_{c}`")
            if rec is None:
                return inc
            return F.when(
                F.col("m._recompute"), F.col(f"r.`{kind}_{c}`")
            ).otherwise(inc)

        batch = sel.select(
            F.col(f"`{group_col}`"),
            F.when(live, F.col("n_rows")).alias("n_rows"),
            *[
                F.when(live & (F.col(f"`nn_{c}`") > 0), F.col(f"`acc_{c}`"))
                .alias(f"sum_{c}")
                for c in sum_cols
            ],
            *[
                F.when(live, F.col(f"`nn_{c}`")).alias(f"nn_{c}")
                for c in sum_cols
            ],
            *[
                F.when(live, _final(c, "min")).alias(f"min_{c}")
                for c in min_cols
            ],
            *[
                F.when(live, _final(c, "max")).alias(f"max_{c}")
                for c in max_cols
            ],
            F.when(live, F.lit("U")).otherwise("D").alias("op"),
            F.lit(to_version).cast("bigint").alias("ordinal"),
        )
        r = merge_changes(spark, agg, batch, epoch_id=f"agg:{to_version}")
        stats.snapshot_version = r.snapshot_version
        return stats
    finally:
        deltas.unpersist()
        if merged is not None and (min_cols or max_cols):
            merged.unpersist()


# ---------------- SCD2 history maintenance ----------------
def _scd2_schema(key: str, src_snap) -> T.StructType:
    from qwery_spark.lake.merge import ENGINE_COLS

    key_type = src_snap.spark_schema()[key].dataType
    payload = [
        f for f in src_snap.fields()
        if f["name"] not in ENGINE_COLS and f["name"] != key
    ]
    return T.StructType(
        [
            T.StructField("hist_id", T.StringType()),
            T.StructField(key, key_type),
            *[
                T.StructField(f["name"], T.StructType.fromDDL(f"x {f['type']}")[0].dataType)
                for f in payload
            ],
            T.StructField("valid_from", T.LongType()),
            T.StructField("valid_to", T.LongType()),
        ]
    )


def build_scd2(
    spark: SparkSession,
    src: LakeTable,
    hist_path: str,
    n_buckets: int = 8,
    at_version: int | None = None,
) -> LakeTable:
    """Full build of an SCD2 (type-2 slowly-changing-dimension) history
    table from the source's live state: one OPEN row per live key
    (valid_from = the row's last_ordinal, valid_to = NULL). History
    rows are keyed by ``hist_id = key ':' valid_from`` — one immutable
    row per (key, version), closed in place when a later change
    supersedes it."""
    from qwery_spark.lake.merge import ENGINE_COLS, append_changes

    version = src.current_version() if at_version is None else at_version
    snap = src.snapshot(version)
    key = snap.m["key_col"]
    payload = [
        f["name"] for f in snap.fields()
        if f["name"] not in ENGINE_COLS and f["name"] != key
    ]
    hist = _reuse_or_create(
        hist_path, _scd2_schema(key, snap), n_buckets, "hist_id", "mor"
    )
    live = src.read_physical(spark, snapshot_version=version).filter(
        ~F.col("_deleted")
    )
    batch = live.select(
        F.concat_ws(
            ":", F.col(f"`{key}`").cast("string"),
            F.col("last_ordinal").cast("string"),
        ).alias("hist_id"),
        F.col(f"`{key}`"),
        *[F.col(f"`{c}`") for c in payload],
        F.col("last_ordinal").cast("bigint").alias("valid_from"),
        F.lit(None).cast("bigint").alias("valid_to"),
        F.lit("U").alias("op"),
        F.col("last_ordinal").cast("bigint").alias("ordinal"),
    )
    append_changes(spark, hist, batch, epoch_id=f"scd2:{version}")
    return hist


def update_scd2(
    spark: SparkSession,
    src: LakeTable,
    hist: LakeTable,
    from_version: int,
    to_version: int | None = None,
    feed: DataFrame | None = None,
) -> AggUpdateStats:
    """One change-feed window -> one history commit, built ENTIRELY from
    the feed (the history table is never read):

      insert            -> new OPEN row (valid_from = event ordinal)
      update            -> close the old version in place (the
                           update_preimage row carries its payload and
                           ordinal; the postimage's _preimage_ordinal
                           addresses it) + new OPEN row
      delete            -> close the old version (delete rows carry the
                           preimage payload; valid_to = delete ordinal)

    The close upserts the SAME hist_id at the closing ordinal
    (> valid_from), so LWW replaces the open row; replays no-op via the
    epoch key. History granularity == window granularity: versions that
    appear and die INSIDE one coarse window never materialize — drive
    per-commit (follow_changes granular windows) for full fidelity.

    Pass ``feed`` (a preimage-bearing changelog for the same range,
    caller-persisted) to share one endpoint diff between maintainers."""
    from qwery_spark.lake.merge import ENGINE_COLS, append_changes

    to_version = src.current_version() if to_version is None else to_version
    stats = AggUpdateStats(from_version=from_version, to_version=to_version)
    if to_version <= from_version:
        return stats
    snap = src.snapshot(to_version)
    key = snap.m["key_col"]
    # source DDL inside the window replays onto the history table first
    # (the batch below carries the to-version payload columns);
    # valid_from/valid_to/hist_id are structural — a source column
    # evolving onto one of those names raises instead of corrupting
    from qwery_spark.lake.changes import sync_schema_from_source

    sync_schema_from_source(
        src, hist, from_version, to_version,
        protect=frozenset({"hist_id", "valid_from", "valid_to"}),
    )
    payload = [
        f["name"] for f in snap.fields()
        if f["name"] not in ENGINE_COLS and f["name"] != key
    ]
    own_feed = feed is None
    if own_feed:
        feed = read_changes(
            spark, src, from_version, to_version, granular=False,
            include_preimages=True,
        ).persist()
    try:
        def _mk(df, valid_from, valid_to, ordinal):
            return df.select(
                F.concat_ws(
                    ":", F.col(f"`{key}`").cast("string"),
                    valid_from.cast("string"),
                ).alias("hist_id"),
                F.col(f"`{key}`"),
                *[F.col(f"`{c}`") for c in payload],
                valid_from.cast("bigint").alias("valid_from"),
                valid_to.cast("bigint").alias("valid_to"),
                F.lit("U").alias("op"),
                F.coalesce(valid_to, valid_from).cast("bigint").alias("ordinal"),
            )

        opens = _mk(
            feed.filter(F.col("_change_type").isin("insert", "update_postimage")),
            F.col("_ordinal"), F.lit(None).cast("bigint"), None,
        )
        # deletes carry the preimage payload directly
        del_closes = _mk(
            feed.filter(F.col("_change_type") == "delete"),
            F.col("_preimage_ordinal"), F.col("_ordinal"), None,
        )
        # update closes: old payload from the preimage row, closing
        # ordinal from its paired postimage (pre._ordinal == post._preimage_ordinal)
        pre = feed.filter(F.col("_change_type") == "update_preimage").alias("p")
        post = feed.filter(F.col("_change_type") == "update_postimage").select(
            F.col(f"`{key}`").alias("_k"),
            F.col("_preimage_ordinal").alias("_match"),
            F.col("_ordinal").alias("_close_at"),
        ).alias("q")
        upd_closes = _mk(
            pre.join(
                post,
                (F.col(f"p.`{key}`") == F.col("q._k"))
                & (F.col("p._ordinal") == F.col("q._match")),
            ),
            F.col("p._ordinal"), F.col("q._close_at"), None,
        )
        # persist the batch: the non-empty check and the append's write
        # job must not re-run the three projections + pre/post join
        batch = opens.unionByName(del_closes).unionByName(upd_closes).persist()
        try:
            stats.change_rows = batch.count()
            if stats.change_rows:
                r = append_changes(
                    spark, hist, batch, epoch_id=f"scd2:{to_version}"
                )
                stats.snapshot_version = r.snapshot_version
            return stats
        finally:
            batch.unpersist()
    finally:
        if own_feed:
            feed.unpersist()
