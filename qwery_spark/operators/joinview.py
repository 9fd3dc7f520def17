"""Incrementally maintained materialized JOIN view over two CDC lake
tables — the enrichment join every CDC pipeline ends up materializing
(fact rows decorated with dimension attributes), kept current from the
two tables' change feeds without ever recomputing the join.

View definition (many-to-one enrichment, the overwhelmingly common
case): ``V = L ⋈ R on L.fk_col = R.key`` where R is a lake table keyed
by the join column (LWW tables are key-unique, so R is a proper
dimension) and the view is keyed by L's key — every left row owns at
most one view row, so the view is itself a normal LWW lake table and
all the existing machinery (time travel, change feed, compaction,
replay idempotency) applies to it transitively.

Maintenance per window — the classic delta-join decomposition
(ΔV = ΔL ⋈ R' ∪ (L' − ΔL) ⋈ ΔR, specialised to the keyed form):

  1. affected left keys = keys(ΔL)  ∪  keys(live L' rows whose fk ∈
     keys(ΔR)).  The second term is the dimension fan-out: a changed
     dim row re-decorates every fact row pointing at it.
  2. recompute the view row for exactly those keys: live left rows
     (key-pruned base read + broadcast semi-join) joined to the
     needed dim slice (key-pruned + broadcast semi-join on the
     window's distinct fks).
  3. one LWW merge: matched rows upsert; a left key with no live row
     deletes its view row; an inner-join key with no dim match
     deletes too (``how='left'`` keeps it with NULL dim columns).

100-TB shape: every term is window-bounded. keys(ΔL)/keys(ΔR) are the
feeds themselves; the fan-out scan reads L' pruned by fk col-stats with
a broadcast semi-join on the window's dim keys (cost O(matching fact
rows), the irreducible fan-out work — NOT O(|L|) when file stats
cover fk, e.g. after compact(sort_cols=[fk_col])); the affected-key
base read is key-hull + bucket pruned; the dim lookup touches
|distinct fks in window| keys of R. The equivalent recompute joins two
full tables per refresh.

Both feeds share the read_changes(include_preimages=True) contract, so
a follower can hand update_join the SAME window diff it already pulled
for replicate/update_agg/update_scd2 (feed= params), paying zero extra
diff cost for the join view.

Reference anchor: beyond the reference (no change feed there); the
decomposition is standard incremental view maintenance for joins
(counting/delta-join algorithm) restated on the lake's keyed feeds.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwery_spark.lake.changes import read_changes
from qwery_spark.lake.table import LakeTable


@dataclass
class JoinUpdateStats:
    affected_keys: int = 0
    from_left: int = 0
    to_left: int = 0
    from_right: int = 0
    to_right: int = 0
    snapshot_version: int | None = None


def _join_schema(
    left_snap, right_snap, fk_col: str,
    left_cols: list[str], right_cols: list[str],
) -> T.StructType:
    lkey = left_snap.m["key_col"]
    ltypes = {f["name"]: f["type"] for f in left_snap.fields()}
    rtypes = {f["name"]: f["type"] for f in right_snap.fields()}
    lschema = left_snap.spark_schema()
    rschema = right_snap.spark_schema()
    for c in (lkey, fk_col, *left_cols):
        if c not in ltypes:
            raise ValueError(f"left table lacks column {c!r}")
    for c in right_cols:
        if c not in rtypes:
            raise ValueError(f"right table lacks column {c!r}")
    clash = set(right_cols) & {lkey, fk_col, *left_cols}
    if clash:
        raise ValueError(
            f"right_cols {sorted(clash)} collide with left-side view "
            "columns — alias them in the dimension table first"
        )
    return T.StructType(
        [
            T.StructField(lkey, lschema[lkey].dataType),
            T.StructField(fk_col, lschema[fk_col].dataType),
            *[T.StructField(c, lschema[c].dataType) for c in left_cols],
            *[T.StructField(c, rschema[c].dataType) for c in right_cols],
        ]
    )


def _hull(df: DataFrame, col: str):
    """(lo, hi) of a window-sized key set — one tiny scalar agg, used
    only as a read(col_ranges=) scan hint."""
    r = df.agg(F.min(F.col(f"`{col}`")).alias("lo"),
               F.max(F.col(f"`{col}`")).alias("hi")).first()
    if r is None or r["lo"] is None:
        return None
    return (r["lo"], r["hi"])


def _dim_slice(
    spark: SparkSession, right: LakeTable, at_version: int,
    fks: DataFrame, fk_col: str, right_cols: list[str],
) -> DataFrame:
    """The dimension rows matching ``fks`` (window-bounded distinct fk
    values): key-hull-pruned read + broadcast semi-join, renamed to the
    view's fk column name."""
    rkey = right.snapshot(at_version).m["key_col"]
    hull = _hull(fks, fk_col)
    ranges = {rkey: hull} if hull is not None else None
    r = right.read(spark, snapshot_version=at_version, col_ranges=ranges)
    # probe renamed to a reserved name: rkey and fk_col are often the
    # SAME name (dim key == fact fk), which would make the join
    # condition ambiguous
    probe = fks.select(F.col(f"`{fk_col}`").alias("_fk_probe"))
    return (
        r.join(
            F.broadcast(probe),
            F.col(f"`{rkey}`") == F.col("_fk_probe"),
            "left_semi",
        )
        .select(F.col(f"`{rkey}`").alias(fk_col), *[f"`{c}`" for c in right_cols])
    )


def window_batch(
    spark: SparkSession,
    left: LakeTable,
    right: LakeTable,
    affected: DataFrame,
    fk_col: str,
    left_cols: list[str],
    right_cols: list[str],
    to_left: int,
    to_right: int,
    how: str,
) -> DataFrame:
    """The window's LWW merge batch for the given affected-key set —
    the delta-join recompute, exposed so tests can gate its physical
    plan: two broadcast LEFT-SEMI joins (affected keys against the
    key-hull-pruned base, window fks against the key-hull-pruned dim),
    never a full-table join."""
    lkey = left.snapshot(to_left).m["key_col"]
    # ---- live left rows for the affected keys ----
    khull = _hull(affected, lkey)
    ranges = {lkey: khull} if khull is not None else None
    lrows = (
        left.read(spark, snapshot_version=to_left, col_ranges=ranges)
        .join(F.broadcast(affected), lkey, "left_semi")
        .select(f"`{lkey}`", f"`{fk_col}`", *[f"`{c}`" for c in left_cols])
    )

    # ---- dim slice for the fks those rows reference ----
    fks = (
        lrows.filter(F.col(f"`{fk_col}`").isNotNull())
        .select(fk_col).distinct()
    )
    dim = _dim_slice(spark, right, to_right, fks, fk_col, right_cols)

    # ---- one LWW batch: upserts + deletes ----
    joined = (
        lrows.withColumn("_l_live", F.lit(True))
        .join(dim.withColumn("_r_live", F.lit(True)), fk_col, "left")
    )
    out = affected.join(joined, lkey, "left")
    if how == "inner":
        live = F.col("_l_live").isNotNull() & F.col("_r_live").isNotNull()
    else:
        live = F.col("_l_live").isNotNull()
    return out.select(
        f"`{lkey}`",
        F.when(live, F.col(f"`{fk_col}`")).alias(fk_col),
        *[F.when(live, F.col(f"`{c}`")).alias(c) for c in left_cols],
        *[F.when(live, F.col(f"`{c}`")).alias(c) for c in right_cols],
        F.when(live, F.lit("U")).otherwise("D").alias("op"),
        F.lit(to_left + to_right).cast("bigint").alias("ordinal"),
    )


def build_join(
    spark: SparkSession,
    left: LakeTable,
    right: LakeTable,
    view_path: str,
    fk_col: str,
    left_cols: list[str],
    right_cols: list[str],
    how: str = "inner",
    n_buckets: int = 8,
    at_left_version: int | None = None,
    at_right_version: int | None = None,
) -> LakeTable:
    """Full build of the join view from both tables' live states
    (pinned to the given versions when a follower builds at its resume
    point). ordinal = at_left + at_right: strictly increasing across
    in-order windows (each window advances at least one side), so
    replayed/out-of-order applications converge via the normal LWW
    guard; the build merge's epoch key makes re-building a no-op."""
    from qwery_spark.lake.merge import merge_changes
    from qwery_spark.operators.materialize import _reuse_or_create

    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    vl = left.current_version() if at_left_version is None else at_left_version
    vr = right.current_version() if at_right_version is None else at_right_version
    lsnap = left.snapshot(vl)
    lkey = lsnap.m["key_col"]
    schema = _join_schema(lsnap, right.snapshot(vr), fk_col, left_cols, right_cols)
    view = _reuse_or_create(
        view_path, schema, n_buckets, lkey, "cow",
        stats_cols=[fk_col],
    )
    lrows = (
        left.read(spark, snapshot_version=vl)
        .select(f"`{lkey}`", f"`{fk_col}`", *[f"`{c}`" for c in left_cols])
    )
    fks = lrows.filter(F.col(f"`{fk_col}`").isNotNull()).select(fk_col).distinct()
    dim = _dim_slice(spark, right, vr, fks, fk_col, right_cols)
    joined = lrows.join(dim, fk_col, how)
    rows = joined.select(
        f"`{lkey}`", f"`{fk_col}`",
        *[f"`{c}`" for c in left_cols],
        *[f"`{c}`" for c in right_cols],
        F.lit("U").alias("op"),
        F.lit(vl + vr).cast("bigint").alias("ordinal"),
    )
    merge_changes(spark, view, rows, epoch_id=f"join:{vl}:{vr}")
    return view


def update_join(
    spark: SparkSession,
    left: LakeTable,
    right: LakeTable,
    view: LakeTable,
    fk_col: str,
    left_cols: list[str],
    right_cols: list[str],
    from_left: int,
    from_right: int,
    to_left: int | None = None,
    to_right: int | None = None,
    how: str = "inner",
    left_feed: DataFrame | None = None,
    right_feed: DataFrame | None = None,
) -> JoinUpdateStats:
    """One combined change window (both feeds) becomes one view commit.
    Windows must be applied in order (same contract as update_agg);
    re-applying a window no-ops via the epoch key ``join:<to_l>:<to_r>``
    and the LWW ordinal ``to_left + to_right`` (strictly increasing
    across in-order windows). Pass ``left_feed``/``right_feed`` to reuse
    a diff already computed for other view maintainers."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    to_left = left.current_version() if to_left is None else to_left
    to_right = right.current_version() if to_right is None else to_right
    stats = JoinUpdateStats(
        from_left=from_left, to_left=to_left,
        from_right=from_right, to_right=to_right,
    )
    if to_left <= from_left and to_right <= from_right:
        return stats
    from qwery_spark.lake.merge import merge_changes

    lsnap = left.snapshot(to_left)
    lkey = lsnap.m["key_col"]
    rkey = right.snapshot(to_right).m["key_col"]
    # the view is keyed + schema'd off the left table; a mid-stream
    # rename/drop of a referenced column can't be replayed onto a view
    # whose identity IS those names (same contract as update_agg)
    have_l = {f["name"] for f in lsnap.fields()}
    gone = [c for c in [lkey, fk_col, *left_cols] if c not in have_l]
    have_r = {f["name"] for f in right.snapshot(to_right).fields()}
    gone += [c for c in right_cols if c not in have_r]
    if gone:
        raise ValueError(
            f"update_join: source column(s) {gone} no longer exist at "
            f"(left v{to_left}, right v{to_right}) — rebuild the view "
            "against the new column names and resume from there"
        )

    if left_feed is None and to_left > from_left:
        left_feed = read_changes(
            spark, left, from_left, to_left, granular=False,
            include_preimages=True,
        )
    if right_feed is None and to_right > from_right:
        right_feed = read_changes(
            spark, right, from_right, to_right, granular=False,
            include_preimages=True,
        )

    # ---- 1. affected left keys (window-bounded) ----
    parts = []
    if left_feed is not None:
        parts.append(left_feed.select(F.col(f"`{lkey}`")))
    if right_feed is not None:
        # dimension fan-out: every live fact row pointing at a changed
        # dim key gets re-decorated. fk col-stats prune the scan; the
        # semi-join is broadcast (dim window keys, small by contract).
        rk = right_feed.select(F.col(f"`{rkey}`").alias("_fk_probe")).distinct()
        hull = _hull(rk, "_fk_probe")
        ranges = {fk_col: hull} if hull is not None else None
        lv = left.read(spark, snapshot_version=to_left, col_ranges=ranges)
        parts.append(
            lv.join(
                F.broadcast(rk),
                F.col(f"`{fk_col}`") == F.col("_fk_probe"),
                "left_semi",
            ).select(F.col(f"`{lkey}`"))
        )
    if not parts:
        return stats
    affected = parts[0]
    for p in parts[1:]:
        affected = affected.unionAll(p)
    affected = affected.distinct().persist()
    try:
        stats.affected_keys = affected.count()
        if stats.affected_keys == 0:
            return stats

        batch = window_batch(
            spark, left, right, affected, fk_col, left_cols, right_cols,
            to_left, to_right, how,
        )
        r = merge_changes(
            spark, view, batch, epoch_id=f"join:{to_left}:{to_right}"
        )
        stats.snapshot_version = r.snapshot_version
        return stats
    finally:
        affected.unpersist()
