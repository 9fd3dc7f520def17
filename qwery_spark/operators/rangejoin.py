"""Range (interval) join: match points to intervals without the
nested-loop trap.

`left.point BETWEEN right.lo AND right.hi` has no equi-key, so Catalyst
plans BroadcastNestedLoopJoin — O(|L|·|R|) comparisons, fatal beyond
toy sizes. The standard fix (what Databricks' range-join optimization
does under the hood) is BINNING:

  1. pick a bin width W (>= typical interval length);
  2. each interval [lo, hi] is exploded to ceil((hi-lo)/W)+1 bin ids;
  3. each point maps to ONE bin id: floor(point / W);
  4. equi-join on bin id (hash join, shuffles on the bin key),
     then re-check the exact BETWEEN predicate.

Cost: |R| × (avg interval/W + 1) replicated interval rows instead of
the cross product — the classic time-series enrichment shape (event ↦
containing session/maintenance window/rate period). The reference has
no range join (SURVEY.md §2.3: nested-loop inner equi-join only); this
serves the training-data/time-series brief. Oracle: plain BETWEEN join
in DuckDB (suite/cdc.py cdc_range_join_windows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _explode_bins(df: DataFrame, lo: str, hi: str, bin_width: int) -> DataFrame:
    """df + one row per bin id in [floor(lo/W), floor(hi/W)] — the
    interval-replication step both joins share."""
    return df.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / bin_width).cast("bigint"),
                F.floor(F.col(hi) / bin_width).cast("bigint"),
            )
        ),
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to the interval rows containing it
    (inclusive bounds). Column sets must be disjoint. how='inner' or
    'left' (unmatched points kept with null interval columns).

    The plan is: explode intervals to covered bins (size amplification
    ~ interval/bin_width), hash equi-join on the bin, exact BETWEEN
    re-check — no BroadcastNestedLoopJoin at any size.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how must be inner|left, got {how!r}")
    if bin_width <= 0:
        raise ValueError(f"range_join: bin_width must be positive, got {bin_width}")
    dup = set(points.columns) & set(intervals.columns)
    if dup:
        raise ValueError(f"range_join: overlapping column names {sorted(dup)}")
    if "_bin" in points.columns or "_bin" in intervals.columns:
        raise ValueError("range_join: '_bin' is reserved; rename that column")

    lo, hi, pt = F.col(lo_col), F.col(hi_col), F.col(point_col)
    binned_r = _explode_bins(intervals, lo_col, hi_col, bin_width)
    binned_l = points.withColumn("_bin", F.floor(pt / bin_width).cast("bigint"))
    cond = (F.col("l._bin") == F.col("r._bin")) & pt.between(lo, hi)
    joined = binned_l.alias("l").join(binned_r.alias("r"), cond, how)
    return joined.drop("_bin")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: int,
) -> DataFrame:
    """Interval-OVERLAP join: one row per (left, right) pair whose
    closed intervals intersect (l.lo <= r.hi AND r.lo <= l.hi) — the
    time-span alignment operator (Flink's interval join shape; e.g.
    audio segments x transcript spans in a multimodal pipeline).

    Both sides explode to covered bins and hash-equi-join on the bin.
    A pair sharing K bins would emit K duplicates; instead of a
    dedup shuffle, each pair is emitted ONLY from its canonical bin —
    the bin of max(l.lo, r.lo), the first bin where both intervals are
    live. One hash join, no distinct(), no nested loop.
    """
    if bin_width <= 0:
        raise ValueError(f"interval_join: bin_width must be positive, got {bin_width}")
    dup = set(left.columns) & set(right.columns)
    if dup:
        raise ValueError(f"interval_join: overlapping column names {sorted(dup)}")
    if "_bin" in left.columns or "_bin" in right.columns:
        raise ValueError("interval_join: '_bin' is reserved; rename that column")

    ll, lh = F.col(f"l.`{left_lo}`"), F.col(f"l.`{left_hi}`")
    rl, rh = F.col(f"r.`{right_lo}`"), F.col(f"r.`{right_hi}`")
    overlap = (ll <= rh) & (rl <= lh)
    canonical = F.col("l._bin") == F.floor(F.greatest(ll, rl) / bin_width).cast(
        "bigint"
    )
    joined = (
        _explode_bins(left, left_lo, left_hi, bin_width)
        .alias("l")
        .join(
            _explode_bins(right, right_lo, right_hi, bin_width).alias("r"),
            (F.col("l._bin") == F.col("r._bin")) & overlap & canonical,
        )
    )
    return joined.drop("_bin")
