"""Z-order (Morton) clustering expression for multi-column file/row-
group pruning.

A single-column sort makes ONE column's per-file bounds tight; a range
predicate on any other column still scans everything. Interleaving the
bits of each column's rank code and sorting by that Morton value keeps
EVERY participating column's bounds reasonably tight simultaneously —
the standard lakehouse multi-dimensional clustering (Delta OPTIMIZE
ZORDER BY / Iceberg sort-order on a z-curve).

Shape at 100 TB: rank codes come from ``width_bucket`` against each
column's min/max (one tiny bounds aggregate — a 1-row collect — no
quantile sketch shipped to executors), the interleave is a pure
codegen'd integer expression, and the sort stays WITHIN bucket
partitions (compact's existing sortWithinPartitions — never a global
sort). Uniform-width ranks trade skew-optimality for zero driver
state; at 2^bits buckets per column the order statistics stay useful
under moderate skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple]:
    """One bounded 1-row aggregate: (min, max) per column."""
    row = df.agg(
        *[F.min(F.col(f"`{c}`")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(f"`{c}`")).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    return {c: (row[f"mn_{c}"], row[f"mx_{c}"]) for c in cols}


def zorder_col(
    bounds: dict[str, tuple], cols: list[str], bits_per_col: int = 8
) -> Column:
    """The Morton value as a Catalyst long expression: each column maps
    to a ``width_bucket`` rank in [0, 2^bits), ranks bit-interleave
    round-robin (column i contributes bit b to position b*n_cols + i).
    NULL values rank 0 (cluster together at the curve's origin).
    Total bits must fit a long: bits_per_col * len(cols) <= 62."""
    n = len(cols)
    if bits_per_col * n > 62:
        raise ValueError(
            f"zorder: {n} cols x {bits_per_col} bits exceeds a long"
        )
    hi_rank = (1 << bits_per_col) - 1
    ranks = []
    for c in cols:
        mn, mx = bounds[c]
        if mn is None or mx is None or mn == mx:
            ranks.append(F.lit(0).cast("long"))
            continue
        # width_bucket is 1-based and returns n_buckets+1 at the upper
        # bound — clamp into [0, 2^bits)
        r = F.width_bucket(
            F.col(f"`{c}`").cast("double"),
            F.lit(float(mn)),
            F.lit(float(mx)),
            F.lit(1 << bits_per_col),
        )
        ranks.append(
            F.least(
                F.greatest(r - F.lit(1), F.lit(0)), F.lit(hi_rank)
            ).cast("long")
        )
    z = F.lit(0).cast("long")
    for b in range(bits_per_col):
        for i, r in enumerate(ranks):
            z = z + F.shiftleft(
                F.shiftright(r, b).bitwiseAND(F.lit(1)), b * n + i
            )
    return z
