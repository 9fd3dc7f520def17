"""Range-join strategy bench: binned equi-join (operators/rangejoin.py)
vs Spark's native plan for a BETWEEN join (BroadcastNestedLoopJoin).

Two measurements, one JSON line:
  1. head-to-head at a size the nested loop can still finish
     (n_points x n_intervals comparisons);
  2. the binned join alone at SCALE_X times more points — near-linear
     wall-clock is the point (the nested loop would be SCALE_X times
     slower; it's not run at that size).

Usage: python tools/rangejoin_bench.py [n_points] [n_intervals] [scale_x]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from qwery_spark.operators.rangejoin import range_join  # noqa: E402
from qwery_spark.session import get_spark  # noqa: E402


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_iv = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    scale_x = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    spark = get_spark("rangejoin-bench", cpus=8, shuffle_partitions=8)

    def points(n):
        return spark.range(0, n, 1, 8).select(
            F.col("id").alias("pt"), (F.col("id") % 97).cast("double").alias("val")
        )

    # deterministic intervals: start every (span/n_iv), length 100
    def intervals(n, span):
        step = max(span // n, 1)
        return spark.range(0, n, 1, 4).select(
            F.col("id").alias("iv_id"),
            (F.col("id") * step).alias("lo"),
            (F.col("id") * step + 99).alias("hi"),
        )

    pts, iv = points(n_points), intervals(n_iv, n_points)

    # JIT/codegen warm BOTH strategies on a small slice first
    warm_p, warm_i = points(10_000), intervals(50, 10_000)
    range_join(warm_p, warm_i, "pt", "lo", "hi", bin_width=256).count()
    warm_p.join(warm_i, F.col("pt").between(F.col("lo"), F.col("hi"))).count()

    t0 = time.monotonic()
    n_binned = range_join(pts, iv, "pt", "lo", "hi", bin_width=256).count()
    binned_s = time.monotonic() - t0

    # native BETWEEN join -> BroadcastNestedLoopJoin (n_points x n_iv
    # comparisons; this is the strategy Spark picks without the operator)
    naive = pts.join(iv, F.col("pt").between(F.col("lo"), F.col("hi")))
    plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in plan or "Cartesian" in plan, "naive plan unexpectedly not a nested loop"
    t0 = time.monotonic()
    n_naive = naive.count()
    naive_s = time.monotonic() - t0
    assert n_naive == n_binned, (n_naive, n_binned)

    big_pts, big_iv = points(n_points * scale_x), intervals(n_iv * scale_x, n_points * scale_x)
    t0 = time.monotonic()
    n_big = range_join(big_pts, big_iv, "pt", "lo", "hi", bin_width=256).count()
    big_s = time.monotonic() - t0

    print(json.dumps({
        "n_points": n_points, "n_intervals": n_iv,
        "binned_sec": round(binned_s, 3), "nested_loop_sec": round(naive_s, 3),
        "speedup": round(naive_s / binned_s, 2),
        "pairs": n_binned,
        "scaled": {"x": scale_x, "n_points": n_points * scale_x,
                   "n_intervals": n_iv * scale_x,
                   "binned_sec": round(big_s, 3), "pairs": n_big,
                   "per_point_vs_small": round((big_s / (n_points * scale_x)) / (binned_s / n_points), 2)},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
