"""Payload-column stats pruning micro-bench: selective range read with
vs without the col_ranges scan hint, on a z-ordered table.

Builds one MOR table (doc_id, x, y) with stats on both axes, z-order
compacts it into many small files, then times a selective y-range read
three ways: full scan + filter, col_ranges-pruned scan + filter, and
the same under an x-sorted layout (where y pruning cannot help). Also
reports files touched per mode — the scale-invariant number.

One JSON line. Usage: PYTHONPATH=. python tools/colstats_bench.py [n_rows] [files_per_bucket]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    files_per_bucket = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from qwery_spark.lake.merge import append_changes, compact
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.session import get_spark

    spark = get_spark("colstats-bench", cpus=8, shuffle_partitions=8)
    base = tempfile.mkdtemp(
        prefix="qwery_cs_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("x", T.LongType()),
            T.StructField("y", T.LongType()),
        ]
    )
    grid = 1024  # x,y in [0, grid)
    rows_df = (
        spark.range(n_rows)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % grid).alias("x"),
            ((F.col("id") / grid).cast("long") % grid).alias("y"),
            F.lit("U").alias("op"),
            F.col("id").alias("ordinal"),
        )
    )
    per_file = max(n_rows // files_per_bucket, 1)
    out = {"n_rows": n_rows, "files_per_bucket": files_per_bucket}
    try:
        for layout in ("zorder", "xsort"):
            tbl = LakeTable.create(
                f"{base}/{layout}", schema, n_buckets=1, key_col="doc_id",
                write_mode="mor", stats_cols=["x", "y"],
            )
            append_changes(spark, tbl, rows_df)
            if layout == "zorder":
                compact(spark, tbl, zorder_cols=["x", "y"],
                        max_records_per_file=per_file)
            else:
                compact(spark, tbl, sort_cols=["x"],
                        max_records_per_file=per_file)
            snap = tbl.snapshot()
            total = len(snap.files())
            rng = {"y": (0, grid // 16)}  # ~6% selectivity on y
            pruned = len(snap.files(col_ranges=rng))

            def run(col_ranges):
                t0 = time.monotonic()
                n = (
                    tbl.read(spark, col_ranges=col_ranges)
                    .filter(f"y <= {grid // 16}")
                    .count()
                )
                return round(time.monotonic() - t0, 3), n

            run(None)  # warm
            full_sec, n_full = run(None)
            pruned_sec, n_pruned = run(rng)
            assert n_full == n_pruned, "pruning lost rows!"
            out[layout] = {
                "files_total": total,
                "files_after_y_prune": pruned,
                "full_scan_sec": full_sec,
                "pruned_scan_sec": pruned_sec,
                "rows_matched": n_full,
                "speedup": round(full_sec / pruned_sec, 2) if pruned_sec else None,
            }
        print(json.dumps(out))
        spark.stop()
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
