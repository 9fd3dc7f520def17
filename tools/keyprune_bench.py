"""Key-set diff-pruning evidence: on a DEEP key-sorted table, a small
scattered-update window's changelog diff must read O(window) data, not
O(touched buckets). The hull of a scattered window spans the whole
table (file-level pruning can't fire), so the win comes from the
key-set layer (changes._diff_pruning): the window's exact keys, pushed
into the parquet scan as an In predicate, prune ROW GROUPS inside the
big sorted files.

Measures read_changes(v, v+1, include_preimages) wall with the pruning
layers on (shipping default) vs forced off, same table, interleaved
runs. Small parquet row groups (256 KB) stand in for the many-row-group
files a 100-TB table has naturally.

Run: python tools/keyprune_bench.py [base_rows] [window_keys]
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
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    import qwery_spark.lake.changes as ch
    from qwery_spark.lake.changes import read_changes
    from qwery_spark.lake.merge import append_changes, compact
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.session import get_spark

    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    window_keys = int(sys.argv[2]) if len(sys.argv) > 2 else 500

    spark = get_spark(
        "keyprune-bench", cpus=32, shuffle_partitions=32,
        extra_conf={
            # ~256 KB row groups: the bench-scale stand-in for the
            # many-row-group files of a 100-TB table
            "spark.hadoop.parquet.block.size": str(256 * 1024),
        },
    )
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="keyprune_", dir=base)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.StringType()),
        T.StructField("n", T.LongType()),
    ])
    try:
        tbl = LakeTable.create(
            d + "/t", schema, n_buckets=8, key_col="doc_id", write_mode="mor"
        )
        rows = spark.range(base_rows).select(
            F.col("id").alias("doc_id"),
            F.md5(F.col("id").cast("string")).alias("payload"),
            (F.col("id") % 9973).cast("long").alias("n"),
            F.lit("U").alias("op"),
            F.col("id").alias("ordinal"),
        )
        append_changes(spark, tbl, rows)
        # key-sorted files -> narrow per-row-group doc_id bounds
        compact(spark, tbl, sort_cols=["doc_id"])
        v = tbl.current_version()

        stride = max(base_rows // window_keys, 1)
        win = spark.range(0, base_rows, stride).limit(window_keys).select(
            F.col("id").alias("doc_id"),
            F.lit("upd").alias("payload"),
            F.lit(7).cast("long").alias("n"),
            F.lit("U").alias("op"),
            (F.col("id") + 10_000_000).alias("ordinal"),
        )
        append_changes(spark, tbl, win)

        def run():
            t0 = time.monotonic()
            n = read_changes(
                spark, tbl, v, include_preimages=True
            ).count()
            return time.monotonic() - t0, n

        real_pruning = ch._added_key_range
        on_t, off_t = [], []
        n_on = n_off = None
        run()  # warm (JIT + page cache) with pruning on
        for _ in range(3):  # interleaved arms
            t, n_on = run()
            on_t.append(round(t, 3))
            ch._added_key_range = lambda *a, **k: None  # forces (None, None)
            t, n_off = run()
            off_t.append(round(t, 3))
            ch._added_key_range = real_pruning
        assert n_on == n_off, f"pruned diff changed the result: {n_on} != {n_off}"

        rng, keys = ch._diff_pruning(spark, tbl, v, v + 1, "doc_id")
        out = {
            "base_rows": base_rows,
            "window_keys": window_keys,
            "key_set_fired": keys is not None,
            "key_set_size": None if keys is None else len(keys),
            "hull": [str(x) for x in rng] if rng else None,
            "feed_rows": n_on,
            "pruned_sec": on_t,
            "unpruned_sec": off_t,
            "speedup_best": round(min(off_t) / min(on_t), 2),
            "speedup_median": round(sorted(off_t)[1] / sorted(on_t)[1], 2),
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
