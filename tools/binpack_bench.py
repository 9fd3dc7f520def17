"""Binpack vs full-bucket compaction: maintenance write amplification.

Setup: one bucket holding a large compacted sorted file (N_BASE rows)
plus N_DELTAS small per-epoch delta files. Maintenance choices:
  A. compact()  — rewrites the WHOLE bucket (base + deltas);
  B. binpack()  — merges only the small deltas, base untouched.
Both leave the same logical state; the difference is bytes written per
tick and wall time. Also reports the read-side cost before/after each
(file count is the read-amplification driver for MOR resolution).

The binpack threshold is 8 MB: the compacted base lands as ~26 MB
files (2M-row maxRecordsPerFile), the per-epoch deltas are ~30 KB.

Usage: python tools/binpack_bench.py [n_base] [n_deltas] [rows_per_delta]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from qwery_spark.lake.merge import append_changes, binpack, compact, merge_changes  # noqa: E402
from qwery_spark.lake.table import LakeTable  # noqa: E402
from qwery_spark.session import get_spark  # noqa: E402

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("v", T.IntegerType()),
    ]
)


def _mk(spark, root, n_base, n_deltas, rows_per_delta):
    t = LakeTable.create(root + "/t", SCHEMA, n_buckets=1, write_mode="mor")
    base = spark.range(n_base).select(
        F.format_string("k%09d", F.col("id")).alias("doc_id"),
        F.lit("U").alias("op"),
        F.col("id").alias("ordinal"),
        F.col("id").cast("int").alias("v"),
    )
    merge_changes(spark, t, base, epoch_id=0)
    compact(spark, t, sort_cols=["doc_id"])
    for e in range(1, n_deltas + 1):
        delta = spark.range(rows_per_delta).select(
            F.format_string("k%09d", (F.col("id") * 7919 + e) % n_base).alias("doc_id"),
            F.lit("U").alias("op"),
            (F.lit(e) * 1_000_000 + F.col("id")).alias("ordinal"),
            F.lit(-e).cast("int").alias("v"),
        )
        append_changes(spark, t, delta, epoch_id=e)
    return t


def _bytes(t):
    return sum(
        os.path.getsize(os.path.join(t.path, f["path"]))
        for f in t.snapshot().m["files"]
    )


def _read_sec(spark, t):
    s = time.monotonic()
    t.read(spark).agg(F.sum("v")).collect()
    return round(time.monotonic() - s, 3)


def main():
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    n_deltas = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    per = int(sys.argv[3]) if len(sys.argv) > 3 else 2_000
    spark = get_spark("binpack-bench")

    out = {"n_base": n_base, "n_deltas": n_deltas, "rows_per_delta": per}
    for arm in ("full_compact", "binpack"):
        root = tempfile.mkdtemp(prefix=f"bp_{arm}_")
        try:
            t = _mk(spark, root, n_base, n_deltas, per)
            files_before = len(t.snapshot().m["files"])
            bytes_before = _bytes(t)
            read_before = _read_sec(spark, t)
            s = time.monotonic()
            if arm == "full_compact":
                compact(spark, t, sort_cols=["doc_id"])
            else:
                binpack(spark, t, small_bytes=8 << 20, min_files=2)
            wall = round(time.monotonic() - s, 3)
            written = _bytes(t) - 0  # live bytes after; delta vs before below
            out[arm] = {
                "wall_sec": wall,
                "files": [files_before, len(t.snapshot().m["files"])],
                "live_bytes": [bytes_before, written],
                # bytes WRITTEN by the tick = live bytes the new commit
                # added (old files persist until expire+vacuum)
                "bytes_written": sum(
                    os.path.getsize(os.path.join(t.path, f["path"]))
                    for f in json.load(
                        open(t._manifest_path(t.current_version()))
                    ).get("add_files", [])
                ),
                "read_sec": [read_before, _read_sec(spark, t)],
            }
        finally:
            shutil.rmtree(root, ignore_errors=True)
    fc, bp = out["full_compact"], out["binpack"]
    out["write_amplification_ratio"] = round(
        fc["bytes_written"] / max(bp["bytes_written"], 1), 2
    )
    out["wall_ratio"] = round(fc["wall_sec"] / max(bp["wall_sec"], 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
