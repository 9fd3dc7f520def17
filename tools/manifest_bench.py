"""Commit-metadata cost evidence for the delta-log manifest (round-2
redesign): per-commit bytes and wall time must stay FLAT as the table
accumulates files — the round-1 design rewrote every live file per
commit, O(table). Pure metadata (no Spark). Run:
python tools/manifest_bench.py [n_buckets] [epochs]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import TARGET_SCHEMA

    n_buckets = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    d = tempfile.mkdtemp(prefix="manifest_bench_")
    tbl = LakeTable.create(d + "/t", TARGET_SCHEMA, n_buckets=n_buckets,
                           write_mode="mor")
    sizes, times = [], []
    for e in range(epochs):
        files = [
            {"path": f"data/snap-{e:05d}/_bucket={b}/part-0.parquet",
             "bucket": b, "schema_version": 0}
            for b in range(n_buckets)
        ]
        t0 = time.monotonic()
        tbl.commit_rewrite(
            base=tbl.snapshot(), new_files=files, replaced_buckets=set(),
            append_buckets=set(range(n_buckets)), epoch_id=e,
            summary={"operation": "append-delta", "epoch_id": e},
        )
        times.append(time.monotonic() - t0)
        sizes.append(os.path.getsize(tbl._manifest_path(e + 1)))
    live = len(tbl.snapshot().files())
    # what the round-1 full-rewrite design would have written on the LAST
    # commit: the whole folded state
    full_state_bytes = len(json.dumps(tbl.snapshot().m).encode())
    out = {
        "n_buckets": n_buckets,
        "epochs": epochs,
        "live_files_at_end": live,
        "delta_bytes_epoch1": sizes[0],
        "delta_bytes_last_epoch": sizes[-1],
        "delta_flat_ratio": round(sizes[-1] / sizes[0], 3),
        "round1_full_rewrite_bytes_last_epoch": full_state_bytes,
        "metadata_write_reduction_x": round(full_state_bytes / sizes[-1], 1),
        "commit_ms_p50": round(sorted(times)[len(times) // 2] * 1000, 2),
        "commit_ms_max": round(max(times) * 1000, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
