"""Skew stress: dedup strategy comparison on a hot-key-heavy batch.

Fixture: 2M change events where 50% of all updates hit ONE doc_id
(pathological binlog hot row) — far worse than the Zipf(1.1) default.

Strategies (qwery_spark.cdc.dedup):
  max_by agg      — partial combine map-side; the hot key collapses to
                    one row per map task before the shuffle
  window          — row_number over (key, ordinal desc): every hot-key
                    row shuffles to ONE task, which then sorts 1M rows
  salted window   — two-phase mitigation if a window were required

Run: python tools/skew_bench.py [n_events] [hot_fraction]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa

from qwery_spark.datagen import ARROW_EVENT_SCHEMA, make_events


def make_hot_events(n: int, hot_fraction: float, seed: int = 42) -> pa.Table:
    tbl = make_events(n, seed=seed, max_len=64, p_insert=0.3, p_update=0.6, p_delete=0.1)
    rng = np.random.default_rng(seed + 1)
    doc = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(object)
    op = tbl["op"].to_numpy(zero_copy_only=False)
    upd = np.flatnonzero(op == "U")
    hot = rng.choice(upd, size=int(len(upd) * hot_fraction), replace=False)
    doc[hot] = "doc-hot"
    cols = [tbl[i] for i in range(tbl.num_columns)]
    cols[2] = pa.array(doc, type=pa.string())
    return pa.Table.from_arrays(cols, schema=ARROW_EVENT_SCHEMA)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_fraction = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5

    from qwery_spark.cdc import dedup as D
    from qwery_spark.schema import EVENT_SCHEMA
    from qwery_spark.session import get_spark

    spark = get_spark("skew-bench", cpus=8, shuffle_partitions=8)
    import tempfile

    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="skew_", dir="/dev/shm" if os.path.isdir("/dev/shm") else None)
    pq.write_table(make_hot_events(n, hot_fraction), d + "/events.parquet", row_group_size=32000)
    ev = spark.read.schema(EVENT_SCHEMA).parquet(d + "/events.parquet").drop("ddl")

    strategies = {
        "max_by_agg": D.lww_dedup,
        "window": D.lww_dedup_window,
        "salted_window": D.lww_dedup_salted_window,
    }
    results = {}
    for name, fn in strategies.items():
        fn(ev).count()  # warm
        t0 = time.monotonic()
        out = fn(ev).count()
        dt = time.monotonic() - t0
        results[name] = (dt, out)
        print(f"{name:14s}: {dt:7.2f}s  ({out} winners)", flush=True)
    base = results["max_by_agg"][0]
    for name, (dt, _) in results.items():
        print(f"{name:14s}: {dt / base:5.2f}x vs max_by")
    spark.stop()


if __name__ == "__main__":
    main()
