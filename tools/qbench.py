"""Per-query bench isolation (optimization guide §1.1/§1.4).

Times individual registry queries with EXACTLY bench.py's methodology
(one warm run — plan + IO cache — then one timed ``.count()``), without
touching the frozen bench.py. Optionally repeats, and captures
``explain("formatted")`` plans to a directory.

Usage:
  python tools/qbench.py [--sf DIR] [--repeat N] [--explain PLANDIR] \
      [--label SUFFIX] [query ...]

Defaults: sf dir from $SPARK_GRAFT_SF_DIR (fallback /root/testdata/sf0.1),
queries = bench.py's BENCH_QUERIES list. Prints one JSON line at the end:
{"sf_dir": ..., "queries": {name: [sec, ...]}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--explain", default=None,
                    help="directory to write <query>_<label>.txt plans")
    ap.add_argument("--label", default="plan")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from bench import BENCH_QUERIES
    from qwery_spark.session import get_spark
    from qwery_spark.suite import REGISTRY

    names = args.queries or BENCH_QUERIES
    spark = get_spark(
        f"qbench-{args.cpus}", cpus=args.cpus,
        shuffle_partitions=max(args.cpus, 4),
    )
    out: dict[str, list[float]] = {}
    for name in names:
        fn = REGISTRY[name].fn
        spark.sparkContext.setJobDescription(f"qbench warm: {name}")
        fn(spark, args.sf).count()  # warm (plan + IO cache)
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            plan = fn(spark, args.sf)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, args.sf)._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain, f"{name}_{args.label}.txt"), "w"
            ) as fh:
                fh.write(plan)
        ts = []
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"qbench timed: {name} #{i}")
            t0 = time.monotonic()
            fn(spark, args.sf).count()
            ts.append(round(time.monotonic() - t0, 3))
        out[name] = ts
        print(f"TIMED {name}: {ts}", flush=True)
    print(json.dumps({"sf_dir": args.sf, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
