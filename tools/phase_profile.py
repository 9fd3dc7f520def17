"""Phase attribution for the lifecycle bench queries (guide §1.1).

Wraps the engine's eager entry points (append/merge/compact, view
build/update, changelog construction) with wall timers, runs one
registry query, and prints a per-call breakdown — answering "where do
the 30 seconds of tok_span_index_dups actually go" without touching
production code.

Usage: python tools/phase_profile.py [--sf DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CALLS: list[tuple[str, float]] = []


def _wrap(mod, name: str):
    fn = getattr(mod, name)

    @functools.wraps(fn)
    def timed(*a, **kw):
        t0 = time.monotonic()
        try:
            return fn(*a, **kw)
        finally:
            CALLS.append((f"{mod.__name__.split('.')[-1]}.{name}",
                          time.monotonic() - t0))

    setattr(mod, name, timed)
    return fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from qwery_spark.session import get_spark
    from qwery_spark.suite import REGISTRY
    import qwery_spark.lake.merge as merge_mod
    import qwery_spark.lake.changes as changes_mod
    import qwery_spark.operators.vocab as vocab_mod
    import qwery_spark.operators.materialize as mat_mod
    import qwery_spark.operators.sigindex as sig_mod
    import qwery_spark.operators.spanindex as spanidx_mod
    import qwery_spark.operators.joinview as jv_mod

    # NOTE: wrap the *module attributes*; callers that imported the name
    # directly (suite fns import inside the function body) resolve
    # through the module at call time, so the wrappers are seen. Modules
    # that bound a name at THEIR import time (vocab's read_changes,
    # spanindex's update_unit_counts) get their own binding wrapped too.
    for mod, names in [
        (merge_mod, ["append_changes", "merge_changes", "compact",
                     "_stage_write"]),
        (changes_mod, ["read_changes", "_diff_pruning"]),
        (vocab_mod, ["build_unit_counts", "update_unit_counts",
                     "read_changes"]),
        (spanidx_mod, ["build_span_index", "update_span_index",
                       "build_unit_counts", "update_unit_counts"]),
        (sig_mod, ["build_signature_index", "update_signature_index",
                   "index_candidates"]),
        (mat_mod, ["read_changes"]),
        (jv_mod, ["read_changes"]),
    ]:
        for n in names:
            try:
                _wrap(mod, n)
            except AttributeError:
                pass

    spark = get_spark(f"phaseprof-{args.cpus}", cpus=args.cpus,
                      shuffle_partitions=max(args.cpus, 4))
    for name in args.queries:
        CALLS.clear()
        t0 = time.monotonic()
        n = REGISTRY[name].fn(spark, args.sf).count()
        total = time.monotonic() - t0
        print(f"\n=== {name}: {total:.2f}s total, {n} rows ===")
        # nested calls double-count (update_unit_counts contains
        # merge_changes contains _stage_write) — print all, read nested
        for label, sec in CALLS:
            print(f"  {sec:8.2f}s  {label}")
    spark.stop()


if __name__ == "__main__":
    main()
