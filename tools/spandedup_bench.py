"""Exact-span dedup measurements (operators/spandedup.py):

1. LINEARITY — dup_spans + scrub wall at N and 4N docs (same doc
   shape): the pipeline is explode -> partial-agg -> one shuffle ->
   semi-join -> doc-keyed cut, so wall should scale ~linearly with the
   window volume (the 4N/N wall ratio is reported; ~4 = linear, the
   100-TB extrapolation argument).

2. SKEW-PROOFNESS — same N, but EVERY doc carries the same 16-token
   boilerplate header, so ~half of all windows share a handful of
   span_hash values (the hottest window occurs in 100% of docs). If
   the span_hash shuffle were row-at-a-time this run would stall on
   one reducer; with map-side partial aggregation the hot hash
   collapses to one row per map task, so the skewed run should cost
   about the same as the uniform run of equal volume.

Run: python tools/spandedup_bench.py [n_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 8


def _docs(spark, n: int, boiler_every: int):
    """n docs x ~32 tokens; every ``boiler_every``-th doc gets a fixed
    16-token header (boiler_every=1 => all docs, the skew case)."""
    from pyspark.sql import functions as F

    boiler = F.when(
        F.col("id") % boiler_every == 0,
        F.array(*[F.lit(900_000 + v) for v in range(16)]),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    # collision-free bodies: id*37 + i*31 is injective over (id, i)
    # for id < 50M and i <= 32 (37 and 31 coprime, i-range < 37), so
    # the dup profile is EXACTLY the boilerplate at every n — the 4N
    # rung measures volume scaling, not a different dedup workload
    body = F.expr(
        "transform(sequence(0, 15 + CAST(id % 17 AS INT)), "
        "i -> CAST(id * 37 + i * 31 AS INT))"
    )
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat(boiler, body).alias("tokens")
    )


def _measure(spark, docs):
    from pyspark.sql import functions as F

    from qwery_spark.operators.spandedup import dup_spans, scrub_dup_spans

    docs = docs.persist()
    n_windows = docs.select(
        F.sum(F.greatest(F.size("tokens") - L + 1, F.lit(0)))
    ).first()[0]
    t0 = time.monotonic()
    n_dup = dup_spans(docs, "doc_id", "tokens", L).count()
    dup_wall = time.monotonic() - t0
    t0 = time.monotonic()
    kept = (
        scrub_dup_spans(docs, "doc_id", "tokens", L)
        .select(F.sum(F.size("tokens_clean")))
        .first()[0]
    )
    scrub_wall = time.monotonic() - t0
    docs.unpersist()
    return {
        "windows": int(n_windows),
        "dup_hashes": int(n_dup),
        "kept_tokens": int(kept),
        "dup_spans_sec": round(dup_wall, 2),
        "scrub_sec": round(scrub_wall, 2),
        "windows_per_sec": round(n_windows / (dup_wall + scrub_wall)),
    }


def main():
    from qwery_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    spark = get_spark("spandedup-bench", cpus=32, shuffle_partitions=32)

    # warm the JVM on a small run so run 1 isn't JIT-dominated
    _measure(spark, _docs(spark, 20_000, 3))

    uniform_n = _measure(spark, _docs(spark, n, 3))
    uniform_4n = _measure(spark, _docs(spark, 4 * n, 3))
    skew = _measure(spark, _docs(spark, n, 1))

    out = {
        "n_docs": n,
        "L": L,
        "uniform_n": uniform_n,
        "uniform_4n": uniform_4n,
        "wall_ratio_4n_over_n": round(
            (uniform_4n["dup_spans_sec"] + uniform_4n["scrub_sec"])
            / (uniform_n["dup_spans_sec"] + uniform_n["scrub_sec"]),
            2,
        ),
        "skew_all_docs_boilerplate": skew,
        # skewed vs uniform at the SAME doc count; >1 means the hot
        # hash costs extra, ~1 means the partial agg absorbed it
        "skew_over_uniform_wall": round(
            (skew["dup_spans_sec"] + skew["scrub_sec"])
            / (uniform_n["dup_spans_sec"] + uniform_n["scrub_sec"]),
            2,
        ),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
