"""The span index's economic argument, measured: scrubbing a small
NEW batch against a deep corpus.

  no-index arm   one-shot scrub_dup_spans over (corpus UNION batch),
                 restricted to the batch — re-fingerprints the WHOLE
                 corpus every time a batch arrives
  index arm      update_span_index with the batch's change window
                 (O(batch) maintenance), then scrub_against_index —
                 only the batch is fingerprinted; the corpus-side work
                 is a semi-join against the index's cnt>=2 slice

Arms are INTERLEAVED [no-index, index] x3 (house A/B discipline: host
drift hits both equally); the one-time index build cost is reported
separately — it is the amortized corpus pass the no-index arm repays
on EVERY batch.

Run: python tools/spanindex_bench.py [corpus_docs] [batch_docs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

L = 8


def _docs(spark, lo: int, n: int, boiler_every: int = 3):
    from pyspark.sql import functions as F

    boiler = F.when(
        F.col("id") % boiler_every == 0,
        F.array(*[F.lit(900_000 + v) for v in range(16)]),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    body = F.expr(
        "transform(sequence(0, 15 + CAST(id % 17 AS INT)), "
        "i -> CAST(id * 37 + i * 31 AS INT))"
    )
    return spark.range(lo, lo + n).select(
        F.col("id").alias("doc_id"), F.concat(boiler, body).alias("tokens")
    )


def main():
    from pyspark.sql import functions as F

    from qwery_spark.lake.merge import append_changes
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.operators.spandedup import scrub_dup_spans
    from qwery_spark.operators.spanindex import (
        build_span_index,
        scrub_against_index,
        update_span_index,
    )
    from qwery_spark.session import get_spark
    from pyspark.sql import types as T

    corpus_n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    batch_n = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000
    spark = get_spark("spanindex-bench", cpus=32, shuffle_partitions=32)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="spanidx_bench_", dir=base)
    try:
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("tokens", T.ArrayType(T.IntegerType())),
            ]
        )
        src = LakeTable.create(
            d + "/src", schema, n_buckets=16, key_col="doc_id",
            write_mode="mor",
        )
        corpus = _docs(spark, 0, corpus_n).select(
            "doc_id", "tokens", F.lit("U").alias("op"),
            F.col("doc_id").alias("ordinal"),
        )
        append_changes(spark, src, corpus)
        v0 = src.current_version()
        t0 = time.monotonic()
        idx = build_span_index(spark, src, d + "/idx", "tokens", L,
                               n_buckets=16)
        build_sec = time.monotonic() - t0

        # the batch: new docs, a third boilerplated (they must come out
        # scrubbed of the corpus-wide header)
        batch = _docs(spark, corpus_n, batch_n).persist()
        batch.count()
        append_changes(spark, src, batch.select(
            "doc_id", "tokens", F.lit("U").alias("op"),
            (F.col("doc_id") + 10_000_000).alias("ordinal"),
        ))
        t0 = time.monotonic()
        update_span_index(spark, src, idx, "tokens", L, from_version=v0)
        update_sec = time.monotonic() - t0

        def _noindex_arm():
            # the no-index alternative re-fingerprints corpus ∪ batch
            union = src.read(spark)
            return (
                scrub_dup_spans(union, "doc_id", "tokens", L)
                .join(batch.select("doc_id"), "doc_id", "left_semi")
                .select(F.sum(F.size("tokens_clean")))
                .first()[0]
            )

        def _index_arm():
            return (
                scrub_against_index(spark, batch, idx, "doc_id", "tokens", L)
                .select(F.sum(F.size("tokens_clean")))
                .first()[0]
            )

        # warm both arms once, then interleave
        kept_a = _noindex_arm()
        kept_b = _index_arm()
        assert kept_a == kept_b, (kept_a, kept_b)
        runs = {"noindex": [], "index": []}
        for _ in range(3):
            t0 = time.monotonic()
            _noindex_arm()
            runs["noindex"].append(round(time.monotonic() - t0, 2))
            t0 = time.monotonic()
            _index_arm()
            runs["index"].append(round(time.monotonic() - t0, 2))
        best_no = min(runs["noindex"])
        best_ix = min(runs["index"])
        print(json.dumps({
            "corpus_docs": corpus_n,
            "batch_docs": batch_n,
            "L": L,
            "index_build_sec_once": round(build_sec, 2),
            "index_update_sec_per_batch": round(update_sec, 2),
            "runs_interleaved": runs,
            "noindex_scrub_sec": best_no,
            "index_scrub_sec": best_ix,
            "speedup": round(best_no / best_ix, 2),
            "kept_tokens_equal": True,
        }))
    finally:
        shutil.rmtree(d, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
