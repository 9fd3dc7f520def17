"""Repetition-stats strategy bench: the zero-shuffle HOF plan
(operators/text.repetition_stats — per-doc max bigram count as the
longest equal-run in the array_sort'ed bigram array, one map stage)
vs the naive explode -> groupBy(doc, gram) -> max plan that shuffles
~|total words| rows.

Interleaved A/B arms (HOF, naive) x ROUNDS so host drift hits both
equally; one JSON line with per-arm runs + the speedup.

Usage: python tools/repetition_bench.py [n_docs] [words_per_doc] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from qwery_spark.operators.text import repetition_stats  # noqa: E402
from qwery_spark.session import get_spark  # noqa: E402


def _corpus(spark, n_docs: int, words: int):
    # deterministic synthetic docs from a small vocab (repetition-heavy,
    # like real low-quality web text)
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(words - 1)),
                lambda i: F.concat(
                    F.lit("w"), ((F.col("id") * 131 + i * 31) % 97).cast("string")
                ),
            ),
            " ",
        ).alias("text"),
    )


def _naive(df):
    ws = F.split("text", r"\s+")
    base = df.select("doc_id", ws.alias("ws"))
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "zip_with(slice(ws, 1, greatest(size(ws)-1, 0)),"
                " slice(ws, 2, greatest(size(ws)-1, 0)),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("gram"),
    )
    return (
        bigrams.groupBy("doc_id", "gram")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bigram_count"))
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    words = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("repetition-bench")
    df = _corpus(spark, n_docs, words).localCheckpoint(eager=True)

    # warm both plans once (JIT + codegen)
    repetition_stats(df.limit(1000), "doc_id", "text").count()
    _naive(df.limit(1000)).count()

    hof_runs, naive_runs = [], []
    checksum_hof = checksum_naive = None
    for _ in range(rounds):  # interleaved arms
        t = time.monotonic()
        checksum_hof = (
            repetition_stats(df, "doc_id", "text")
            .agg(F.sum("top_bigram_count"))
            .collect()[0][0]
        )
        hof_runs.append(round(time.monotonic() - t, 3))
        t = time.monotonic()
        checksum_naive = (
            _naive(df).agg(F.sum("top_bigram_count")).collect()[0][0]
        )
        naive_runs.append(round(time.monotonic() - t, 3))
    assert checksum_hof == checksum_naive, (checksum_hof, checksum_naive)

    hof, naive = min(hof_runs), min(naive_runs)
    print(json.dumps({
        "n_docs": n_docs, "words_per_doc": words,
        "hof_sec": hof, "naive_sec": naive,
        "hof_runs": hof_runs, "naive_runs": naive_runs,
        "speedup": round(naive / hof, 2),
        "checksum": checksum_hof,
    }))


if __name__ == "__main__":
    main()
