"""ANN retrieval-quality bench (round-5 verdict task 4): every ANN
oracle in the suite proves the Spark plan EQUALS a DuckDB recomputation
of the same algorithm — determinism, not quality. This tool measures
what a real user tunes: recall@k of the approximate searchers vs the
brute-force exact-cosine ground truth, against the cost axis (fraction
of the corpus scored per query).

Two corpora, same sweep:
  - ``sf``: the driver's embeddings.parquet. Measured fact: those
    vectors are ISOTROPIC (within-label mean cosine 0.0018 vs 0.0008
    across labels) — 64-dim uniform noise has no locality for ANY
    ANN structure to exploit, so recall/cost there is the documented
    worst case, not an index defect.
  - ``clustered``: a deterministic synthetic corpus with real cluster
    structure (20 centers, noise sigma-0.3 — the shape deduplicated
    web-scale embedding corpora actually have). This arm is what
    justifies the shipped defaults.

Methods, all through the shipping operators:
  - persisted IVF index batch probe (operators/annindex.index_batch_topk)
    over a kmeans_fit quantizer, K in {16, 45, 64} cells x n_probe in
    {1, 2, 4} — index built + cell-sorted-compacted exactly as
    run_follow maintains it;
  - point probe (index_topk): asserted EQUAL to the batch probe's
    rows for a query sample (same index, same params);
  - hyperplane LSH bucket search (operators/similarity.lsh_bucket,
    batch form) at n_planes in {4, 6, 8}.

recall@k = |approx top-k intersect exact top-k| / k over all queries.
cand_frac = candidate rows scored per query / corpus — the cost that
buys the recall (at 100 TB: n_probe/K of the index read per IVF probe,
one ~N/2^planes bucket for LSH).

Run: python tools/ann_recall_bench.py [sf_dir] [k]
Prints one JSON line; curve + chosen defaults recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IVF_SWEEP = [(16, (1, 2, 4)), (45, (1, 2, 4)), (64, (1, 2, 4))]
# (n_planes, n_tables): single-table plane sweep + the multi-table
# fix for its measured recall ceiling (L independent tables decay the
# miss probability to miss^L for ~L x candidate cost)
LSH_SWEEP = ((4, 1), (6, 1), (8, 1), (8, 2), (8, 4))


def _clustered_corpus(spark, n=2000, dims=64, n_centers=20, sigma=0.3):
    """Deterministic clustered vectors: center[c][d] and noise derived
    from fixed-seed numpy (tool-side only — no engine code path)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    centers = rng.normal(0.0, 1.0, size=(n_centers, dims))
    cid = rng.integers(0, n_centers, size=n)
    vecs = centers[cid] + rng.normal(0.0, sigma, size=(n, dims))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype="int64"),
         "embedding": [[float(x) for x in row] for row in vecs]}
    )
    return spark.createDataFrame(
        pdf, "vec_id long, embedding array<double>"
    )


def sweep(spark, corpus, k, d):
    """Full IVF + LSH recall sweep over one corpus; returns the result
    dict. ``d`` is a scratch dir for the lake source + index tables."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from qwery_spark.lake.merge import append_changes, compact
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.operators.annindex import (
        build_ann_index,
        index_batch_topk,
        index_topk,
    )
    from qwery_spark.operators.kmeans import kmeans_fit
    from qwery_spark.operators.similarity import dot, lsh_bucket

    corpus = corpus.persist()
    n_corpus = corpus.count()
    queries = corpus.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    ).persist()
    n_queries = queries.count()

    v, q = F.col("embedding"), F.col("qvec")
    cos = dot(v, q) / (F.sqrt(dot(v, v)) * F.sqrt(dot(q, q)))
    w = Window.partitionBy("qid").orderBy(F.col("_cos").desc(), F.col("vec_id"))
    truth = (
        corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cos.alias("_cos"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("qid", "vec_id")
        .persist()
    )
    truth.count()

    def recall_of(approx_df):
        hits = approx_df.select("qid", "vec_id").join(
            truth, ["qid", "vec_id"], "inner"
        ).count()
        return round(hits / (n_queries * k), 4)

    res = {"n_corpus": n_corpus, "n_queries": n_queries,
           "ivf": [], "lsh": [], "point_eq_batch": None}

    src = LakeTable.create(
        d + "/src",
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]),
        n_buckets=8, key_col="vec_id", write_mode="mor",
    )
    append_changes(
        spark, src,
        corpus.select("vec_id", "embedding", F.lit("U").alias("op"),
                      F.col("vec_id").alias("ordinal")),
    )
    default = None  # (idx, cents) at K~sqrt(N) for the point==batch check
    for K, probes in IVF_SWEEP:
        cents, _ = kmeans_fit(corpus, k=K, iters=3)
        idx = build_ann_index(spark, src, d + f"/idx{K}", cents, n_buckets=8)
        compact(spark, idx, sort_cols=["cell"])
        if K == 45:
            default = (idx, cents)
        cell_sizes = dict(idx.read(spark).groupBy("cell").count().collect())
        for n_probe in probes:
            t0 = time.monotonic()
            out_df = index_batch_topk(
                spark, idx, cents, queries, k=k, n_probe=n_probe,
                query_id_col="qid", query_emb_col="qvec", exclude_self=True,
            ).persist()
            rec = recall_of(out_df)
            wall = round(time.monotonic() - t0, 2)
            out_df.unpersist()
            res["ivf"].append({
                "K": len(cents), "n_probe": n_probe, "recall": rec,
                "cand_frac": round(
                    _mean_cand_frac(queries, cents, n_probe, cell_sizes,
                                    n_corpus), 4),
                "batch_sec": wall,
            })

    # point probe == batch probe, row for row, at the default config
    idx, cents = default
    batch = index_batch_topk(
        spark, idx, cents, queries, k=k, n_probe=2,
        query_id_col="qid", query_emb_col="qvec", exclude_self=True,
    )
    bt = {(r["qid"], r["vec_id"]) for r in batch.collect()}
    eq = True
    for r in queries.orderBy("qid").limit(8).collect():
        pt = {(r["qid"], x["vec_id"]) for x in index_topk(
            spark, idx, cents, list(r["qvec"]), k=k, n_probe=2,
            exclude_key=r["qid"]).collect()}
        if pt != {p for p in bt if p[0] == r["qid"]}:
            eq = False
    res["point_eq_batch"] = eq

    for n_planes, n_tab in LSH_SWEEP:
        bkt = corpus
        for t in range(n_tab):
            bkt = bkt.withColumn(
                f"_b{t}",
                lsh_bucket(F.col("embedding"), n_planes, 64, table=t),
            )
        qb = bkt.filter(F.col("vec_id") % 20 == 0).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
            *[F.col(f"_b{t}").alias(f"_q{t}") for t in range(n_tab)],
        )
        t0 = time.monotonic()
        hit = F.col("_b0") == F.col("_q0")
        for t in range(1, n_tab):
            hit = hit | (F.col(f"_b{t}") == F.col(f"_q{t}"))
        cand = bkt.join(F.broadcast(qb), hit).filter(
            F.col("vec_id") != F.col("qid")
        )
        out_df = (
            cand.select("qid", "vec_id", cos.alias("_cos"))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .select("qid", "vec_id")
            .persist()
        )
        rec = recall_of(out_df)
        n_cand = cand.count()
        wall = round(time.monotonic() - t0, 2)
        out_df.unpersist()
        res["lsh"].append({
            "n_planes": n_planes, "n_tables": n_tab, "recall": rec,
            "cand_frac": round(n_cand / (n_queries * n_corpus), 4),
            "batch_sec": wall,
        })
    truth.unpersist()
    queries.unpersist()
    corpus.unpersist()
    return res


def _mean_cand_frac(queries, cents, n_probe, cell_sizes, n_corpus):
    """Average over queries of (sum of its n_probe nearest cells'
    sizes) / corpus — the exact candidate volume the batch probe joins.
    Driver-side: K<=64 centroid distances per query over a <=5%
    query sample."""
    rows = queries.collect()
    total = 0
    for r in rows:
        qv = r["qvec"]
        d2 = [sum((a - b) * (a - b) for a, b in zip(qv, c)) for c in cents]
        probe = sorted(range(len(cents)), key=lambda i: (d2[i], i))[:n_probe]
        total += sum(cell_sizes.get(c, 0) for c in probe)
    return total / (len(rows) * n_corpus)


def main():
    from pyspark.sql import functions as F

    from qwery_spark.operators.similarity import as_double
    from qwery_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    spark = get_spark("ann-recall-bench", cpus=8, shuffle_partitions=8)
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    out = {"k": k, "sf_dir": sf_dir}
    for tag, corpus in (
        ("sf", spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            F.col("vec_id").cast("long").alias("vec_id"),
            as_double(F.col("embedding")).alias("embedding"))),
        ("clustered", _clustered_corpus(spark)),
    ):
        d = tempfile.mkdtemp(prefix=f"annrecall_{tag}_", dir=base)
        try:
            out[tag] = sweep(spark, corpus, k, d)
        finally:
            shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
