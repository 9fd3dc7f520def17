"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k (exhaustive, exact). Scale path:
random-hyperplane LSH bucketing — candidates come from one bucket, a
corpus/2^n_planes fraction. Hyperplanes are md5-derived constants
(engine-portable; the DuckDB oracle recomputes the identical planes),
precomputed driver-side and injected as literal arrays so the per-row
cost is n_planes vectorized dot products in the JVM.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NPLANES = 8


def dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def cosine(a, b):
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def plane_weights(
    n_planes: int, dims: int, table: int = 0
) -> list[list[float]]:
    """Deterministic +1/-1 hyperplanes from md5 bits (plane p, dim d).
    ``table`` selects an INDEPENDENT plane set for multi-table LSH
    (table 0 keeps the original derivation so every existing bucket,
    index, and SQL oracle is unchanged)."""
    def seed(p, d):
        return f"{p}-{d}" if table == 0 else f"t{table}:{p}-{d}"

    return [
        [
            1.0 if int(hashlib.md5(seed(p, d).encode()).hexdigest()[0], 16) >= 8
            else -1.0
            for d in range(dims)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket(emb_col, n_planes: int = DEFAULT_NPLANES, dims: int = 64,
               table: int = 0):
    """Column expr: LSH signature int — bit p = (emb . plane_p) > 0."""
    weights = plane_weights(n_planes, dims, table)
    out = None
    for p in range(n_planes):
        plane = F.array(*[F.lit(w) for w in weights[p]])
        bit = F.when(dot(emb_col, plane) > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2**p)
        out = bit if out is None else out + bit
    return out.cast("bigint")


def cosine_topk(
    embeddings: DataFrame, query_vec: list[float] | None, k: int,
    id_col: str = "vec_id", emb_col: str = "embedding",
    query_df: DataFrame | None = None,
) -> DataFrame:
    """Exhaustive cosine top-k vs a broadcast query vector (or a 1-row
    query_df with column 'qvec'). TakeOrderedAndProject — per-partition
    heap + driver merge, no global sort at any scale."""
    if query_df is None:
        spark = embeddings.sparkSession
        query_df = spark.createDataFrame([(query_vec,)], f"qvec array<double>")
    df = embeddings.crossJoin(F.broadcast(query_df))
    cos = cosine(as_double(F.col(emb_col)), as_double(F.col("qvec")))
    return (
        df.select(id_col, cos.alias("_cos"))
        .orderBy(F.col("_cos").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("_cos", 6).alias("cosine"))
    )


def lsh_topk(
    embeddings: DataFrame, query_id, k: int,
    id_col: str = "vec_id", emb_col: str = "embedding",
    n_planes: int = DEFAULT_NPLANES, dims: int = 64,
    n_tables: int = 1,
) -> DataFrame:
    """ANN top-k: exact cosine only within the query's LSH bucket(s).

    The probe is resolved DRIVER-side (one pushdown-filtered scan finds
    the query row's bucket + vector, injected back as literals), so the
    corpus branch evaluates the n_planes hyperplane dot products exactly
    once per row — the old crossJoin shape computed the bucket on BOTH
    branches (round-2 verdict #5; the suite path was already fixed,
    this aligns the reusable operator with the audited plan).

    ``n_tables`` > 1 is standard multi-table LSH: L independent plane
    sets, candidates = rows sharing the query's bucket in ANY table
    (one scan, an OR of L equalities — each row hashed once per table,
    never duplicated). Measured (tools/ann_recall_bench.py, clustered
    corpus): single-table 8-plane LSH reaches 0.30 recall@10 at 1.6%
    candidates; L=2 tables 0.57 at 3.4%, L=4 tables 0.81 at 5.2% —
    union cost grows ~linearly in L while the miss probability decays
    as miss^L, and L=4 beats ANY single-table plane count at equal or
    lower cost (best single-table: 0.58 at 8.7%). IVF still wins for
    top-k search (0.93 at 7%); multi-table is the no-training,
    insert-only fallback."""
    bkt = embeddings.withColumn(
        "_b0", lsh_bucket(as_double(F.col(emb_col)), n_planes, dims)
    )
    for t in range(1, n_tables):
        bkt = bkt.withColumn(
            f"_b{t}",
            lsh_bucket(as_double(F.col(emb_col)), n_planes, dims, table=t),
        )
    qrows = bkt.filter(F.col(id_col) == query_id).limit(1).collect()
    if not qrows:
        # unknown probe id: empty top-k, same schema (the old crossJoin
        # shape degraded to empty too — keep that contract)
        return (
            embeddings.select(id_col, F.lit(0.0).alias("cosine"))
            .limit(0)
        )
    qrow = qrows[0]
    match = F.col("_b0") == int(qrow["_b0"])
    for t in range(1, n_tables):
        match = match | (F.col(f"_b{t}") == int(qrow[f"_b{t}"]))
    qd = F.array(*[F.lit(float(x)) for x in qrow[emb_col]])
    ed = as_double(F.col(emb_col))
    cos = dot(ed, qd) / (F.sqrt(dot(ed, ed)) * F.sqrt(dot(qd, qd)))
    return (
        bkt.filter(match & (F.col(id_col) != query_id))
        .select(id_col, cos.alias("_cos"))
        .orderBy(F.col("_cos").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("_cos", 6).alias("cosine"))
    )
