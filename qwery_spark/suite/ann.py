"""Similarity search over the `embeddings` table (vec_id, embedding
array<float> 64-dim, label).

Baseline: brute-force cosine top-k — oracle-checked exactly (identical
fold order in both engines makes the doubles bit-comparable before
rounding). Scale path: LSH sign-bucketing via deterministic md5-derived
hyperplanes — same buckets computable in SQL, so even the ANN index is
oracle-checked. Plus simhash over embeddings and per-label stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from qwery_spark.operators.similarity import (
    as_double as _as_double,
    dot as _dot,
    lsh_bucket,
    lsh_topk as _lsh_topk_op,
)
from qwery_spark.suite import load, register

_TOPK = 10
_QUERY_VEC_ID = 0
_NPLANES = 8


def _with_query(spark, sf_dir) -> DataFrame:
    """Embeddings cross-joined with the (1-row, broadcast) query vector —
    the standard 'broadcast the probe' ANN pattern."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )
    return e.crossJoin(F.broadcast(q))


_COSINE_SQL_EXPR = """
      list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(q.qvec, x -> CAST(x AS DOUBLE)))
      / (sqrt(list_dot_product(list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                               list_transform(e.embedding, x -> CAST(x AS DOUBLE))))
         * sqrt(list_dot_product(list_transform(q.qvec, x -> CAST(x AS DOUBLE)),
                                 list_transform(q.qvec, x -> CAST(x AS DOUBLE)))))
"""


@register(
    "ann_cosine_topk",
    f"""
    WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = {_QUERY_VEC_ID})
    SELECT vec_id, label, round({_COSINE_SQL_EXPR}, 6) AS cosine
    FROM embeddings e CROSS JOIN q
    WHERE vec_id <> {_QUERY_VEC_ID}
    ORDER BY {_COSINE_SQL_EXPR} DESC, vec_id
    LIMIT {_TOPK}
    """,
    doc="Brute-force cosine top-k: broadcast 1-row query, vectorized "
    "zip_with dot product, TakeOrderedAndProject for the top-k (no "
    "global sort). The exhaustive baseline every ANN variant is "
    "verified against.",
)
def ann_cosine_topk(spark, sf_dir):
    df = _with_query(spark, sf_dir).filter(F.col("vec_id") != _QUERY_VEC_ID)
    e = _as_double(F.col("embedding"))
    q = _as_double(F.col("qvec"))
    cos = _dot(e, q) / (F.sqrt(_dot(e, e)) * F.sqrt(_dot(q, q)))
    return (
        df.select("vec_id", "label", cos.alias("_cos"))
        .orderBy(F.col("_cos").desc(), F.col("vec_id"))
        .limit(_TOPK)
        .select("vec_id", "label", F.round("_cos", 6).alias("cosine"))
    )


# LSH hyperplanes: md5-derived constants, precomputed driver-side and
# injected as literal arrays (see operators.similarity.plane_weights —
# the SQL oracle recomputes the identical planes in-engine).
_lsh_bits = lsh_bucket


_LSH_SQL_BUCKET = f"""
      list_sum(list_transform(range(0, {_NPLANES}), p ->
        CASE WHEN list_dot_product(
               list_transform(emb, x -> CAST(x AS DOUBLE)),
               list_transform(range(0, len(emb)), d ->
                 CASE WHEN substr(md5(concat(CAST(p AS VARCHAR), '-', CAST(d AS VARCHAR))), 1, 1) >= '8'
                      THEN 1.0 ELSE -1.0 END)) > 0
             THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END))
"""


@register(
    "ann_lsh_buckets",
    f"""
    SELECT bucket, count(*) AS n_vectors, min(vec_id) AS min_vec_id
    FROM (
      SELECT vec_id, CAST({_LSH_SQL_BUCKET} AS BIGINT) AS bucket
      FROM (SELECT vec_id, embedding AS emb FROM embeddings) e
    ) b
    GROUP BY bucket
    """,
    doc="Random-hyperplane LSH bucketing (the ANN scale path: candidate "
    "search touches one bucket, not the corpus). Hyperplanes derived "
    "from md5 bits => identical buckets in Spark and the SQL oracle.",
)
def ann_lsh_buckets(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    emb = _as_double(F.col("embedding"))
    return (
        e.select("vec_id", _lsh_bits(emb, _NPLANES).cast("bigint").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id"))
    )


@register(
    "ann_lsh_topk",
    f"""
    WITH bkt AS (
      SELECT vec_id, label, embedding, {_LSH_SQL_BUCKET} AS bucket
      FROM (SELECT vec_id, label, embedding, embedding AS emb FROM embeddings) e
    ),
    q AS (SELECT embedding AS qvec, bucket AS qbucket FROM bkt WHERE vec_id = {_QUERY_VEC_ID})
    SELECT vec_id, round({_COSINE_SQL_EXPR}, 6) AS cosine
    FROM bkt e CROSS JOIN q
    WHERE e.bucket = q.qbucket AND e.vec_id <> {_QUERY_VEC_ID}
    ORDER BY {_COSINE_SQL_EXPR} DESC, vec_id
    LIMIT {_TOPK}
    """,
    doc="LSH-pruned top-k: exact cosine only within the query's bucket — "
    "corpus/2^nplanes candidates instead of all. The approximate scale "
    "path verified against ann_cosine_topk's exhaustive baseline.",
)
def ann_lsh_topk(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    emb = _as_double(F.col("embedding"))
    bkt = e.select("vec_id", "embedding", _lsh_bits(emb, _NPLANES).alias("bucket"))
    # probe resolved DRIVER-side: one pushdown-filtered scan computes the
    # query's bucket for the matching row only. The corpus branch then
    # evaluates the 8 hyperplane dot products exactly once per row —
    # round-1 plan audit flagged the old crossJoin shape for computing
    # buckets on BOTH branches.
    qrow = bkt.filter(F.col("vec_id") == _QUERY_VEC_ID).collect()[0]
    qbucket = int(qrow["bucket"])
    # literal doubles == cast(float32 AS DOUBLE): cosine fold order stays
    # bit-identical to the DuckDB oracle
    qd = F.array(*[F.lit(float(x)) for x in qrow["embedding"]])
    ed = _as_double(F.col("embedding"))
    cos = _dot(ed, qd) / (F.sqrt(_dot(ed, ed)) * F.sqrt(_dot(qd, qd)))
    return (
        bkt.filter((F.col("bucket") == qbucket) & (F.col("vec_id") != _QUERY_VEC_ID))
        .select("vec_id", cos.alias("_cos"))
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(_TOPK)
        .select("vec_id", F.round("_cos", 6).alias("cosine"))
    )


@register(
    "embedding_label_stats",
    """
    SELECT label, count(*) AS n,
           round(avg(sqrt(list_dot_product(
             list_transform(embedding, x -> CAST(x AS DOUBLE)),
             list_transform(embedding, x -> CAST(x AS DOUBLE))))), 6) AS avg_norm
    FROM embeddings GROUP BY label
    """,
    doc="Per-label embedding statistics (norm distribution) — sanity agg "
    "for embedding pipelines.",
)
def embedding_label_stats(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    emb = _as_double(F.col("embedding"))
    return e.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.sqrt(_dot(emb, emb))), 6).alias("avg_norm"),
    )


# ---- IVF (inverted-file) ANN: coarse quantize to the nearest of K
# deterministic centroids (the embeddings of vec_id 0..K-1 — no RNG),
# search only the query's cell. The second ANN scale path next to LSH.
_IVF_K = 8

_IVF_CELL_SQL = f"""
      SELECT vec_id, label, embedding, cent_id AS cell
      FROM (
        SELECT e.vec_id, e.label, e.embedding, c.vec_id AS cent_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY list_dot_product(
                   list_transform(e.embedding, x -> CAST(x AS DOUBLE) ),
                   list_transform(e.embedding, x -> CAST(x AS DOUBLE)))
                   - 2 * list_dot_product(
                     list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
                     list_transform(c.embedding, x -> CAST(x AS DOUBLE)))
                   + list_dot_product(
                     list_transform(c.embedding, x -> CAST(x AS DOUBLE)),
                     list_transform(c.embedding, x -> CAST(x AS DOUBLE))),
                   c.vec_id
               ) AS rn
        FROM embeddings e CROSS JOIN
             (SELECT vec_id, embedding FROM embeddings WHERE vec_id < {_IVF_K}) c
      ) e
      WHERE rn = 1
"""


@register(
    "ann_ivf_cells",
    f"""
    SELECT cell, count(*) AS n_vectors, min(vec_id) AS min_vec_id
    FROM ({_IVF_CELL_SQL}) t GROUP BY cell
    """,
    doc="IVF coarse quantization: nearest-centroid cell per vector "
    "(centroids broadcast; argmin via min-over-struct, deterministic "
    "ties by centroid id). At scale: cells are the partition key, "
    "probes touch one cell.",
)
def ann_ivf_cells(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
    )
    ed = _as_double(F.col("embedding"))
    cd = _as_double(F.col("cent"))
    dist = _dot(ed, ed) - 2 * _dot(ed, cd) + _dot(cd, cd)
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", F.struct(dist.alias("d"), F.col("cent_id")).alias("dc"))
        .groupBy("vec_id")
        .agg(F.min("dc").alias("best"))
        .select("vec_id", F.col("best.cent_id").alias("cell"))
    )
    return assigned.groupBy("cell").agg(
        F.count("*").alias("n_vectors"), F.min("vec_id").alias("min_vec_id")
    )


@register(
    "ann_ivf_topk",
    f"""
    WITH cells AS ({_IVF_CELL_SQL}),
    q AS (SELECT embedding AS qvec, cell AS qcell FROM cells WHERE vec_id = {_QUERY_VEC_ID})
    SELECT vec_id, round({_COSINE_SQL_EXPR}, 6) AS cosine
    FROM cells e CROSS JOIN q
    WHERE e.cell = q.qcell AND e.vec_id <> {_QUERY_VEC_ID}
    ORDER BY {_COSINE_SQL_EXPR} DESC, vec_id
    LIMIT {_TOPK}
    """,
    doc="IVF-pruned top-k: exact cosine within the query's cell only — "
    "the probe reads corpus/K, verified against the exhaustive baseline.",
)
def ann_ivf_topk(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent")
    )
    ed = _as_double(F.col("embedding"))
    cd = _as_double(F.col("cent"))
    dist = _dot(ed, ed) - 2 * _dot(ed, cd) + _dot(cd, cd)
    cells = (
        e.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "label", "embedding",
            F.struct(dist.alias("d"), F.col("cent_id")).alias("dc"),
        )
        .groupBy("vec_id")
        .agg(
            F.min("dc").alias("best"),
            F.first("label").alias("label"),
            F.first("embedding").alias("embedding"),
        )
        .select("vec_id", "label", "embedding", F.col("best.cent_id").alias("cell"))
    )
    q = cells.filter(F.col("vec_id") == _QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec"), F.col("cell").alias("qcell")
    )
    df = cells.crossJoin(F.broadcast(q)).filter(
        (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != _QUERY_VEC_ID)
    )
    qd = _as_double(F.col("qvec"))
    ed2 = _as_double(F.col("embedding"))
    cos = _dot(ed2, qd) / (F.sqrt(_dot(ed2, ed2)) * F.sqrt(_dot(qd, qd)))
    return (
        df.select("vec_id", cos.alias("_cos"))
        .orderBy(F.col("_cos").desc(), "vec_id")
        .limit(_TOPK)
        .select("vec_id", F.round("_cos", 6).alias("cosine"))
    )


@register(
    "dedup_embedding_cosine_pairs",
    f"""
    WITH bkt AS (
      SELECT vec_id, embedding, CAST({_LSH_SQL_BUCKET} AS BIGINT) AS bucket
      FROM (SELECT vec_id, embedding, embedding AS emb FROM embeddings) e
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(
             list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                              list_transform(b.embedding, x -> CAST(x AS DOUBLE)))
             / (sqrt(list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                                      list_transform(a.embedding, x -> CAST(x AS DOUBLE))))
                * sqrt(list_dot_product(list_transform(b.embedding, x -> CAST(x AS DOUBLE)),
                                        list_transform(b.embedding, x -> CAST(x AS DOUBLE))))), 6
           ) AS cosine
    FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                           list_transform(b.embedding, x -> CAST(x AS DOUBLE)))
          / (sqrt(list_dot_product(list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
                                   list_transform(a.embedding, x -> CAST(x AS DOUBLE))))
             * sqrt(list_dot_product(list_transform(b.embedding, x -> CAST(x AS DOUBLE)),
                                     list_transform(b.embedding, x -> CAST(x AS DOUBLE))))) > 0.15
    """,
    doc="Embedding-cosine near-dup pairs: candidates ONLY within an LSH "
    "bucket (bucket-join, never O(n^2)), exact cosine verification above "
    "a threshold — the embedding-space dedup modality.",
)
def dedup_embedding_cosine_pairs(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    emb = _as_double(F.col("embedding"))
    bkt = e.select("vec_id", "embedding", _lsh_bits(emb, _NPLANES).cast("bigint").alias("bucket"))
    a, b = bkt.alias("a"), bkt.alias("b")
    ea = _as_double(F.col("a.embedding"))
    eb = _as_double(F.col("b.embedding"))
    cos = _dot(ea, eb) / (F.sqrt(_dot(ea, ea)) * F.sqrt(_dot(eb, eb)))
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            cos.alias("_cos"),
        )
        .filter(F.col("_cos") > 0.15)
        .select("vec_a", "vec_b", F.round("_cos", 6).alias("cosine"))
    )


@register(
    "dedup_clusters",
    None,  # real SQL assigned right below (it embeds the pairs SQL)
    doc="Near-duplicate CLUSTER formation: LSH/cosine candidate pairs -> "
    "connected components via distributed min-label propagation "
    "(operators/graph.py; one shuffle per round, diameter-bounded "
    "rounds) -> per-cluster summary. Oracle: DuckDB recursive CTE over "
    "the identical pair set — even the iterative graph stage is "
    "value-checked cross-engine.",
)
def dedup_clusters(spark, sf_dir):
    from qwery_spark.operators.graph import connected_components

    pairs = dedup_embedding_cosine_pairs(spark, sf_dir)
    cc = connected_components(pairs, src="vec_a", dst="vec_b")
    return cc.groupBy(F.col("component").cast("bigint").alias("cluster_id")).agg(
        F.count("*").alias("n_members"),
        F.min("node").cast("bigint").alias("min_member"),
        F.max("node").cast("bigint").alias("max_member"),
    )


from qwery_spark.suite import REGISTRY as _REG  # noqa: E402

_REG["dedup_clusters"].sql = f"""
    WITH RECURSIVE pairs AS ({_REG["dedup_embedding_cosine_pairs"].sql}),
    edges AS (
      SELECT vec_a AS a, vec_b AS b FROM pairs
      UNION ALL
      SELECT vec_b, vec_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    walk(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.a, w.label FROM edges e JOIN walk w ON w.node = e.b
    )
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           count(*) AS n_members,
           CAST(min(node) AS BIGINT) AS min_member,
           CAST(max(node) AS BIGINT) AS max_member
    FROM (SELECT node, min(label) AS cluster_id FROM walk GROUP BY node) c
    GROUP BY cluster_id
"""


# ---- trained-kmeans IVF, now WITH a DuckDB oracle ----
# Cross-engine float-mean fold order diverges at ~1e-12, so raw Lloyd's
# centroids can't match. Fix (r2 verdict #4): quantize each updated mean
# to 6 decimals at every iteration boundary with floor(x*1e6 + 0.5)/1e6
# — the same IEEE op sequence in BOTH engines, so the fitted centroids
# are bit-identical and the whole trained-quantizer query becomes
# value-checkable. The oracle unrolls the 2 Lloyd iterations in SQL.
_KM_DIMS = 64
_KM_ROUND = "floor({x} * 1000000 + 0.5) / 1000000"


def _km_sqdist(e: str, c: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {_KM_DIMS + 1}), "
        f"i -> ({e}[i] - {c}[i]) * ({e}[i] - {c}[i])))"
    )


def _km_assign(cents: str) -> str:
    """Argmin assignment of every vector to its nearest centroid, ties
    toward the lower cell id (matches operators/kmeans.assign_cells)."""
    return f"""
      SELECT vec_id, emb, cid AS cell FROM (
        SELECT e.vec_id, e.emb, c.cid,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 {_km_sqdist("e.emb", "c.cent")}, c.cid) AS rn
        FROM e CROSS JOIN {cents} c) t
      WHERE rn = 1
    """


_KM_MEANS = (
    "["
    + ", ".join(
        _KM_ROUND.format(x=f"avg(emb[{d}])") for d in range(1, _KM_DIMS + 1)
    )
    + "]"
)

_KM_COS = (
    "list_dot_product(af.emb, q.qemb) / (sqrt(list_dot_product(af.emb, af.emb))"
    " * sqrt(list_dot_product(q.qemb, q.qemb)))"
)

_KM_SQL = f"""
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    c0 AS (SELECT vec_id AS cid, emb AS cent FROM e WHERE vec_id < {_IVF_K}),
    a1 AS ({_km_assign("c0")}),
    m1 AS (SELECT cell, {_KM_MEANS} AS cent FROM a1 GROUP BY cell),
    c1 AS (SELECT c0.cid, COALESCE(m1.cent, c0.cent) AS cent
           FROM c0 LEFT JOIN m1 ON m1.cell = c0.cid),
    a2 AS ({_km_assign("c1")}),
    m2 AS (SELECT cell, {_KM_MEANS} AS cent FROM a2 GROUP BY cell),
    c2 AS (SELECT c1.cid, COALESCE(m2.cent, c1.cent) AS cent
           FROM c1 LEFT JOIN m2 ON m2.cell = c1.cid),
    af AS ({_km_assign("c2")}),
    q AS (SELECT emb AS qemb FROM e WHERE vec_id = {_QUERY_VEC_ID}),
    probe AS (SELECT cid FROM c2 CROSS JOIN
                (SELECT emb AS qemb FROM e WHERE vec_id = {_QUERY_VEC_ID}) qq
              ORDER BY {_km_sqdist("qq.qemb", "c2.cent")}, cid LIMIT 2)
    SELECT af.vec_id, round({_KM_COS}, 6) AS cosine
    FROM af JOIN probe ON af.cell = probe.cid CROSS JOIN q
    WHERE af.vec_id <> {_QUERY_VEC_ID}
    ORDER BY {_KM_COS} DESC, af.vec_id
    LIMIT {_TOPK}
"""


@register(
    "ann_ivf_kmeans_topk",
    _KM_SQL,
    doc="IVF with a REAL trained coarse quantizer: 2 Lloyd's iterations "
    "(operators/kmeans.py — centroids are driver literals, assignment "
    "is a shuffle-free codegen'd map, one k-row shuffle per iteration), "
    "then n_probe=2 cell search. Oracle: the SAME fit unrolled in "
    "DuckDB SQL — per-iteration mean quantization (round_to=6 via a "
    "bit-identical floor formula) makes the trained centroids equal "
    "across engines, so even the ITERATIVE training loop is "
    "value-checked (pytest still covers monotone distortion and "
    "n_probe=ALL ≡ brute-force recall).",
)
def ann_ivf_kmeans_topk(spark, sf_dir):
    from qwery_spark.operators.kmeans import ivf_topk, kmeans_fit

    e = load(spark, sf_dir, "embeddings")
    cents, _ = kmeans_fit(e, k=_IVF_K, iters=2, round_to=6)
    qvec = [
        float(x)
        for x in e.filter(F.col("vec_id") == _QUERY_VEC_ID).collect()[0]["embedding"]
    ]
    return ivf_topk(
        e.filter(F.col("vec_id") != _QUERY_VEC_ID), cents, qvec, k=_TOPK, n_probe=2
    )


def _warn_quant_boundary(df, pre_floor_arrays, name: str) -> None:
    """Same diagnosability contract as kmeans_fit(round_to): the md5
    value check quantizes lanes with floor(y) where y = x*scale + 0.5;
    the inputs differ ~1e-12 between Spark and DuckDB (sum fold order),
    so a lane sitting essentially ON an integer boundary can floor
    differently and fail the whole md5. Warn when any lane is within
    1e-9 of a boundary so an oracle mismatch reads as a known
    quantization-boundary flake, not a correctness bug. One bounded
    short-circuit job (limit(1)) — diagnostic only, not in bench."""
    near = F.lit(False)
    for arr in pre_floor_arrays:
        near = near | F.exists(
            arr, lambda y: F.abs(y - F.floor(y + F.lit(0.5))) < F.lit(1e-9)
        )
    if df.filter(near).limit(1).count():
        import warnings

        warnings.warn(
            f"{name}: a lane sits on a floor() quantization boundary; a "
            "cross-engine md5 mismatch here is likely a 1-ulp fold-order "
            "flake, not an engine bug",
            stacklevel=3,
        )



@register(
    "emb_quantize_int8",
    """
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    m AS (SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS ma FROM e)
    SELECT vec_id,
           CAST(floor(127.0 / ma * 1e6 + 0.5) AS BIGINT) AS scale_micro,
           md5(array_to_string(list_transform(v,
               x -> CAST(least(greatest(floor(x * (127.0 / ma) + 0.5), -127),
                               127) AS INTEGER)), ',')) AS q_md5
    FROM m WHERE ma > 0
    """,
    doc="Symmetric int8 quantization (operators/embedding.quantize_int8):"
    " per-vector scale + every quantized lane value-checked via md5 of "
    "the int arrays — cross-engine-deterministic half-up floor form, "
    "map-only, zero shuffle.",
)
def emb_quantize_int8(spark, sf_dir):
    from qwery_spark.operators.embedding import quantize_int8

    e = load(spark, sf_dir, "embeddings")
    q = quantize_int8(e).filter(F.col("scale").isNotNull())
    _warn_quant_boundary(
        q,
        [
            F.transform(
                F.transform("embedding", lambda x: x.cast("double")),
                lambda x: x * F.col("scale") + F.lit(0.5),
            ),
            F.array(F.col("scale") * F.lit(1e6) + F.lit(0.5)),
        ],
        "emb_quantize_int8",
    )
    return q.select(
        "vec_id",
        F.floor(F.col("scale") * 1e6 + 0.5).cast("bigint").alias("scale_micro"),
        F.md5(F.array_join(F.transform("q", lambda x: x.cast("string")), ","))
        .alias("q_md5"),
    )


@register(
    "emb_l2_normalize",
    """
    WITH e AS (SELECT vec_id,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    n AS (SELECT vec_id, v,
                 sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)
    SELECT vec_id,
           CAST(floor(nrm * 1e6 + 0.5) AS BIGINT) AS norm_micro,
           md5(array_to_string(list_transform(v,
               x -> CAST(floor(x / nrm * 1e6 + 0.5) AS BIGINT)), ',')) AS unit_md5
    FROM n WHERE nrm > 0
    """,
    doc="L2 normalization (operators/embedding.l2_normalize): per-vector "
    "norm + every normalized lane micro-quantized to integers and "
    "value-checked via md5 (no float formatting in the hash).",
)
def emb_l2_normalize(spark, sf_dir):
    from qwery_spark.operators.embedding import l2_normalize

    e = load(spark, sf_dir, "embeddings")
    n = l2_normalize(e).filter(F.col("norm") > 0)
    _warn_quant_boundary(
        n,
        [
            F.transform("unit", lambda x: x * F.lit(1e6) + F.lit(0.5)),
            F.array(F.col("norm") * F.lit(1e6) + F.lit(0.5)),
        ],
        "emb_l2_normalize",
    )
    return n.select(
        "vec_id",
        F.floor(F.col("norm") * 1e6 + 0.5).cast("bigint").alias("norm_micro"),
        F.md5(
            F.array_join(
                F.transform(
                    "unit",
                    lambda x: F.floor(x * 1e6 + 0.5).cast("bigint").cast("string"),
                ),
                ",",
            )
        ).alias("unit_md5"),
    )


# ---- persisted incremental IVF index (operators/annindex.py) ----
# Same deterministic 2-epoch lifecycle as the signature index, over
# embeddings: epoch 1 adds vectors, REVERSES some embeddings (a
# deterministic "drift" both engines can express — the new vector
# usually lands in a different cell), deletes others. The index is
# maintained purely from the change feed; the oracle reassigns the
# FINAL corpus to the same build-time-fixed centroids from scratch.
_ANN_IDX_SQL = f"""
    WITH base AS (SELECT vec_id,
                         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
                         CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 2))
                              AS INTEGER) AS h2
                  FROM embeddings),
    e AS (SELECT vec_id,
                 CASE WHEN h2 % 4 <> 0 AND h2 % 5 = 1
                      THEN list_reverse(emb) ELSE emb END AS emb
          FROM base WHERE NOT (h2 % 4 <> 0 AND h2 % 5 = 2)),
    c0 AS (SELECT vec_id AS cid, emb AS cent FROM base WHERE vec_id < {_IVF_K}),
    af AS ({_km_assign("c0")}),
    q AS (SELECT emb AS qemb FROM base WHERE vec_id = {_QUERY_VEC_ID}),
    probe AS (SELECT cid FROM c0 CROSS JOIN
                (SELECT emb AS qemb FROM base WHERE vec_id = {_QUERY_VEC_ID}) qq
              ORDER BY {_km_sqdist("qq.qemb", "c0.cent")}, cid LIMIT 2)
    SELECT af.vec_id, round({_KM_COS}, 6) AS cosine
    FROM af JOIN probe ON af.cell = probe.cid CROSS JOIN q
    WHERE af.vec_id <> {_QUERY_VEC_ID}
    ORDER BY {_KM_COS} DESC, af.vec_id
    LIMIT {_TOPK}
"""



def _annidx_base(spark, sf_dir):
    h2 = F.conv(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    return load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"),
        _as_double(F.col("embedding")).alias("emb"),
        h2.alias("h2"),
    )


def _annidx_lifecycle(spark, base, centroids, d):
    """The shared 2-epoch index lifecycle: seed, build, adds + drift +
    deletes as one window, incremental update, sorted compaction.
    Returns the maintained index."""
    from pyspark.sql import types as T

    from qwery_spark.lake.merge import append_changes, compact
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.operators.annindex import build_ann_index, update_ann_index

    src = LakeTable.create(
        d + "/src",
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]),
        n_buckets=8, key_col="vec_id", write_mode="mor",
    )
    ep0 = base.filter(F.col("h2") % 4 != 0).select(
        "vec_id", F.col("emb").alias("embedding"),
        F.lit("U").alias("op"), F.col("vec_id").alias("ordinal"),
    )
    append_changes(spark, src, ep0)
    v1 = src.current_version()
    idx = build_ann_index(spark, src, d + "/idx", centroids)
    adds = base.filter(F.col("h2") % 4 == 0).select(
        "vec_id", F.col("emb").alias("embedding"),
        F.lit("U").alias("op"),
        (F.col("vec_id") + 1_000_000).alias("ordinal"),
    )
    drifts = base.filter(
        (F.col("h2") % 4 != 0) & (F.col("h2") % 5 == 1)
    ).select(
        "vec_id", F.reverse(F.col("emb")).alias("embedding"),
        F.lit("U").alias("op"),
        (F.col("vec_id") + 2_000_000).alias("ordinal"),
    )
    dels = base.filter(
        (F.col("h2") % 4 != 0) & (F.col("h2") % 5 == 2)
    ).select(
        "vec_id",
        F.lit(None).cast("array<double>").alias("embedding"),
        F.lit("D").alias("op"),
        (F.col("vec_id") + 3_000_000).alias("ordinal"),
    )
    append_changes(spark, src, adds.unionAll(drifts).unionAll(dels))
    update_ann_index(spark, src, idx, centroids, from_version=v1)
    # cluster the index by cell: probe reads then skip unprobed cells'
    # files entirely
    compact(spark, idx, sort_cols=["cell"])
    return idx


@register(
    "ann_index_incremental_topk",
    _ANN_IDX_SQL,
    doc="Persisted incremental IVF index (operators/annindex.py — the "
    "vector analogue of the MinHash signature index): built once from "
    "the lake source's live vectors against fixed centroids, then "
    "maintained from ONE change-feed window (adds assign, embedding "
    "drift re-assigns — usually crossing cells, deletes tombstone), "
    "compacted sorted-by-cell so the probe's col_ranges hint skips "
    "unprobed cells' files, then searched with an n_probe=2 exact-"
    "cosine probe READ FROM THE INDEX. The oracle reassigns the final "
    "corpus from scratch in DuckDB — value equality proves the "
    "incremental maintenance exact (stale cells, lost drift, or "
    "resurrected deletes would all change the top-k). At 100 TB the "
    "daily increment costs |changed vectors| map-side assignments and "
    "a probe reads a few cell-clustered files.",
)
def ann_index_incremental_topk(spark, sf_dir):
    import hashlib
    import os
    import shutil
    import tempfile

    from qwery_spark.operators.annindex import index_topk

    base = _annidx_base(spark, sf_dir)
    fixed = base.filter(F.col("vec_id") < _IVF_K).orderBy("vec_id").collect()
    centroids = [list(r["emb"]) for r in fixed]
    # _QUERY_VEC_ID < _IVF_K: the query vector is already in the
    # collected centroid rows — a second filter+collect would scan the
    # derivation again for a row we hold (guide §1.2)
    qvec = next(
        list(r["emb"]) for r in fixed if r["vec_id"] == _QUERY_VEC_ID
    )

    tag = hashlib.md5(f"{sf_dir}|annidx".encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"qwery_annidx_{tag}")
    d = tempfile.mkdtemp(prefix="qwery_annidx_tbl_")
    try:
        idx = _annidx_lifecycle(spark, base, centroids, d)
        index_topk(
            spark, idx, centroids, qvec, k=_TOPK, n_probe=2,
            exclude_key=_QUERY_VEC_ID,
        ).write.mode("overwrite").parquet(out_dir)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.read.parquet(out_dir)


@register(
    "ann_index_batch_topk",
    f"""
    WITH base AS (SELECT vec_id,
                         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
                         CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 2))
                              AS INTEGER) AS h2
                  FROM embeddings),
    e AS (SELECT vec_id,
                 CASE WHEN h2 % 4 <> 0 AND h2 % 5 = 1
                      THEN list_reverse(emb) ELSE emb END AS emb
          FROM base WHERE NOT (h2 % 4 <> 0 AND h2 % 5 = 2)),
    c0 AS (SELECT vec_id AS cid, emb AS cent FROM base WHERE vec_id < {_IVF_K}),
    af AS ({_km_assign("c0")}),
    qs AS (SELECT vec_id AS query_id, emb AS qemb FROM base
           WHERE vec_id % 37 = 1),
    pr AS (SELECT query_id, cid FROM (
             SELECT q.query_id, c.cid,
                    row_number() OVER (PARTITION BY q.query_id ORDER BY
                      {_km_sqdist("q.qemb", "c.cent")}, c.cid) AS rn
             FROM qs q CROSS JOIN c0 c) t
           WHERE rn <= 2),
    cand AS (SELECT q.query_id, af.vec_id, {_KM_COS} AS cos
             FROM af JOIN pr ON af.cell = pr.cid
                     JOIN qs q ON q.query_id = pr.query_id
             WHERE af.vec_id <> q.query_id)
    SELECT CAST(query_id AS BIGINT) AS query_id, vec_id,
           round(cos, 6) AS cosine
    FROM (SELECT query_id, vec_id, cos,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY cos DESC, vec_id) AS rn
          FROM cand) t
    WHERE rn <= 5
    """,
    doc="Batch IVF probe against the persisted incremental index "
    "(operators/annindex.index_batch_topk): every query vector of a "
    "reference set (vec_id % 37 = 1, ~14 queries) gets its top-5 in "
    "ONE pass over the index — per-query probe cells from a "
    "literal-centroid argsort (no shuffle), probe set broadcast into "
    "one join, per-query window for the cut. The curation shape at "
    "100 TB: M point probes would rescan the index M times; this "
    "touches it once with candidate volume M x probed-cell size. Same "
    "maintained-index lifecycle as ann_index_incremental_topk; the "
    "oracle recomputes assignment + per-query ranking from scratch.",
)
def ann_index_batch_topk(spark, sf_dir):
    import hashlib
    import os
    import shutil
    import tempfile

    from qwery_spark.operators.annindex import index_batch_topk

    base = _annidx_base(spark, sf_dir)
    fixed = base.filter(F.col("vec_id") < _IVF_K).orderBy("vec_id").collect()
    centroids = [list(r["emb"]) for r in fixed]
    queries = base.filter(F.col("vec_id") % 37 == 1).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qvec")
    )

    tag = hashlib.md5(f"{sf_dir}|annidx_batch".encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"qwery_annidxb_{tag}")
    d = tempfile.mkdtemp(prefix="qwery_annidxb_tbl_")
    try:
        idx = _annidx_lifecycle(spark, base, centroids, d)
        index_batch_topk(
            spark, idx, centroids, queries, k=5, n_probe=2,
            exclude_self=True,
        ).write.mode("overwrite").parquet(out_dir)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.read.parquet(out_dir)


def _lsh_sql_bucket_t(table: int) -> str:
    """The _LSH_SQL_BUCKET macro for multi-table LSH: table 0 is the
    original derivation (seed 'p-d'); table t>0 seeds 't{t}:p-d' —
    byte-identical to operators.similarity.plane_weights(table=t)."""
    seed = (
        "concat(CAST(p AS VARCHAR), '-', CAST(d AS VARCHAR))"
        if table == 0
        else f"concat('t{table}:', CAST(p AS VARCHAR), '-', CAST(d AS VARCHAR))"
    )
    return f"""
      list_sum(list_transform(range(0, {_NPLANES}), p ->
        CASE WHEN list_dot_product(
               list_transform(emb, x -> CAST(x AS DOUBLE)),
               list_transform(range(0, len(emb)), d ->
                 CASE WHEN substr(md5({seed}), 1, 1) >= '8'
                      THEN 1.0 ELSE -1.0 END)) > 0
             THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END))
"""


@register(
    "ann_lsh_multi_topk",
    f"""
    WITH bkt AS (
      SELECT vec_id, embedding,
             {_lsh_sql_bucket_t(0)} AS b0,
             {_lsh_sql_bucket_t(1)} AS b1
      FROM (SELECT vec_id, embedding, embedding AS emb FROM embeddings) e
    ),
    q AS (SELECT embedding AS qvec, b0 AS q0, b1 AS q1
          FROM bkt WHERE vec_id = {_QUERY_VEC_ID})
    SELECT vec_id, round({_COSINE_SQL_EXPR}, 6) AS cosine
    FROM bkt e CROSS JOIN q
    WHERE (e.b0 = q.q0 OR e.b1 = q.q1) AND e.vec_id <> {_QUERY_VEC_ID}
    ORDER BY {_COSINE_SQL_EXPR} DESC, vec_id
    LIMIT {_TOPK}
    """,
    doc="Multi-table LSH top-k (round 6): TWO independent md5-derived "
    "plane sets, candidates = rows sharing the query's bucket in "
    "EITHER table — one scan, each row hashed once per table, an OR of "
    "bucket equalities, no duplicates by construction. Motivated by "
    "the measured recall curve (tools/ann_recall_bench.py): "
    "single-table LSH misses with probability miss^1; L tables decay "
    "it to miss^L for ~L x candidate cost. Operator: "
    "similarity.lsh_topk(n_tables=2); oracle recomputes both plane "
    "sets in SQL.",
)
def ann_lsh_multi_topk(spark, sf_dir):
    from qwery_spark.operators.similarity import lsh_topk

    e = load(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("vec_id"), "embedding"
    )
    return lsh_topk(
        e, _QUERY_VEC_ID, _TOPK, n_planes=_NPLANES, dims=64, n_tables=2
    )
