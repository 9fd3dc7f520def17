"""Distributed Lloyd's k-means over embedding columns — the IVF
coarse-quantizer trained for real (round-1 shipped first-K-vectors
centroids; fine for the oracle demo, not a real index).

Shape per iteration (the only shape that scales):
  * centroids live on the DRIVER (k x dims doubles — tiny) and are
    injected into the plan as literal arrays => assignment is a
    broadcast-free, shuffle-free map (argmin over k vectorized
    distances inside whole-stage codegen);
  * the mean recomputation is ONE partial-agg'd groupBy(cell) with
    per-dimension sums — k x dims numbers come back to the driver.
  Per iteration: one shuffle of k rows. Corpus is scanned, never
  collected.

Deterministic end to end: init = the k lowest-id vectors, argmin ties
break toward the lower cell id, empty cells keep their centroid — no
RNG anywhere, so runs (and tests) reproduce bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qwery_spark.operators.similarity import as_double


def _sq_dist(vec_col, centroid: list[float]):
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_col, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_cells(df: DataFrame, centroids: list[list[float]],
                 emb_col: str = "embedding") -> DataFrame:
    """df + `cell` = argmin_c squared-distance (ties -> lower cell id).
    Pure map: centroids are plan literals, no join, no shuffle."""
    v = as_double(F.col(emb_col))
    choices = F.array(*[
        F.struct(_sq_dist(v, c).alias("d"), F.lit(i).alias("i"))
        for i, c in enumerate(centroids)
    ])
    return df.withColumn("cell", F.array_min(choices)["i"])


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_to: int | None = None,
) -> tuple[list[list[float]], list[float]]:
    """Lloyd's iterations; returns (centroids, per-iteration distortion).

    distortion[i] = mean squared distance under the centroids BEFORE
    iteration i's update — monotone non-increasing by construction
    (each update is the cell-wise mean, the L2 minimizer).

    An empty corpus raises ValueError; a corpus with fewer than k rows
    trains with reduced k = n_rows (every vector its own centroid) and
    warns — callers indexing cells 0..k-1 should read len(centroids).

    ``round_to`` rounds each updated mean to that many decimals at every
    iteration boundary. This makes the fit CROSS-ENGINE reproducible:
    float sum fold order differs ~1e-12 between engines, so an oracle
    re-running the same Lloyd's updates (e.g. DuckDB, suite/ann.py's
    unrolled-iteration SQL) lands on identical centroids after the
    rounding — turning the trained-quantizer query oracle-checkable."""
    init_rows = df.orderBy(id_col).limit(k).select(emb_col).collect()
    if not init_rows:
        raise ValueError("kmeans_fit: input DataFrame has no rows")
    if len(init_rows) < k:
        import warnings

        warnings.warn(
            f"kmeans_fit: corpus has {len(init_rows)} rows < k={k}; "
            f"training with k={len(init_rows)}",
            stacklevel=2,
        )
    cents = [[float(x) for x in r[emb_col]] for r in init_rows]
    dims = len(cents[0])
    distortion: list[float] = []
    for _ in range(iters):
        assigned = assign_cells(df, cents, emb_col)
        v = as_double(F.col(emb_col))
        stats = (
            assigned.select(
                "cell",
                F.array_min(
                    F.array(*[
                        F.struct(_sq_dist(v, c).alias("d"), F.lit(i).alias("i"))
                        for i, c in enumerate(cents)
                    ])
                )["d"].alias("d"),
                *[F.element_at(v, d + 1).alias(f"x{d}") for d in range(dims)],
            )
            .groupBy("cell")
            .agg(
                F.count("*").alias("n"),
                F.sum("d").alias("dsum"),
                *[F.sum(f"x{d}").alias(f"s{d}") for d in range(dims)],
            )
            .collect()
        )
        total_n = sum(r["n"] for r in stats)
        distortion.append(sum(r["dsum"] for r in stats) / total_n)
        new = list(cents)  # empty cells keep their centroid
        for r in stats:
            means = [r[f"s{d}"] / r["n"] for d in range(dims)]
            if round_to is not None:
                # floor(x*10^p + 0.5)/10^p, NOT round(): Python rounds
                # half-even, DuckDB half-away — this formula is the same
                # IEEE op sequence in both engines (bit-identical given
                # identical inputs). The INPUTS differ ~1e-12 between
                # engines (sum fold order), so a mean landing essentially
                # ON a rounding boundary could still quantize differently
                # — warn when that razor's edge is hit (p ~ 1e-4 for a
                # whole fit) so a flaky oracle diff is diagnosable.
                import math

                p = 10.0**round_to
                for x in means:
                    if abs((x * p + 0.5) - round(x * p + 0.5)) < 1e-9:
                        import warnings

                        warnings.warn(
                            "kmeans_fit(round_to): a centroid mean sits on "
                            "a quantization boundary; cross-engine oracle "
                            "comparison may diverge for this fit",
                            stacklevel=2,
                        )
                means = [math.floor(x * p + 0.5) / p for x in means]
            new[r["cell"]] = means
        cents = new
    return cents, distortion


def ivf_topk(
    df: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """IVF search: probe the ``n_probe`` cells nearest the query, exact
    cosine inside them only (corpus/k * n_probe candidates)."""
    import math

    d2 = [
        sum((a - b) * (a - b) for a, b in zip(query_vec, c))
        for c in centroids
    ]
    probe = sorted(range(len(centroids)), key=lambda i: (d2[i], i))[:n_probe]
    qn = math.sqrt(sum(x * x for x in query_vec))
    qd = F.array(*[F.lit(float(x)) for x in query_vec])
    v = as_double(F.col(emb_col))
    dotqv = F.aggregate(
        F.zip_with(v, qd, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    dotvv = F.aggregate(
        F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    cos = dotqv / (F.sqrt(dotvv) * F.lit(qn))
    return (
        assign_cells(df, centroids, emb_col)
        .filter(F.col("cell").isin(probe))
        .select(id_col, cos.alias("_cos"))
        .orderBy(F.col("_cos").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.round("_cos", 6).alias("cosine"))
    )
