"""Distributed connected components (near-duplicate cluster formation).

The dedup pipeline's final stage: LSH/cosine candidate PAIRS become
duplicate CLUSTERS (choose one survivor per cluster). Implemented as
min-label propagation — every node takes the smallest node id reachable
from it:

    label(v) <- min(label(v), min over neighbors' labels); repeat.

Each iteration is one shuffle (join + partial-agg'd groupBy min); the
loop converges in graph-diameter iterations. Near-dup graphs are
diameter-bounded (clusters are small cliques/chains), so 3-6 rounds
suffice in practice; ``max_iter`` caps adversarial chains. At true
web-graph scale the O(log n) alternating large-star/small-star
algorithm replaces the loop body — same (node, label) contract.

No reference analogue (the reference has no graph ops at all); this
serves the training-data dedup brief. DuckDB oracle: the equivalent
recursive CTE (see suite/ann.py dedup_clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
    strict: bool = True,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min
    node id in the connected component. Edges are treated undirected.

    If the propagation is still changing labels after ``max_iter``
    rounds (component diameter > max_iter), the labels are WRONG — with
    strict=True (default) that raises RuntimeError instead of silently
    returning a partial result; strict=False downgrades to a warning
    (for exploratory runs that tolerate over-segmented clusters)."""
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = fwd.union(fwd.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym.persist()
    labels = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    )
    labels.persist()
    final_cached = None  # the winner stays cached only until returned
    converged = False
    try:
        for _ in range(max_iter):
            nbr = (
                sym.alias("e")
                .join(labels.alias("l"), F.col("e.b") == F.col("l.node"))
                .groupBy(F.col("e.a").alias("node"))
                .agg(F.min("l.label").alias("nlabel"))
            )
            new = (
                labels.alias("o")
                .join(nbr.alias("n"), "node", "left")
                .select(
                    F.col("node"),
                    F.least(
                        F.col("o.label"), F.coalesce(F.col("n.nlabel"), F.col("o.label"))
                    ).alias("label"),
                )
            )
            new.persist()
            changed = (
                new.alias("n")
                .join(labels.alias("o"), "node")
                .filter(F.col("n.label") < F.col("o.label"))
                .count()
            )
            labels.unpersist()
            labels = new
            if changed == 0:
                converged = True
                break
        if not converged:
            msg = (
                f"connected_components did not converge in {max_iter} "
                "iterations (component diameter exceeds the cap); labels "
                "would be over-segmented. Raise max_iter, or use the "
                "large-star/small-star variant for high-diameter graphs."
            )
            if strict:
                labels.unpersist()  # the raise path must not leak the cache
                raise RuntimeError(msg)
            import warnings

            warnings.warn(msg, stacklevel=2)
        # hand back an uncached plan: checkpoint the converged labels so
        # the result survives unpersisting every loop intermediate (the
        # blocks free when the returned DataFrame is garbage-collected)
        final_cached = labels
        return labels.localCheckpoint(eager=True).select(
            "node", F.col("label").alias("component")
        )
    finally:
        sym.unpersist()
        if final_cached is not None:
            final_cached.unpersist()


def connected_components_star(
    edges: DataFrame, src: str = "a", dst: str = "b", max_iter: int = 30
) -> DataFrame:
    """(node, component) via alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the web-scale variant of :func:`connected_components`: converges in
    O(log n) rounds regardless of component DIAMETER, where min-label
    propagation needs diameter rounds (a 10^6-long chain takes ~20
    star rounds vs 10^6 label rounds).

      large-star(u): every neighbor v > u re-hangs onto
                     m = min(Γ(u) ∪ {u})
      small-star(u): every neighbor v < u (and u itself) hangs onto the
                     minimum small neighbor

    Each round is two groupBy+join passes over the edge set (partial-
    agg'd min — skew-safe); the edge set only shrinks toward the star
    fixed point (child → root edges). Convergence is detected by an
    order-insensitive signature (count + xxhash sum) of the edge set.
    """
    raw = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # every endpoint must receive a label — including nodes whose only
    # edge is a self-loop, which the u != v working set drops
    all_nodes = raw.select(F.col("u").alias("node")).union(
        raw.select(F.col("v").alias("node"))
    ).distinct()
    e = raw.filter(F.col("u") != F.col("v")).distinct()
    prev_sig = None
    for _ in range(max_iter):
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        # ---- large-star ----
        mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
        m = F.least(F.col("mv"), F.col("u"))
        e = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), m.alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star ----
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        toward_small = sym.filter(F.col("v") < F.col("u"))
        mins2 = toward_small.groupBy("u").agg(F.min("v").alias("mv"))
        re_hung = (
            toward_small.join(mins2, "u")
            .select(F.col("v").alias("u"), F.col("mv").alias("v"))
            .filter(F.col("u") != F.col("v"))
        )
        e = re_hung.union(mins2.select("u", F.col("mv").alias("v"))).distinct()

        # eager localCheckpoint TRUNCATES the lineage: each round's plan
        # references the previous round's e several times, so without the
        # cut the logical plan doubles per round and analysis blows up
        # around round ~10. Blocks free when the old e is GC'd.
        e = e.localCheckpoint(eager=True)
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            # decimal sum: a long sum of 64-bit hashes overflows ANSI
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components_star did not reach a fixed point in "
            f"{max_iter} rounds"
        )
    # fixed point: edges are (child, root). Roots label themselves, and
    # isolated/self-loop-only nodes fall back to their own id — min()
    # keeps the edge-derived label where one exists (component = cluster
    # min <= node id always).
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    selfs = all_nodes.withColumn("component", F.col("node"))
    return (
        labels.unionByName(selfs)
        .groupBy("node")
        .agg(F.min("component").alias("component"))
    )
