"""Persisted IVF (inverted-file) ANN index over an embedding lake
table, maintained incrementally from the change feed — the vector
analogue of the MinHash signature index (operators/sigindex.py).

The index is itself a MOR lake table keyed like the source, one row per
live vector: ``(key, cell int, embedding array<double>)`` where
``cell`` = argmin-distance centroid id (ties → lower id, the same
deterministic rule as operators/kmeans.assign_cells). Centroids are
FIXED at build time (caller-supplied — trained via kmeans_fit or any
deterministic rule) and broadcast as plan literals: assignment is a
pure map, no join, no shuffle.

Maintenance is one change-feed window → one index commit:
inserted/updated vectors re-assign (ONLY those — the corpus is never
rescanned; an embedding update that crosses a cell boundary just
upserts the new cell under LWW), deleted vectors become tombstones at
the deleting ordinal. Window-keyed epochs (both ends — out-of-order
overlapping windows must not no-op, see sigindex) make replays
commit-level no-ops.

Search (`index_topk`) probes the ``n_probe`` cells nearest the query
and runs exact cosine inside them only — candidates ≈ corpus/K ×
n_probe read from durable parquet, no recomputation. The index table
declares ``stats_cols=["cell"]`` so a `compact(sort_cols=["cell"])`
clusters cells into files and the probe's ``col_ranges`` hint skips
the files of every unprobed cell — at 100 TB a probe reads a few
files, not the index.

100-TB shape: build = one map over the corpus + the bucketed index
write; the daily increment costs |changed vectors| assignments; a
probe reads cell-pruned files. Reference anchor: beyond the reference
(no vector surface there); the IVF design is standard (inverted file
from coarse quantization) restated on the lake's feed.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from qwery_spark.lake.table import LakeTable
from qwery_spark.operators.kmeans import assign_cells
from qwery_spark.operators.similarity import as_double, dot


@dataclass
class AnnIndexUpdateStats:
    vectors_reassigned: int = 0
    vectors_deleted: int = 0
    from_version: int = 0
    to_version: int = 0
    snapshot_version: int | None = None


def _index_schema(key: str, key_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField(key, key_type),
            T.StructField("cell", T.IntegerType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )


def _assigned(df: DataFrame, key: str, emb_col: str,
              centroids: list[list[float]]) -> DataFrame:
    return assign_cells(df, centroids, emb_col).select(
        F.col(f"`{key}`"),
        F.col("cell").cast("int").alias("cell"),
        as_double(F.col(f"`{emb_col}`")).alias("embedding"),
        F.col("ordinal"),
    )


def build_ann_index(
    spark: SparkSession,
    src: LakeTable,
    index_path: str,
    centroids: list[list[float]],
    emb_col: str = "embedding",
    n_buckets: int = 8,
    at_version: int | None = None,
) -> LakeTable:
    """Full build: assign the source's live vectors once (map-only,
    PINNED to the snapshot whose version keys the build epoch — a
    concurrent writer must not slip newer data under an older key),
    write the index as a MOR lake table keyed like the source. Each
    index row carries the source row's last_ordinal so later
    incremental windows slot into the same LWW order. A crashed-and-
    replayed build adopts the existing table (reuse-or-create) and its
    version-keyed epoch no-ops the duplicate append."""
    from qwery_spark.lake.merge import append_changes
    from qwery_spark.operators.materialize import _reuse_or_create

    # pin to at_version when given — a follower builds at its resume
    # point so later windows don't double-apply
    snap = src.snapshot(at_version)
    key = snap.m["key_col"]
    key_type = snap.spark_schema()[key].dataType
    idx = _reuse_or_create(
        index_path, _index_schema(key, key_type), n_buckets=n_buckets,
        key_col=key, write_mode="mor", stats_cols=["cell"],
    )
    live = src.read_physical(
        spark, snapshot_version=snap.version
    ).filter(~F.col("_deleted")).select(
        key, emb_col, F.col("last_ordinal").alias("ordinal")
    )
    batch = _assigned(live, key, emb_col, centroids).select(
        F.col(f"`{key}`"), "cell", "embedding",
        F.lit("U").alias("op"), F.col("ordinal"),
    )
    append_changes(spark, idx, batch, epoch_id=f"annidx:build:{snap.version}")
    return idx


def update_ann_index(
    spark: SparkSession,
    src: LakeTable,
    index: LakeTable,
    centroids: list[list[float]],
    from_version: int,
    to_version: int | None = None,
    emb_col: str = "embedding",
    feed: DataFrame | None = None,
) -> AnnIndexUpdateStats:
    """One source change-feed window becomes one index commit: changed
    vectors re-assign against the SAME fixed centroids (only those —
    the corpus is never rescanned), deletes tombstone at the deleting
    ordinal. Idempotent per window via the (from,to)-keyed epoch;
    out-of-order overlapping windows converge via LWW ordinals.

    Pass ``feed`` (a caller-persisted changelog for the same range —
    preimage rows, if present, are filtered out) to share one endpoint
    diff between several view maintainers."""
    from qwery_spark.lake.changes import read_changes
    from qwery_spark.lake.merge import append_changes

    to_version = src.current_version() if to_version is None else to_version
    stats = AnnIndexUpdateStats(from_version=from_version,
                                to_version=to_version)
    if to_version <= from_version:
        return stats
    key = src.snapshot().m["key_col"]
    own_feed = feed is None
    if own_feed:
        feed = read_changes(
            spark, src, from_version, to_version, granular=False
        ).persist()
    try:
        ups = feed.filter(
            F.col("_change_type").isin("insert", "update_postimage")
        ).select(key, emb_col, F.col("_ordinal").alias("ordinal"))
        dels = feed.filter(F.col("_change_type") == "delete").select(
            key, F.col("_ordinal").alias("ordinal")
        )
        stats.vectors_reassigned = ups.count()
        stats.vectors_deleted = dels.count()
        batches = []
        if stats.vectors_reassigned:
            batches.append(
                _assigned(ups, key, emb_col, centroids).select(
                    F.col(f"`{key}`"), "cell", "embedding",
                    F.lit("U").alias("op"), F.col("ordinal"),
                )
            )
        if stats.vectors_deleted:
            batches.append(
                dels.select(
                    F.col(f"`{key}`"),
                    F.lit(None).cast("int").alias("cell"),
                    F.lit(None).cast("array<double>").alias("embedding"),
                    F.lit("D").alias("op"),
                    F.col("ordinal"),
                )
            )
        if batches:
            b = batches[0]
            for extra in batches[1:]:
                b = b.unionByName(extra)
            r = append_changes(
                spark, index, b,
                epoch_id=f"annidx:{from_version}:{to_version}",
            )
            stats.snapshot_version = r.snapshot_version
        return stats
    finally:
        if own_feed:
            feed.unpersist()


def index_topk(
    spark: SparkSession,
    index: LakeTable,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 1,
    exclude_key=None,
) -> DataFrame:
    """IVF probe against the PERSISTED index: pick the ``n_probe``
    cells nearest the query driver-side (K centroid distances — pure
    Python), read only those cells' rows (files skipped via the
    index's `cell` column stats after a sorted compaction), exact
    cosine inside. Returns (key, cosine) top-k.

    Defaults measured (tools/ann_recall_bench.py, BASELINE.md round-6):
    with K≈√N cells, n_probe=2 reaches 0.93 recall@10 scanning ~7% of
    a clustered corpus; n_probe=4 is the ≥0.99-recall setting (~2×
    candidates). On an isotropic corpus no parameter choice helps —
    that's the data, not the index."""
    import math

    d2 = [
        sum((a - b) * (a - b) for a, b in zip(query_vec, c))
        for c in centroids
    ]
    probe = sorted(range(len(centroids)), key=lambda i: (d2[i], i))[:n_probe]
    key = index.snapshot().m["key_col"]
    # one POINT col_ranges read per probed cell, unioned: centroid ids
    # carry no spatial order, so the nearest cells are routinely far
    # apart in id space and a single (min,max) hull would keep the
    # files of every cell in between — per-cell reads keep the file
    # pruning tight at any n_probe. Each part filters to EXACTLY its
    # cell (col_ranges is a file-level hint, so a multi-cell file's
    # rows would otherwise appear in several parts and duplicate
    # candidates in the top-k)
    parts = [
        index.read(spark, col_ranges={"cell": (c, c)}).filter(
            F.col("cell") == c
        )
        for c in probe
    ]
    rows = parts[0]
    for p in parts[1:]:
        rows = rows.unionByName(p)
    if exclude_key is not None:
        rows = rows.filter(F.col(f"`{key}`") != exclude_key)
    qn = math.sqrt(sum(x * x for x in query_vec))
    qd = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col("embedding")
    cos = dot(v, qd) / (F.sqrt(dot(v, v)) * F.lit(qn))
    return (
        rows.select(key, cos.alias("_cos"))
        .orderBy(F.col("_cos").desc(), F.col(f"`{key}`"))
        .limit(k)
        .select(key, F.round("_cos", 6).alias("cosine"))
    )


def index_batch_topk(
    spark: SparkSession,
    index: LakeTable,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 1,
    query_id_col: str = "query_id",
    query_emb_col: str = "qvec",
    exclude_self: bool = False,
) -> DataFrame:
    """Batch IVF probe: top-k neighbours for EVERY query vector in one
    pass over the index — the curation shape (score a whole reference
    set against the corpus) where M point probes would re-scan the
    index M times. Each query maps to its ``n_probe`` nearest cells
    (literal-centroid argsort, no shuffle), the probe set broadcasts
    into one join against the index, and a per-query window takes the
    top-k — candidate volume is bounded by M × probed-cell size, never
    M × corpus. ``exclude_self`` drops hits whose index key equals the
    query id (self-match when probing the corpus against itself).

    The query id is carried under an internal name through the join, so
    ``query_id_col`` may equal the index key column (the corpus-vs-
    itself case, queries = index.read(...)); the output then names the
    query column ``query_<key>`` to keep the two roles distinct."""
    from pyspark.sql import Window

    from qwery_spark.operators.kmeans import _sq_dist

    key = index.snapshot().m["key_col"]
    out_qid = query_id_col if query_id_col != key else f"query_{key}"
    qv = as_double(F.col(f"`{query_emb_col}`"))
    ranked = F.sort_array(
        F.array(*[
            F.struct(_sq_dist(qv, c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(centroids)
        ])
    )
    probes = queries.select(
        F.col(f"`{query_id_col}`").alias("_qid"),
        qv.alias("_q"),
        F.explode(
            F.transform(
                F.slice(ranked, 1, n_probe), lambda s: s["i"].cast("int")
            )
        ).alias("cell"),
    )
    cand = index.read(spark).join(F.broadcast(probes), "cell")
    if exclude_self:
        cand = cand.filter(F.col(f"`{key}`") != F.col("_qid"))
    v = F.col("embedding")
    cos = dot(v, F.col("_q")) / (
        F.sqrt(dot(v, v)) * F.sqrt(dot(F.col("_q"), F.col("_q")))
    )
    w = Window.partitionBy(F.col("_qid")).orderBy(
        F.col("_cos").desc(), F.col(f"`{key}`")
    )
    return (
        cand.select("_qid", f"`{key}`", cos.alias("_cos"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col("_qid").alias(out_qid), f"`{key}`",
            F.round("_cos", 6).alias("cosine"),
        )
    )
