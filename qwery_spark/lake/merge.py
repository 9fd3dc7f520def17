"""Bucket-pruned copy-on-write MERGE (the engine's UPSERT KEYED ON).

Set-oriented restatement of qwery's row-at-a-time UPSERT
(reference: app/jvm/core/.../ops/sql/Upsert.scala:14-33 — INSERT, and on
duplicate-key error UPDATE ... KEYED ON, i.e. last writer in stream
order wins). Here a whole micro-batch is applied at once:

  MERGE INTO target t USING deduped_batch s ON t.doc_id = s.doc_id
    WHEN MATCHED AND s.ordinal > t.last_ordinal AND s.op='D'
         THEN tombstone
    WHEN MATCHED AND s.ordinal > t.last_ordinal THEN UPDATE payload
    WHEN NOT MATCHED THEN INSERT (or tombstone for a delete of an
         unseen key — keeps the cross-batch LWW guard airtight)

Scale properties:
  * the batch arrives deduped to ONE row per key (see cdc.dedup), so
    both join sides are key-unique — no skew possible in this join.
  * scan pruning: only the buckets the batch touches are read and
    rewritten; untouched buckets carry over by manifest reference.
    At 100 TB / 4096 buckets, a batch touching 1% of keyspace rewrites
    ~41 buckets, not the table.
  * stale events (ordinal <= last_ordinal) are dropped by the guard —
    cross-batch stragglers cannot clobber newer rows, and tombstones
    block resurrection after delete.
  * exactly-once: the commit is epoch-keyed; re-delivery of a batch
    after a crash-before-checkpoint is a metadata no-op.

On a real cluster this file collapses to an Iceberg
``MERGE INTO ... WHEN MATCHED AND s.ordinal > t.last_ordinal ...``
with storage-partitioned join removing the target-side shuffle.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qwery_spark.lake.table import DATA_DIR, LakeTable, Snapshot

ENGINE_COLS = ("last_ordinal", "_deleted")

# wall-clock of the LAST _stage_write, split into the Spark write job
# vs the driver-side footer-stats pass — a pure instrumentation hook
# (tools/lc_decompose.py reads it to attribute per-epoch driver time);
# no engine behavior depends on it
LAST_STAGE_TIMINGS: dict = {}


def observed_or(obs, fallback_df, exprs: list) -> dict:
    """Observation.get, falling back to a direct aggregation when the
    metrics row can't be materialized (Spark's toPyRow chokes on
    observations over empty writes). The fallback re-runs only a skinny
    agg and only on that rare empty-batch path."""
    try:
        return dict(obs.get)
    except Exception:
        return fallback_df.agg(*exprs).collect()[0].asDict()


@dataclass
class MergeStats:
    skipped: bool = False
    rows_upserted: int = 0
    rows_deleted: int = 0
    rows_stale: int = 0
    touched_buckets: int = 0
    snapshot_version: int | None = None
    snapshot_id: str | None = None
    summary: dict = field(default_factory=dict)


def _user_fields(snap: Snapshot) -> list[dict]:
    return [f for f in snap.fields() if f["name"] not in ENGINE_COLS]


def _align_batch(batch: DataFrame, snap: Snapshot, key: str):
    """Project a change batch onto the current user schema (null-fill
    newly added columns, cast widened ones) + derive the bucket."""
    ufields = _user_fields(snap)
    have = set(batch.columns)
    sel = [F.col(key), F.col("op"), F.col("ordinal").cast("bigint").alias("ordinal")]
    for f in ufields:
        if f["name"] == key:
            continue
        if f["name"] in have:
            sel.append(F.col(f"`{f['name']}`").cast(f["type"]).alias(f["name"]))
        else:
            sel.append(F.lit(None).cast(f["type"]).alias(f["name"]))
    return batch.select(*sel).withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(snap.n_buckets)).cast("int")
    )


def _stage_write(
    df: DataFrame,
    table: LakeTable,
    schema_version: int,
    n_partitions: int,
    max_records_per_file: int,
    repartition: bool = True,
    stats_col: str | None = None,
) -> list[dict]:
    """Write ``df`` (carrying _bucket) as bucket-partitioned parquet under
    a fresh staging dir; return manifest file entries. Pass
    repartition=False when df is already bucket-partitioned (avoids a
    second shuffle). With ``stats_col``, each entry also records that
    column's min/max (from the parquet footers — metadata only, no data
    read), enabling manifest-level file skipping on key predicates."""
    stage = f"snap-{uuid.uuid4().hex[:12]}"
    stage_dir = os.path.join(table.path, DATA_DIR, stage)
    snap = table.snapshot()  # one manifest read for codec + stats_cols
    if repartition:
        df = df.repartition(max(n_partitions, 1), "_bucket")
    writer = (
        df.write.option("maxRecordsPerFile", max_records_per_file)
        .option("compression", snap.codec)
    )
    # parquet-native bloom filters on the configured columns: written
    # by parquet-mr into each row group, used by the reader to skip
    # row groups on pushed equality predicates (the scattered-key
    # point-lookup case min/max stats can't prune). Every write path
    # funnels through here, so compaction/binpack regenerate them.
    for c in snap.m.get("bloom_filter_cols") or ():
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        ndv = snap.m.get("bloom_ndv")
        if ndv:
            writer = writer.option(
                f"parquet.bloom.filter.expected.ndv#{c}", str(ndv)
            )
    import time as _time

    _t0 = _time.monotonic()
    writer.partitionBy("_bucket").parquet(stage_dir)
    _t1 = _time.monotonic()
    new_files = []
    for bdir in os.listdir(stage_dir):
        if not bdir.startswith("_bucket="):
            continue
        b = int(bdir.split("=")[1])
        for fn in os.listdir(os.path.join(stage_dir, bdir)):
            if fn.endswith(".parquet"):
                new_files.append({
                    "path": os.path.join(DATA_DIR, stage, bdir, fn),
                    "bucket": b,
                    "schema_version": schema_version,
                })
    # key bounds + the table's stats_cols payload bounds (Iceberg column
    # bounds) in ONE footer open per file — THREADED: these opens are
    # driver-side serial metadata IO on the commit path of every epoch
    # (64-bucket commit = 64 opens); on separate-executor-JVM clusters
    # this serial driver tail is exactly the per-epoch term the
    # local-cluster scaling rung exposes, so amortize it across a small
    # pool (pyarrow releases the GIL during footer reads). On a real
    # cluster these stats ride the write tasks' commit messages instead.
    want = ([stats_col] if stats_col else []) + snap.stats_cols
    if want and new_files:
        from concurrent.futures import ThreadPoolExecutor

        def _stat(entry):
            fstats = _footer_stats(os.path.join(table.path, entry["path"]), want)
            if stats_col is not None and stats_col in fstats:
                entry["key_min"], entry["key_max"] = fstats[stats_col]
            elif stats_col is not None and fstats.get(f"__all_null__{stats_col}"):
                # the file carries ONLY null keys (possible when the
                # sub-bucket split isolates them): null keys emit no
                # change rows, so pruning may skip this file entirely
                entry["key_all_null"] = True
            if "__num_rows" in fstats:
                entry["rows"] = fstats["__num_rows"]
            cstats = {
                c: list(fstats[c]) for c in snap.stats_cols if c in fstats
            }
            if cstats:
                entry["col_stats"] = cstats

        with ThreadPoolExecutor(max_workers=min(16, len(new_files))) as pool:
            list(pool.map(_stat, new_files))
    LAST_STAGE_TIMINGS.update(
        write_sec=_t1 - _t0, footer_sec=_time.monotonic() - _t1
    )
    return new_files


def _footer_min_max(path: str, col: str):
    """(min, max) of one column from the parquet footer (None when not
    skippable). Thin wrapper over _footer_stats."""
    return _footer_stats(path, [col]).get(col)


def _footer_stats(path: str, cols: list[str]) -> dict:
    """{col: (min, max)} for every requested top-level column, from ONE
    parquet-footer open (metadata only, no data read). A column missing
    from the result simply isn't skippable — any row group without
    statistics, or a stat type that doesn't serialize to JSON, drops
    that column (pruning stays conservative). This is the local
    stand-in for Iceberg's per-data-file column bounds, which write
    tasks report on a real cluster; here the driver reads footers of
    the files it just staged (O(files) metadata reads)."""
    out: dict = {}
    try:
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(path)
        name_to_idx = {
            pf.schema.column(i).path: i
            for i in range(pf.metadata.num_columns)
        }
        for col in cols:
            idx = name_to_idx.get(col)
            if idx is None:
                continue
            lo = hi = None
            ok = True
            for rg in range(pf.metadata.num_row_groups):
                meta_rg = pf.metadata.row_group(rg)
                st = meta_rg.column(idx).statistics
                if st is None:
                    ok = False
                    break
                if not st.has_min_max:
                    # min/max absent: a PROVABLY all-null row group
                    # (null count == row count) simply contributes no
                    # values — skip it; anything else is genuinely
                    # stat-less and voids the column
                    if st.has_null_count and st.null_count == meta_rg.num_rows:
                        continue
                    ok = False
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            if not ok:
                continue
            if lo is None:
                # every row group all-null: the file holds NO values of
                # this column — recorded so key pruning can skip the
                # file instead of conservatively voiding the whole hull
                # (null keys never join and emit no change rows)
                out[f"__all_null__{col}"] = True
                continue
            # manifest is JSON: only store plainly serializable types
            if not isinstance(lo, (str, int, float)) or isinstance(lo, bool):
                continue
            out[col] = (lo, hi)
        # row count rides the same footer open — the changelog's
        # key-set pruning gate (changes._diff_pruning) sizes windows
        # with it, zero extra IO
        out["__num_rows"] = pf.metadata.num_rows
    except Exception:
        pass  # stats are an optimization; never fail a write
    return out


def _subsplit_factor(
    spark: SparkSession, n_buckets: int, batch: DataFrame | None = None
) -> int:
    """How many key-derived sub-buckets to split each bucket into for
    the ONE append/dedup shuffle. The split key is a SECOND independent
    hash of the table key — pmod(xxhash64(seed, key), S) — so rows of
    one (bucket, key) still land in one task (the LWW groupBy needs
    that clustering).

    DEFAULT 1 — the split is a measured net loss. The widened arm
    (S = parallelism/buckets, capped 16) wins the isolated append's
    shuffle STAGE when a table has fewer buckets than the cluster has
    cores, but per-QUERY interleaved A/B at sf0.1 AND 10x scale
    (round 7, second pass) showed it loses query-wide at BOTH scales:
    S write tasks per bucket emit S delta files per bucket per epoch,
    and every later read of the table — MOR resolution, changelog
    endpoint diffs, compaction, the final view read — pays the S-fold
    file count back with interest (5-20% per lifecycle query). A
    stage-isolated win that a whole-query instrument reverses is guide
    §1.1's empirical-loop lesson. On a real cluster with hundreds of
    executors against a small-bucket table the trade can flip again —
    QWERY_SUBSPLIT=max restores the widened arm for that A/B
    (=aqe additionally lets AQE size the exchange from actual shuffle
    bytes; =0 pins 1 explicitly)."""
    mode = os.environ.get("QWERY_SUBSPLIT")  # A/B instrument
    if mode in ("max", "aqe"):
        par = spark.sparkContext.defaultParallelism
        return max(1, min(16, -(-par // max(n_buckets, 1))))
    return 1


def _layout_shuffle(
    spark: SparkSession,
    n_buckets: int,
    src: DataFrame,
    key: str,
    est_batch: DataFrame | None = None,
) -> DataFrame:
    """The ONE dedup+layout shuffle shared by append/merge/write paths:
    add the sub-bucket key and repartition on (_bucket, _sub). Default
    width = n_buckets (see _subsplit_factor); QWERY_SUBSPLIT=max widens
    to the parallelism cap, =aqe drops the explicit width so AQE's
    partition coalescing sizes the exchange from the ACTUAL shuffle
    bytes (advisoryPartitionSizeInBytes)."""
    sub_n = _subsplit_factor(spark, n_buckets, est_batch)
    src = src.withColumn(
        "_sub", F.pmod(F.xxhash64(F.lit(1), F.col(key)), F.lit(sub_n)).cast("int")
    )
    if sub_n > 1 and os.environ.get("QWERY_SUBSPLIT") == "aqe":
        return src.repartition("_bucket", "_sub")
    return src.repartition(n_buckets * sub_n, "_bucket", "_sub")


def append_changes(
    spark: SparkSession,
    table: LakeTable,
    batch: DataFrame,
    epoch_id: int | None = None,
    collect_stats: bool = True,
    max_records_per_file: int = 2_000_000,
) -> MergeStats:
    """Merge-on-read fast path: dedup the batch to per-key LWW winners
    and APPEND them (updates as full rows, deletes as tombstones) as new
    delta files — NO target read, NO join, write volume O(batch).
    Read-time resolution (LakeTable._resolve_lww) picks the max-ordinal
    row per key, so cross-batch stragglers and delete-resurrection are
    impossible by construction. compact() folds deltas back to one file
    per bucket.

    ``batch`` is the VALIDATED raw event batch (NOT pre-deduped): the
    whole pipeline — dedup + bucket layout — runs in ONE shuffle:
    repartition on _bucket, then groupBy(_bucket, key) max_by, whose
    clustering requirement the bucket partitioning already satisfies
    (same bucket => same partition => same (bucket,key) colocated), and
    partitionBy(_bucket) writes from already-bucket-local tasks.

    This is the Iceberg merge-on-read (equality-delete) shape — the only
    write mode whose per-batch cost stays flat across a 10^10-event run.
    """
    snap = table.snapshot()
    if epoch_id is not None and epoch_id in snap.applied_epochs:
        return MergeStats(skipped=True, snapshot_version=snap.version, snapshot_id=snap.snapshot_id)
    key = snap.m["key_col"]
    src = _align_batch(batch, snap, key)
    ufields = _user_fields(snap)
    payload = [f for f in ufields if f["name"] != key]

    # sub-bucket split (see _subsplit_factor/_layout_shuffle): the
    # shuffle/write width becomes n_buckets * S instead of n_buckets.
    # _sub is derived from the KEY (seeded second hash), so same-key
    # rows stay colocated and the groupBy below still reuses this one
    # exchange — grouping by (_bucket, _sub, key) equals grouping by
    # (_bucket, key) because both extra columns are functions of the key.
    pre = _layout_shuffle(spark, snap.n_buckets, src, key, src)
    additive = snap.additive_cols
    if additive:
        # aggregating-payload table: batch rows are DELTAS — the
        # in-batch reduction is SUM per key (not LWW), there are no
        # tombstones (a key dies when its summed count reaches <= 0 at
        # read time), and 'op' is ignored by construction
        winner = pre.groupBy("_bucket", "_sub", key).agg(
            *[F.sum(F.col(f"`{c}`")).cast("long").alias(c) for c in additive],
            F.max("ordinal").alias("last_ordinal"),
        )
        obs = None
        if collect_stats:
            from pyspark.sql import Observation

            obs = Observation()
            winner = winner.observe(
                obs,
                F.lit(0).alias("deleted"),
                F.count(F.lit(1)).alias("total"),
            )
        rows = winner.select(
            F.col(key),
            *[F.col(f"`{c}`") for c in additive],
            F.col("last_ordinal"),
            F.lit(False).alias("_deleted"),
            F.col("_bucket"),
        )
    else:
        winner = pre.groupBy("_bucket", "_sub", key).agg(
            F.max_by(
                F.struct(F.col("op"), *[F.col(f"`{f['name']}`") for f in payload]),
                F.col("ordinal"),
            ).alias("w"),
            F.max("ordinal").alias("last_ordinal"),
        )
        obs = None
        if collect_stats:
            from pyspark.sql import Observation

            # stats ride the write job (CollectMetrics) — no extra pass
            obs = Observation()
            winner = winner.observe(
                obs,
                F.sum(F.when(F.col("w.op") == "D", 1).otherwise(0)).alias("deleted"),
                F.count(F.lit(1)).alias("total"),
            )
        is_delete = F.col("w.op") == "D"
        rows = winner.select(
            F.col(key),
            *[
                F.when(is_delete, F.lit(None).cast(f["type"]))
                .otherwise(F.col(f"w.`{f['name']}`"))
                .alias(f["name"])
                for f in payload
            ],
            F.col("last_ordinal"),
            is_delete.alias("_deleted"),
            F.col("_bucket"),
        )
    new_files = _stage_write(
        rows, table, snap.schema_version, snap.n_buckets, max_records_per_file,
        repartition=False, stats_col=key,
    )
    touched = {f["bucket"] for f in new_files}

    stats = MergeStats(touched_buckets=len(touched))
    if obs is not None:
        vals = observed_or(
            obs,
            rows,
            [
                F.sum(F.when(F.col("_deleted"), 1).otherwise(0)).alias("deleted"),
                F.count(F.lit(1)).alias("total"),
            ],
        )
        stats.rows_deleted = int(vals["deleted"] or 0)
        stats.rows_upserted = int(vals["total"] or 0) - stats.rows_deleted

    newsnap = table.commit_rewrite(
        base=snap,
        new_files=new_files,
        replaced_buckets=set(),
        epoch_id=epoch_id,
        summary={
            "operation": "append-delta",
            "epoch_id": epoch_id,
            "touched_buckets": sorted(touched),
            "rows_upserted": stats.rows_upserted,
            "rows_deleted": stats.rows_deleted,
        },
        append_buckets=touched,
    )
    if newsnap is None:
        return MergeStats(skipped=True)
    stats.snapshot_version = newsnap.version
    stats.snapshot_id = newsnap.snapshot_id
    stats.summary = newsnap.m["summary"]
    return stats


# exact numeric base types for zorder validation — startswith('int')
# would also accept e.g. 'interval day to second'
_ZORDER_NUMERIC = {
    "int", "bigint", "smallint", "tinyint", "float", "double", "decimal"
}


def validate_zorder_cols(snap: Snapshot, cols: list, ctx: str) -> None:
    """Fail a z-order spec before any scan: every column must exist and
    have an exactly-numeric base type (the Morton rank code is built on
    width_bucket). Shared by compact() and the compaction policy so the
    two paths cannot drift."""
    types = {f["name"]: f["type"] for f in snap.fields()}
    bad = [
        c for c in cols
        if c not in types
        or types[c].split("(", 1)[0].strip() not in _ZORDER_NUMERIC
    ]
    if bad:
        raise ValueError(
            f"{ctx}: ZORDER BY needs numeric columns, got {bad} "
            f"(types: {[types.get(c) for c in bad]})"
        )


def compact(
    spark: SparkSession,
    table: LakeTable,
    buckets: set[int] | None = None,
    drop_tombstones: bool = False,
    max_records_per_file: int = 2_000_000,
    sort_cols: list[str] | None = None,
    zorder_cols: list[str] | None = None,
) -> dict:
    """Fold MOR delta files back into one resolved file per bucket
    (Iceberg rewrite_data_files analogue). With drop_tombstones=True,
    delete markers are vacuumed too — only safe once no straggler below
    the tombstone's ordinal can still arrive (retention watermark).

    ``sort_cols`` sorts rows WITHIN each bucket before writing (Iceberg
    sort-order rewrite): parquet row-group min/max stats then prune
    key-range predicates inside a bucket — at 100 TB a point lookup
    reads bucket-pruned files AND skips all but one row group. Sorting
    is per-partition (sortWithinPartitions after the bucket
    repartition), never a global sort.

    ``zorder_cols`` (mutually exclusive with sort_cols) sorts each
    bucket by the columns' Morton interleave instead (Delta OPTIMIZE
    ZORDER BY analogue, operators/zorder.py): every listed column's
    per-file bounds stay tight SIMULTANEOUSLY, so files(col_ranges=)
    prunes on any of them — a 1D sort only serves its leading column.

    Default scope: the unresolved (delta-bearing) buckets — EXCEPT when
    a sort/zorder is given, where the point is the whole table's
    clustering, so the default widens to every bucket (a user asking
    for a sort-order rewrite would otherwise silently get only the
    buckets that happened to carry deltas). Pass ``buckets`` to narrow."""
    if sort_cols and zorder_cols:
        raise ValueError("compact: sort_cols and zorder_cols are exclusive")
    snap = table.snapshot()
    if zorder_cols:
        validate_zorder_cols(snap, zorder_cols, "compact")
    if buckets is not None:
        target = buckets
    elif sort_cols or zorder_cols:
        target = set(range(snap.n_buckets))
    else:
        target = snap.unresolved_buckets or set(range(snap.n_buckets))
    if not target:
        return {"compacted_buckets": 0}
    key = snap.m["key_col"]
    df = table.read_physical(spark, buckets=target, resolve=True)
    if drop_tombstones:
        df = df.filter(~F.col("_deleted"))
    df = df.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(snap.n_buckets)).cast("int")
    )
    cached = None
    if zorder_cols:
        from qwery_spark.operators.zorder import column_bounds, zorder_col

        # the bounds aggregate and the write would otherwise each run
        # the full resolve-LWW scan — persist it across the two jobs
        cached = df = df.persist()
        bounds = column_bounds(df, zorder_cols)
        df = (
            df.withColumn("_z", zorder_col(bounds, zorder_cols))
            .repartition(max(len(target), 1), "_bucket")
            .sortWithinPartitions("_bucket", "_z")
            .drop("_z")  # projection preserves the within-partition order
        )
        repart = False
    elif sort_cols:
        df = df.repartition(max(len(target), 1), "_bucket").sortWithinPartitions(
            "_bucket", *sort_cols
        )
        repart = False
    else:
        repart = True
    try:
        new_files = _stage_write(
            df, table, snap.schema_version, len(target), max_records_per_file,
            repartition=repart, stats_col=key,
        )
    finally:
        if cached is not None:
            cached.unpersist()
    newsnap = table.commit_rewrite(
        base=snap,
        new_files=new_files,
        replaced_buckets=set(target),
        epoch_id=None,
        summary={
            "operation": "compact", "buckets": sorted(target),
            # recorded so CompactionPolicy.cluster_every_commits can
            # find the last clustering rewrite by scanning summaries
            **({"sort_cols": list(sort_cols)} if sort_cols else {}),
            **({"zorder_cols": list(zorder_cols)} if zorder_cols else {}),
        },
    )
    return {
        "compacted_buckets": len(target),
        "snapshot_version": newsnap.version if newsnap else None,
    }


def rebucket(
    spark: SparkSession,
    table: LakeTable,
    new_n_buckets: int,
    max_records_per_file: int = 2_000_000,
    sort_cols: list[str] | None = None,
) -> dict:
    """Partition-spec evolution (Iceberg analogue): rewrite the table
    with a different bucket count in ONE commit. At 10^10 events the
    bucket count chosen at creation stops fitting — buckets outgrow a
    task's memory, or thousands of buckets fragment a small table — and
    hash-bucketed layouts can't grow incrementally (every key moves), so
    this is a full rewrite by design: one shuffle on the NEW bucket id,
    cost O(table), amortized over the table's lifetime (run it like a
    major compaction, e.g. at 4x growth: 64 -> 256 -> 1024 -> 4096).

    Tombstones are preserved (the cross-batch straggler guard must
    survive the move), MOR deltas are resolved on the way through, and
    the bucket count stays per-snapshot state: time travel to an older
    version keeps routing by the old count, and the next merge reads
    the new count from its base snapshot automatically.
    """
    if new_n_buckets < 1:
        raise ValueError(f"new_n_buckets must be >= 1, got {new_n_buckets}")
    snap = table.snapshot()
    key = snap.m["key_col"]
    df = table.read_physical(spark, resolve=True).withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(new_n_buckets)).cast("int")
    )
    n_parts = max(min(new_n_buckets, 256), 1)
    df = df.repartition(n_parts, "_bucket")
    if sort_cols:
        df = df.sortWithinPartitions("_bucket", *sort_cols)
    new_files = _stage_write(
        df, table, snap.schema_version, n_parts, max_records_per_file,
        repartition=False, stats_col=key,
    )
    newsnap = table.commit_rewrite(
        base=snap,
        new_files=new_files,
        replaced_buckets=set(range(snap.n_buckets)),
        epoch_id=None,
        summary={
            "operation": "rebucket",
            "from_buckets": snap.n_buckets,
            "to_buckets": new_n_buckets,
            **({"sort_cols": list(sort_cols)} if sort_cols else {}),
        },
        new_n_buckets=new_n_buckets,
    )
    return {
        "from_buckets": snap.n_buckets,
        "to_buckets": new_n_buckets,
        "files_written": len(new_files),
        "snapshot_version": newsnap.version if newsnap else None,
    }


def _merge_single_pass(
    spark: SparkSession,
    table: LakeTable,
    snap: Snapshot,
    src: DataFrame,
    touched: set,
    epoch_id,
    collect_stats: bool,
    max_records_per_file: int,
) -> MergeStats:
    """Small-touched-set COW merge in ONE write job: union the touched
    buckets' physical rows with the (cached) batch shaped as delta
    rows, LWW-resolve per key in a single sub-bucket-split shuffle, and
    rewrite exactly the touched buckets. Semantically a MOR delta
    append fused with an immediate compaction of those buckets — max_by
    over (ordinal, is_target) reproduces the general path's
    `s.ordinal > t.last_ordinal` guard exactly (ties keep the target
    row; deletes of unseen keys become tombstones via the src row
    winning unopposed).

    Why: the broadcast merge scans the target once but also PERSISTS
    the full joined target, runs a matched-keys derivation and an
    anti-join for inserts — two extra jobs and a bucket-set-sized cache
    per epoch. When the manifest proves the touched buckets small, one
    shuffle of target+batch is cheaper than any of that (measured
    round 7: the 4-epoch COW replay queries ~2x). A 100-TB touched set
    fails the gate and keeps the no-target-shuffle broadcast join."""
    key = snap.m["key_col"]
    ufields = _user_fields(snap)
    payload = [f for f in ufields if f["name"] != key]
    is_delete = F.col("op") == "D"
    s_rows = src.select(
        F.col(key),
        *[
            F.when(is_delete, F.lit(None).cast(f["type"]))
            .otherwise(F.col(f"`{f['name']}`"))
            .alias(f["name"])
            for f in payload
        ],
        F.col("ordinal").cast("bigint").alias("last_ordinal"),
        is_delete.alias("_deleted"),
        F.col("_bucket"),
        F.lit(1).alias("_is_src"),
    )
    tgt = table.read_physical(spark, buckets=touched, resolve=True).withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(snap.n_buckets)).cast("int")
    )
    t_rows = tgt.select(
        F.col(key),
        *[F.col(f"`{f['name']}`") for f in payload],
        F.col("last_ordinal"),
        F.col("_deleted"),
        F.col("_bucket"),
        F.lit(0).alias("_is_src"),
    )
    allr0 = t_rows.unionByName(s_rows)
    pre = _layout_shuffle(spark, len(touched), allr0, key, allr0)
    # winner per key by (ordinal, target-wins-ties); carries its own
    # ordinal/_deleted; n_src tells stale/insert apart for the stats
    w = F.max_by(
        F.struct(
            *[F.col(f"`{f['name']}`") for f in payload],
            F.col("last_ordinal"),
            F.col("_deleted"),
            F.col("_is_src"),
        ),
        F.struct(F.col("last_ordinal"), (F.lit(1) - F.col("_is_src"))),
    ).alias("w")
    agg = pre.groupBy("_bucket", "_sub", key).agg(
        w, F.max("_is_src").alias("_n_src")
    )
    act = (
        F.when((F.col("w._is_src") == 1) & F.col("w._deleted"), "del")
        .when(F.col("w._is_src") == 1, "up")
        .when(F.col("_n_src") == 1, "stale")
    )
    result = agg.select(
        F.col(key),
        *[F.col(f"w.`{f['name']}`").alias(f["name"]) for f in payload],
        F.col("w.last_ordinal").alias("last_ordinal"),
        F.col("w._deleted").alias("_deleted"),
        F.col("_bucket"),
        act.alias("_act"),
        F.col("w._is_src").alias("_src_row"),
    )
    obs = None
    if collect_stats:
        from pyspark.sql import Observation

        # MERGE action counts ride the one write job — no second pass
        obs = Observation()
        result = result.observe(
            obs,
            F.sum(F.when(F.col("_act") == "up", 1).otherwise(0)).alias("up"),
            F.sum(F.when(F.col("_act") == "del", 1).otherwise(0)).alias("del"),
            F.sum(F.when(F.col("_act") == "stale", 1).otherwise(0)).alias(
                "stale"
            ),
        )
    result = result.drop("_act", "_src_row")
    new_files = _stage_write(
        result, table, snap.schema_version, len(touched),
        max_records_per_file, repartition=False, stats_col=key,
    )
    stats = MergeStats(touched_buckets=len(touched))
    if obs is not None:
        vals = observed_or(
            obs,
            result,
            [
                F.lit(0).alias("up"),
                F.lit(0).alias("del"),
                F.lit(0).alias("stale"),
            ],
        )
        stats.rows_upserted = int(vals["up"] or 0)
        stats.rows_deleted = int(vals["del"] or 0)
        stats.rows_stale = int(vals["stale"] or 0)
    newsnap = table.commit_rewrite(
        base=snap,
        new_files=new_files,
        replaced_buckets=set(touched),
        epoch_id=epoch_id,
        summary={
            "operation": "merge",
            "epoch_id": epoch_id,
            "touched_buckets": sorted(touched),
            "rows_upserted": stats.rows_upserted,
            "rows_deleted": stats.rows_deleted,
            "rows_stale": stats.rows_stale,
        },
    )
    if newsnap is None:
        return MergeStats(skipped=True)
    stats.snapshot_version = newsnap.version
    stats.snapshot_id = newsnap.snapshot_id
    stats.summary = newsnap.m["summary"]
    return stats


def merge_changes(
    spark: SparkSession,
    table: LakeTable,
    batch: DataFrame,
    epoch_id: int | None = None,
    collect_stats: bool = True,
    max_records_per_file: int = 2_000_000,
    insert_missing: bool = True,
    broadcast_threshold: int = 4_000_000,
    broadcast_max_bytes: int = 256 << 20,
    small_table_rows: int = 8_000_000,
) -> MergeStats:
    """Apply a key-unique change batch to the table.

    ``batch`` contract: exactly one row per key (pre-deduped LWW winner)
    with columns (doc_id, op in {'U','D'}, ordinal bigint, <user payload
    columns>). Missing user columns (e.g. just added via DDL) null-fill.

    insert_missing=False gives UPDATE ... KEYED ON semantics (matched
    rows only, unmatched batch rows are no-ops — reference:
    core:ops/sql/Update.scala:19-44); the join flips from full_outer to
    a target-side left join.
    """
    snap = table.snapshot()
    if epoch_id is not None and epoch_id in snap.applied_epochs:
        return MergeStats(skipped=True, snapshot_version=snap.version, snapshot_id=snap.snapshot_id)
    if snap.additive_cols:
        raise ValueError(
            "merge_changes on an aggregating-payload (additive) table — "
            "its rows are deltas; use append_changes"
        )

    key = snap.m["key_col"]
    ufields = _user_fields(snap)
    payload_cols = [f["name"] for f in ufields if f["name"] != key]
    src = _align_batch(batch, snap, key)

    if insert_missing and not snap.m["files"]:
        # ---- EMPTY-TARGET fast path (initial view build / first
        # window into a fresh table): nothing can match, so every
        # batch row is an insert (a delete of an unseen key becomes a
        # tombstone — identical to the general path's NOT MATCHED arm).
        # ONE pass: shape -> observe -> write -> commit. The general
        # path would persist the whole batch, run a bucket-count job,
        # and join against an empty scan — for the span-index build
        # (~10M delta rows at sf1.0) that is two extra materializations
        # of the most expensive subplan in the query (measured round 7,
        # guide §1.2: don't compute things you throw away).
        ins_delete = F.col("op") == "D"
        shaped = src.select(
            F.col(key),
            *[
                F.when(ins_delete, F.lit(None).cast(f["type"]))
                .otherwise(F.col(f"`{f['name']}`"))
                .alias(f["name"])
                for f in ufields
                if f["name"] != key
            ],
            F.col("ordinal").alias("last_ordinal"),
            ins_delete.alias("_deleted"),
            F.col("_bucket"),
        )
        rows = _layout_shuffle(
            spark, snap.n_buckets, shaped, key, shaped
        ).drop("_sub")
        obs = None
        if collect_stats:
            from pyspark.sql import Observation

            obs = Observation()
            rows = rows.observe(
                obs,
                F.sum(F.when(F.col("_deleted"), 1).otherwise(0)).alias("del"),
                F.count(F.lit(1)).alias("total"),
            )
        new_files = _stage_write(
            rows, table, snap.schema_version, snap.n_buckets,
            max_records_per_file, repartition=False, stats_col=key,
        )
        if not new_files:
            return MergeStats(skipped=True, snapshot_version=snap.version,
                              snapshot_id=snap.snapshot_id)
        touched = {f["bucket"] for f in new_files}
        stats = MergeStats(touched_buckets=len(touched))
        if obs is not None:
            vals = observed_or(
                obs,
                rows,
                [
                    F.sum(F.when(F.col("_deleted"), 1).otherwise(0)).alias("del"),
                    F.count(F.lit(1)).alias("total"),
                ],
            )
            stats.rows_deleted = int(vals["del"] or 0)
            stats.rows_upserted = int(vals["total"] or 0) - stats.rows_deleted
        newsnap = table.commit_rewrite(
            base=snap,
            new_files=new_files,
            replaced_buckets=touched,
            epoch_id=epoch_id,
            summary={
                "operation": "merge",
                "epoch_id": epoch_id,
                "touched_buckets": sorted(touched),
                "rows_upserted": stats.rows_upserted,
                "rows_deleted": stats.rows_deleted,
                "rows_stale": 0,
            },
        )
        if newsnap is None:  # epoch raced in since our check: no-op
            return MergeStats(skipped=True)
        stats.snapshot_version = newsnap.version
        stats.snapshot_id = newsnap.snapshot_id
        stats.summary = newsnap.m["summary"]
        return stats

    src.persist()
    merged_cache = None
    try:
        # one driver job yields both the touched-bucket set (bounded by
        # n_buckets, safe to collect) and the row count the broadcast
        # decision needs
        bucket_counts = src.groupBy("_bucket").count().collect()
        touched = {r[0] for r in bucket_counts}
        n_src = sum(r[1] for r in bucket_counts)
        if not touched:
            return MergeStats(skipped=True, snapshot_version=snap.version,
                              snapshot_id=snap.snapshot_id)

        # ---- SMALL-TOUCHED-SET single-pass arm: gate on the manifest
        # row counts of the buckets this batch touches (metadata only).
        # When they are provably small, merge in ONE union+LWW shuffle
        # over (touched physical rows ∪ cached batch) — no table-sized
        # persist, no matched-keys derivation, no anti-join — and
        # rewrite exactly the touched buckets (write amplification
        # unchanged). Big touched sets keep the broadcast arm below,
        # whose target side never shuffles at all.
        # QWERY_MERGE_SINGLE_PASS=0 is the A/B instrument.
        touched_rows = [f.get("rows") for f in snap.files(touched)]
        if (
            insert_missing
            and os.environ.get("QWERY_MERGE_SINGLE_PASS", "1") == "1"
            and all(r is not None for r in touched_rows)
            and sum(touched_rows) <= small_table_rows
        ):
            return _merge_single_pass(
                spark, table, snap, src, touched, epoch_id, collect_stats,
                max_records_per_file,
            )

        tgt = table.read_physical(spark, buckets=touched)

        s = src.alias("s")

        apply_change = F.col("s.ordinal").isNotNull() & (
            F.col("t.last_ordinal").isNull()
            | (F.col("s.ordinal") > F.col("t.last_ordinal"))
        )
        is_delete = F.col("s.op") == F.lit("D")

        out_cols = [F.coalesce(F.col(f"s.`{key}`"), F.col(f"t.`{key}`")).alias(key)]
        for c in payload_cols:
            out_cols.append(
                F.when(apply_change & is_delete, F.lit(None).cast(dict((f["name"], f["type"]) for f in ufields)[c]))
                .when(apply_change, F.col(f"s.`{c}`"))
                .otherwise(F.col(f"t.`{c}`"))
                .alias(c)
            )
        out_cols.append(
            F.when(apply_change, F.col("s.ordinal"))
            .otherwise(F.col("t.last_ordinal"))
            .alias("last_ordinal")
        )
        out_cols.append(
            F.when(apply_change, is_delete)
            .otherwise(F.coalesce(F.col("t.`_deleted`"), F.lit(False)))
            .alias("_deleted")
        )
        out_cols.append(F.coalesce(F.col("s.`_bucket`"), F.col("t.`_bucket`")).alias("_bucket"))

        # target bucket derived on the fly (cheap; no shuffle added)
        tgt_b = tgt.withColumn(
            "_bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(snap.n_buckets)).cast("int")
        ).alias("t")
        act = (
            F.when(apply_change & is_delete, "del")
            .when(apply_change, "up")
            .when(F.col("s.ordinal").isNotNull(), "stale")
        )
        join_cond = F.col(f"t.`{key}`") == F.col(f"s.`{key}`")

        # gate the broadcast on MEASURED bytes, not rows: wide token-array
        # payloads can push a few million rows to multi-GB, far past safe
        # driver-collect + per-executor-copy territory. The persisted
        # InMemoryRelation stats are the actual cached size; if the stats
        # call ever fails, fall back to the conservative row cap alone.
        try:
            src_bytes = int(
                src._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            src_bytes = None
        use_broadcast = (
            insert_missing
            and n_src <= broadcast_threshold
            and (src_bytes is None or src_bytes <= broadcast_max_bytes)
        )
        # A/B instrument (round-3 verdict: the driver-recorded COW
        # throughput dropped 1.8x vs round 2 in the same round the merge
        # went single-scan — reconcile by measurement, not narrative).
        # QWERY_MERGE_TWO_SCAN=1 restores the round-2 broadcast shape:
        # no persist of the merged join; matched keys come from a SECOND
        # left_semi scan of the touched target buckets.
        two_scan = os.environ.get("QWERY_MERGE_TWO_SCAN") == "1"

        def _inserts(matched_keys):
            # src keys absent from the target become inserts (deletes of
            # absent keys become tombstones). matched_keys is <= |src|
            # rows, so the anti join broadcasts; the repartition is the
            # only shuffle left — the small inserts' bucket layout for
            # the partitioned write. Shared by BOTH broadcast arms so
            # the A/B stays a pure performance switch.
            ins_delete = F.col("op") == "D"
            return (
                src.join(F.broadcast(matched_keys), key, "left_anti")
                .select(
                    F.col(key),
                    *[
                        F.when(ins_delete, F.lit(None).cast(f["type"]))
                        .otherwise(F.col(f"`{f['name']}`"))
                        .alias(f["name"])
                        for f in ufields
                        if f["name"] != key
                    ],
                    F.col("ordinal").alias("last_ordinal"),
                    ins_delete.alias("_deleted"),
                    F.col("_bucket"),
                    F.when(ins_delete, "del").otherwise("up").alias("_act"),
                )
                .repartition(max(min(len(touched), 64), 1), "_bucket")
            )

        if use_broadcast and two_scan:
            merged = tgt_b.join(F.broadcast(s), join_cond, "left").select(
                *out_cols, act.alias("_act")
            )
            matched_keys = (
                table.read_physical(spark, buckets=touched)
                .select(F.col(f"`{key}`"))
                .join(F.broadcast(src.select(key)), key, "left_semi")
            )
            result = merged.unionByName(_inserts(matched_keys))
        elif use_broadcast:
            # ---- BROADCAST MERGE: the target side NEVER shuffles, and
            # is scanned exactly ONCE (round-2 verdict: the old shape
            # re-read the touched buckets for a left_semi matched-keys
            # pass — at 100 TB the touched-bucket scan dominates a COW
            # batch, so paying it twice halves merge throughput). The
            # one broadcast left join carries the matched src key as a
            # tag column and is persisted + eagerly materialized (count);
            # both the matched-keys derivation and the final write read
            # the cached blocks, never the parquet again (plan-asserted
            # in tests/test_plans.py). persist, NOT localCheckpoint: on
            # executor loss cached partitions recompute from the parquet
            # lineage (a checkpoint would truncate it and fail the merge
            # permanently); unpersisted in the finally below.
            merged = tgt_b.join(F.broadcast(s), join_cond, "left").select(
                *out_cols, act.alias("_act"), F.col(f"s.`{key}`").alias("_mk")
            )
            merged_cache = merged = merged.persist()
            merged.count()  # the ONE scan of the touched target buckets
            matched = merged.drop("_mk")
            matched_keys = (
                merged.filter(F.col("_mk").isNotNull())
                .select(F.col("_mk").alias(key))
            )
            result = matched.unionByName(_inserts(matched_keys))
        else:
            join_how = "full_outer" if insert_missing else "left"
            joined = tgt_b.join(s, join_cond, join_how)
            result = joined.select(*out_cols, act.alias("_act"))

        obs = None
        if collect_stats:
            from pyspark.sql import Observation

            # MERGE action counts ride the write job — no second pass
            obs = Observation()
            result = result.observe(
                obs,
                F.sum(F.when(F.col("_act") == "up", 1).otherwise(0)).alias("up"),
                F.sum(F.when(F.col("_act") == "del", 1).otherwise(0)).alias("del"),
                F.sum(F.when(F.col("_act") == "stale", 1).otherwise(0)).alias("stale"),
            )
        result = result.drop("_act")

        # ---- write new files for touched buckets ----
        # broadcast path: matched rows are already target-scan-local and
        # inserts are bucket-repartitioned — re-shuffling would undo the
        # zero-shuffle plan, so write as-is (partitionBy still routes
        # rows to the right bucket dirs).
        new_files = _stage_write(
            result, table, snap.schema_version, len(touched), max_records_per_file,
            repartition=not use_broadcast, stats_col=key,
        )
        stats = MergeStats(touched_buckets=len(touched))
        if obs is not None:
            vals = observed_or(
                obs,
                result,
                [
                    F.lit(0).alias("up"),
                    F.lit(0).alias("del"),
                    F.lit(0).alias("stale"),
                ],
            )
            stats.rows_upserted = int(vals["up"] or 0)
            stats.rows_deleted = int(vals["del"] or 0)
            stats.rows_stale = int(vals["stale"] or 0)

        newsnap = table.commit_rewrite(
            base=snap,
            new_files=new_files,
            replaced_buckets=touched,
            epoch_id=epoch_id,
            summary={
                "operation": "merge",
                "epoch_id": epoch_id,
                "touched_buckets": sorted(touched),
                "rows_upserted": stats.rows_upserted,
                "rows_deleted": stats.rows_deleted,
                "rows_stale": stats.rows_stale,
            },
        )
        if newsnap is None:  # epoch raced in since our check: no-op
            return MergeStats(skipped=True)
        stats.snapshot_version = newsnap.version
        stats.snapshot_id = newsnap.snapshot_id
        stats.summary = newsnap.m["summary"]
        return stats
    finally:
        src.unpersist()
        if merged_cache is not None:
            merged_cache.unpersist()


def binpack(
    spark: SparkSession,
    table: LakeTable,
    small_bytes: int = 32 << 20,
    min_files: int = 4,
    buckets: set[int] | None = None,
    max_records_per_file: int = 2_000_000,
) -> dict:
    """Partial small-file compaction (Iceberg rewrite_data_files
    binpack): per bucket, merge ONLY the files under ``small_bytes``
    into one, leaving the bucket's large (already-compacted, sorted)
    files untouched. Versus compact(), which rewrites every touched
    bucket wholesale, binpack bounds maintenance write amplification by
    the SMALL-file volume — at 100 TB a bucket is one multi-GB sorted
    file plus a tail of per-epoch delta files, and rewriting the big
    file every maintenance tick is the single largest wasted-write
    lever (measured: tools/binpack_bench.py).

    Soundness: LWW resolution is an associative max_by per key, so
    resolving a SUBSET of a bucket's files produces subset-winners that
    still compete correctly with the untouched files' rows at read
    time; tombstones are kept (they must keep suppressing rows in the
    untouched files). An unresolved bucket stays unresolved, a resolved
    bucket's subset concatenates losslessly (disjoint keys make the
    resolve an identity). The commit is a strict-CAS partial rewrite
    (remove exactly the merged files, add their replacement —
    LakeTable.commit_remove_add); any concurrent head movement raises
    CommitConflict and maintenance recomputes.

    File sizes come from the local filesystem (os.path.getsize — one
    stat per candidate, metadata only); on an object store the size
    would ride the manifest entry like rows/key bounds do."""
    snap = table.snapshot()
    key = snap.m["key_col"]
    scope = buckets if buckets is not None else {
        f["bucket"] for f in snap.m["files"]
    }
    plans: list[tuple[int, list[dict]]] = []
    for b in sorted(scope):
        entries = snap.files({b})
        small = [
            f for f in entries
            if os.path.getsize(os.path.join(table.path, f["path"])) < small_bytes
        ]
        # merging one small file is a pure rewrite; require a win
        if len(small) >= min_files:
            plans.append((b, small))
    if not plans:
        return {"binpacked_buckets": 0, "files_merged": 0, "files_written": 0}

    merged = [f for _b, fs in plans for f in fs]
    df = table._aligned_scan(spark, snap, None, file_subset=merged)
    # identity on resolved buckets; SUM-folds additive tables' deltas
    # (subset sums stack associatively, same soundness as subset LWW)
    df = LakeTable._resolve(df, key, snap)
    df = df.withColumn("_bucket", table.bucket_expr())
    new_files = _stage_write(
        df,
        table,
        snap.schema_version,
        n_partitions=len(plans),
        max_records_per_file=max_records_per_file,
        repartition=True,
        stats_col=key,
    )
    table.commit_remove_add(
        snap,
        [f["path"] for f in merged],
        new_files,
        summary={
            "operation": "binpack",
            "touched_buckets": sorted(b for b, _ in plans),
            "files_merged": len(merged),
            "files_written": len(new_files),
        },
    )
    return {
        "binpacked_buckets": len(plans),
        "files_merged": len(merged),
        "files_written": len(new_files),
    }
