"""SparkSession factory with scale-oriented defaults.

Local testing runs on local[N]; the same config block is what we'd ship
via spark-submit --py-files to a real cluster (executor counts replace
the local thread count; nothing here is local-mode specific).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "qwery-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
    master: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the CDC pipeline.

    - AQE on: runtime coalescing + skew-join splitting.
    - Arrow on: every pandas UDF crosses the JVM/Python boundary in
      columnar batches, never per-row.
    - UTC session timezone: keeps parity with the DuckDB oracle.
    - shuffle partitions default to the core count: right-sized for
      local; on a real cluster this is set to ~2-3x total cores.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    # master override: bench uses local-cluster[n,c,mem] (separate
    # executor JVMs — the closest single-host stand-in for a real
    # multi-executor cluster); pyspark workers there need the repo on
    # PYTHONPATH to unpickle the pandas UDFs
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.executorEnv.PYTHONPATH", repo_dir)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # keep AQE from coalescing below the core count on mid-size
        # shuffles (64MB default advisory size serializes local runs)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        # local-mode scan splitting: micro-batch files are ~50-150MB, so
        # the 128MB default would scan them in 1-2 tasks; 16MB keeps the
        # scan wide. On a real cluster with TB-scale inputs revert to
        # 128-256MB (per-task overhead amortizes there).
        .config("spark.sql.files.maxPartitionBytes", "16m")
        # scan-split floor: Spark sizes splits as
        #   min(maxPartitionBytes, max(openCostInBytes, bytes/minPartitionNum))
        # so with the default 4m open cost a 55 MB micro-batch chunk
        # splits into ~14 map tasks no matter how many cores exist —
        # measured as the local-cluster replay's scaling wall (the map
        # side carries validation + dedup partial-agg). 1m reflects
        # local-disk open cost; object-store deployments should raise
        # it back toward 4m (per-split request latency dominates there).
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the changelog's key-set pruning (changes._diff_pruning) pushes
        # a window's exact key list into the parquet scan; above this
        # threshold Spark degrades the In to a [min,max] range, which a
        # scattered window's hull makes useless — so raise it to cover
        # the _KEY_SET_MAX_ROWS gate. It must stay SMALL in absolute
        # terms: parquet-mr evaluates the pushed In as a linear OR
        # chain, one stack frame per value, and the scan task
        # StackOverflows near ~1000 long values on a default-Xss JVM
        # (measured round 6; the boundary moves with surrounding stack
        # depth, so 250 keeps ~4x margin). Windows with more keys fall
        # back to hull-only pruning — degraded, never crashed.
        .config("spark.sql.parquet.pushdown.inFilterThreshold", "250")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
