"""Source/sink routing: URL scheme + extension -> Spark reader/writer.

Reference: SourceUrlParser routes by scheme (file:, http(s):, s3:,
kafka:, jdbc:) then picks the format from hints or extension
(core:devices/SourceUrlParser.scala:19-77). Spark-first restatement:
everything resolves to spark.read.format(...) with explicit options —
Catalyst/DataSourceV2 handles pushdown, partitioned listing, and
parallel IO from there. Compression (.gz) is transparent in Spark.

Hints map the reference's WITH clauses
(core:SQLLanguageParser.scala:430-520):
  COLUMN HEADERS       -> header=True
  DELIMITER '|'        -> sep
  AUTO DELIMITER       -> driver-side 5-line sniff (delimited.py)
  FIXED WIDTH 'n^w,..' -> substring projection (fixed_width.py)
  JSON PATH (a.b)      -> post-select into nested field + explode
  FORMAT x             -> explicit format override
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qwery_spark.sources.delimited import delimiter_for_extension, sniff_delimiter
from qwery_spark.sources.fixed_width import read_fixed_width, write_fixed_width


def _strip_scheme(path: str) -> tuple[str, str]:
    for scheme in ("file://", "files://", "s3://", "s3a://", "http://", "https://"):
        if path.startswith(scheme):
            return scheme.rstrip(":/"), path
    return "file", path


def _infer_format(path: str, hints: dict) -> str:
    if "format" in hints:
        return str(hints["format"]).lower()
    if "fixed_width" in hints:
        return "fixed_width"
    if "avro_schema" in hints:
        # WITH (AVRO 'schema.avsc') implies the format
        # (core:SQLLanguageParser.scala:455-459)
        return "avro"
    p = path[:-3] if path.endswith(".gz") else path
    ext = os.path.splitext(p)[1].lower()
    return {
        ".csv": "csv", ".tsv": "csv", ".psv": "csv", ".txt": "csv",
        ".json": "json", ".jsonl": "json", ".ndjson": "json",
        ".parquet": "parquet", ".avro": "avro", ".orc": "orc",
    }.get(ext, "parquet")


def _parse_jdbc(path: str) -> tuple[str, str]:
    """'jdbc:mysql://host/db?table=T' -> (url, table) — the reference's
    JDBC URL form (core:sources/JDBCInputSource.scala parseInputURL)."""
    if "?table=" not in path:
        raise ValueError("jdbc source needs ?table=<name>")
    url, table = path.split("?table=", 1)
    return url, table.split("&")[0]


def read_source(spark: SparkSession, path: str, hints: dict | None = None) -> DataFrame:
    """Load any supported source as a DataFrame."""
    hints = dict(hints or {})
    if path.startswith("jdbc:"):
        # needs the vendor driver jar on the cluster classpath
        url, table = _parse_jdbc(path)
        return spark.read.format("jdbc").option("url", url).option("dbtable", table).load()
    scheme, path = _strip_scheme(path)
    if scheme == "file":
        # the path IS a lake table (or the 'path@branch' view of one):
        # route through the snapshot read (live rows, MOR resolution,
        # schema alignment) — a raw parquet scan of the data dir would
        # see every historical snapshot's files plus tombstones and
        # engine columns. WITH (VERSION n) time-travels.
        local = path.split("://", 1)[-1]
        tbl = None
        if os.path.isdir(os.path.join(local, "_manifests")):
            from qwery_spark.lake.table import LakeTable

            tbl = LakeTable(local)
        elif "@" in local:
            base, _, br = local.rpartition("@")
            if os.path.isdir(os.path.join(base, "_manifests", f"branch-{br}")):
                from qwery_spark.lake.table import LakeTable

                tbl = LakeTable(base, branch=br)
        if tbl is not None:
            v = hints.get("version")
            return tbl.read(
                spark, snapshot_version=None if v is None else int(v)
            )
    if hints.get("version") is not None:
        # a silently ignored time-travel pin would return current data
        # to a user who believes they pinned a snapshot
        raise ValueError(
            f"WITH (VERSION n) only applies to lake tables; {path!r} is not one"
        )
    if scheme in ("s3", "s3a"):
        # s3a:// paths work as-is once Hadoop S3 jars + creds are on the
        # cluster; nothing engine-side changes.
        path = "s3a://" + path.split("://", 1)[1]
    if scheme in ("http", "https"):
        # driver-side fetch to a temp file, then normal routing — mirrors
        # the reference's URL text reader
        # (core:devices/TextFileInputDevice.scala:35-49). Fine for config/
        # lookup files; bulk data belongs on s3a/hdfs.
        import tempfile
        import urllib.request

        # keep the FULL extension chain: 'data.csv.gz' must land in a
        # '*.csv.gz' temp file or format inference (which strips one
        # trailing .gz before looking at the extension) sees no format
        # and falls through to parquet
        base = os.path.basename(path.split("?")[0])
        if base.endswith(".gz"):
            suffix = (os.path.splitext(base[:-3])[1] or ".txt") + ".gz"
        else:
            suffix = os.path.splitext(base)[1] or ".txt"
        fd, local = tempfile.mkstemp(suffix=suffix, prefix="qwery_http_")
        os.close(fd)
        urllib.request.urlretrieve(path, local)  # noqa: S310
        path = local
    fmt = _infer_format(path, hints)

    if fmt == "fixed_width":
        return read_fixed_width(spark, path, hints["fixed_width"])
    if fmt == "csv":
        sep = hints.get("delimiter")
        if sep is None:
            sep = delimiter_for_extension(path)
        if sep is None or hints.get("auto_delimiter"):
            local = path.split("://", 1)[-1]
            target = local
            if os.path.isdir(local):
                files = [f for f in sorted(os.listdir(local)) if not f.startswith("_")]
                if files:
                    target = os.path.join(local, files[0])
            sep = sniff_delimiter(target)
        header = bool(hints.get("headers", True))
        reader = (
            spark.read.option("header", header)
            .option("sep", sep)
            .option("inferSchema", bool(hints.get("infer_schema", False)))
        )
        df = reader.csv(path)
        if not header:
            # reference names headerless columns field0..fieldN
            df = df.toDF(*[f"field{i}" for i in range(len(df.columns))])
        return df
    if fmt == "json":
        df = spark.read.json(path)
        jp = hints.get("json_path")
        if jp:
            # WITH JSON PATH (a,b): drill into nested element; arrays
            # explode to rows (core:sources/JSONInputSource.scala:14-30)
            for seg in [s.strip() for s in str(jp).split(",") if s.strip()]:
                field = df.schema[seg] if seg in df.columns else None
                col = F.col(seg)
                if field is not None and field.dataType.typeName() == "array":
                    df = df.select(F.explode(col).alias(seg))
                    df = df.select(f"{seg}.*")
                else:
                    df = df.select(f"{seg}.*")
        return df
    if fmt == "avro":
        # needs the spark-avro jar on the classpath (absent in this
        # sandbox; gated test in tests/test_compiler.py)
        reader = spark.read.format("avro")
        schema_file = hints.get("avro_schema")
        if schema_file:
            # WITH (AVRO 'schema.avsc') -> explicit reader schema
            # (core:sources/AvroInputSource.scala:19-21)
            with open(schema_file) as fh:
                reader = reader.option("avroSchema", fh.read())
        return reader.load(path)
    if fmt == "orc":
        return spark.read.orc(path)
    return spark.read.parquet(path)


def write_sink(
    df: DataFrame, path: str, hints: dict | None = None, mode: str = "overwrite"
) -> int:
    """Write a DataFrame to a sink; returns rows written (the reference
    returns ROWS_INSERTED, core:ops/sql/Insert.scala:13-28).

    The count rides the write job itself via the Observation API — one
    execution, and the reported ROWS_INSERTED are the rows ACTUALLY
    written (a separate pre-count would re-run the plan and disagree
    under non-deterministic expressions like QW_UUID/QW_NOW)."""
    from pyspark.sql import Observation

    hints = dict(hints or {})
    obs = Observation()
    df = df.observe(obs, F.count(F.lit(1)).alias("n"))

    def _written() -> int:
        try:
            return int(obs.get["n"])
        except Exception:
            # Spark's toPyRow chokes on observations over empty writes
            # (see lake.merge.observed_or) — an empty write wrote 0 rows
            return 0

    if path.startswith("jdbc:"):
        url, table = _parse_jdbc(path)
        df.write.mode(mode).format("jdbc").option("url", url).option(
            "dbtable", table
        ).save()
        return _written()
    _, path = _strip_scheme(path)
    fmt = _infer_format(path, hints)
    if fmt == "fixed_width":
        write_fixed_width(df, path, hints["fixed_width"], mode=mode)
        return _written()
    writer = df.write.mode(mode)
    # PARTITIONED BY hint -> hive-style directory partitioning (sink-side
    # partition pruning for downstream readers)
    pb = hints.get("partitioned_by")
    if pb:
        writer = writer.partitionBy(*[c.strip() for c in str(pb).split(",") if c.strip()])
    if fmt == "csv":
        sep = hints.get("delimiter") or delimiter_for_extension(path) or ","
        writer.option("header", bool(hints.get("headers", True))).option("sep", sep).csv(path)
    elif fmt == "json":
        writer.json(path)
    elif fmt == "avro":
        w = writer.format("avro")
        schema_file = hints.get("avro_schema")
        if schema_file:
            with open(schema_file) as fh:
                w = w.option("avroSchema", fh.read())
        w.save(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        writer.parquet(path)
    return _written()
