from qwery_spark.sources.registry import read_source, write_sink  # noqa: F401
