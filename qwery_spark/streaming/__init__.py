from qwery_spark.streaming.stream import run_stream, stream_events  # noqa: F401
