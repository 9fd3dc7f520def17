from qwery_spark.lake.table import LakeTable  # noqa: F401
