from qwery_spark.lake.table import CommitConflict, LakeTable  # noqa: F401
