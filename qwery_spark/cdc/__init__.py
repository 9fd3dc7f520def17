from qwery_spark.cdc.apply import apply_changes  # noqa: F401
from qwery_spark.cdc.dedup import lww_dedup  # noqa: F401
