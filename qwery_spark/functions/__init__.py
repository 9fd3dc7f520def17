from qwery_spark.functions.compat import register_compat_functions  # noqa: F401
