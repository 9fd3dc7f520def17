from qwery_spark.compiler.engine import ScriptEngine  # noqa: F401
