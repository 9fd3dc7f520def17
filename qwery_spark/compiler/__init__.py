from qwery_spark.compiler.engine import ScriptEngine  # noqa: F401
from qwery_spark.compiler.decompiler import decompile, parse_statement, render  # noqa: F401
