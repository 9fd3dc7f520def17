"""REPL / script runner: ``python -m qwery_spark [script.sql]``.

Reference analogue: QweryCLI (app/jvm/cli/.../QweryCLI.scala:31-80) —
multi-line input until a blank line, execute against a session scope,
tabular print. Env vars are imported as ``env.*`` variables, as the
reference does (core:ops/Scope.scala:219).
"""

from __future__ import annotations

import sys


def _print_result(res) -> None:
    from pyspark.sql import DataFrame

    if res is None:
        print("Ok")
    elif isinstance(res, DataFrame):
        res.show(50, truncate=32)
    else:
        print(res)


def main(argv: list[str]) -> int:
    from qwery_spark.compiler import ScriptEngine
    from qwery_spark.functions import register_compat_functions
    from qwery_spark.session import get_spark

    spark = get_spark("qwery-spark-repl")
    register_compat_functions(spark)
    eng = ScriptEngine(spark)

    if argv:  # script mode
        with open(argv[0]) as fh:
            for res in eng.run_script(fh.read()):
                _print_result(res)
        return 0

    print("qwery-spark REPL — statements end with a blank line; 'exit' quits")
    buf: list[str] = []
    for line in sys.stdin:
        line = line.rstrip("\n")
        if line.strip().lower() in ("exit", "quit"):
            break
        if line.strip():
            buf.append(line)
            continue
        if not buf:
            continue
        text = "\n".join(buf)
        buf = []
        try:
            for res in eng.run_script(text):
                _print_result(res)
        except Exception as e:  # REPL survives bad statements
            print(f"error: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
