"""Reference-compatible scalar functions as SQL-bodied UDFs.

The reference registers its builtins in fixed arity maps
(core:ExpressionParser.scala:318-347); several have non-standard
semantics that plain Spark builtins don't match. Rather than Python
UDFs, each shim is a Spark 4 SQL-bodied function (CREATE TEMPORARY
FUNCTION ... RETURN <expr>) — Catalyst inlines the body, so the shims
cost nothing at runtime (whole-stage codegen, no serialization).

Quirk semantics honored (with reference citations):
  QW_SUBSTRING(s, start, len) — 0-based start
      (core:ops/builtins/Substring.scala:11-20; golden:
       Substring('Hello World', 1, 4) = 'ello',
       test:ops/builtins/InternalFunctionTest.scala:79-82)
  QW_RIGHT(s, n) — NULL when n > length(s)
      (core:ops/builtins/Right.scala:9-16)
  QW_LEFT(s, n) — plain prefix (core:ops/builtins/Left.scala:9-16)
  QW_SPLIT(s, delim) — CHARACTER-CLASS split: any char of delim splits
      (core:ops/builtins/Split.scala:12-18 uses split("[delim]"))
  QW_PADLEFT/QW_PADRIGHT(s, w) — space-pad to width
      (core:ops/builtins/PadLeft.scala:10-28)
  QW_SIGN / QW_SQRT / QW_POW / QW_LEN / QW_TRIM / QW_CONCAT — direct
      builtins, registered for dialect completeness.

Known reference BUGS deliberately NOT replicated (SURVEY.md §7.0.6):
LE-as-GE (core:ops/Condition.scala:44-46), no operator precedence,
ORDER BY ignored.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

_DEFS = [
    # 0-based substring (Spark substr is 1-based)
    "QW_SUBSTRING(s STRING, start INT, len INT) RETURNS STRING "
    "RETURN substr(s, start + 1, len)",
    # RIGHT: null if n exceeds the string length
    "QW_RIGHT(s STRING, n INT) RETURNS STRING "
    "RETURN CASE WHEN n > length(s) THEN NULL ELSE substr(s, -n, n) END",
    "QW_LEFT(s STRING, n INT) RETURNS STRING RETURN substr(s, 1, n)",
    # character-class split — same naive class construction as the
    # reference (Split.scala builds split("[" + delim + "]") without
    # escaping; the quirk is part of the contract)
    "QW_SPLIT(s STRING, delim STRING) RETURNS ARRAY<STRING> "
    "RETURN split(s, concat('[', delim, ']'))",
    "QW_PADLEFT(s STRING, w INT) RETURNS STRING RETURN lpad(s, w, ' ')",
    "QW_PADRIGHT(s STRING, w INT) RETURNS STRING RETURN rpad(s, w, ' ')",
    "QW_SIGN(x DOUBLE) RETURNS DOUBLE RETURN signum(x)",
    "QW_SQRT(x DOUBLE) RETURNS DOUBLE RETURN sqrt(x)",
    "QW_POW(a DOUBLE, b DOUBLE) RETURNS DOUBLE RETURN pow(a, b)",
    "QW_LEN(s STRING) RETURNS INT RETURN length(s)",
    "QW_TRIM(s STRING) RETURNS STRING RETURN trim(s)",
    "QW_CONCAT(a STRING, b STRING) RETURNS STRING RETURN concat(a, b)",
    # NOW()/UUID(): non-deterministic by nature (reference Now.scala,
    # Uuid.scala); thin aliases
    "QW_NOW() RETURNS TIMESTAMP RETURN current_timestamp()",
    "QW_UUID() RETURNS STRING RETURN uuid()",
    # RAND(): uniform double (reference Rand.scala); Spark's rand()
    "QW_RAND() RETURNS DOUBLE RETURN rand()",
    # DATE_FORMAT/DATE_PARSE (reference DateFormat.scala:9-17,
    # DateParse.scala:9-17): Java SimpleDateFormat patterns — Spark's
    # datetime patterns share yyyy/MM/dd/HH/mm/ss, the reference's
    # documented usage surface
    "QW_DATE_FORMAT(t TIMESTAMP, fmt STRING) RETURNS STRING "
    "RETURN date_format(t, fmt)",
    "QW_DATE_PARSE(s STRING, fmt STRING) RETURNS TIMESTAMP "
    "RETURN to_timestamp(s, fmt)",
]

NAMES = [re.match(r"(\w+)", d).group(1) for d in _DEFS]


def register_compat_functions(spark: SparkSession) -> list[str]:
    """Register all reference-compat functions on the session; returns
    the registered names. Idempotent (CREATE OR REPLACE)."""
    for d in _DEFS:
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {d}")
    return list(NAMES)
