"""Golden-value tests for reference-compat scalar functions, ported
from test:ops/builtins/InternalFunctionTest.scala:17-96."""

import math

import pytest

from qwery_spark.functions import register_compat_functions

GOLDEN = [
    # (expr, expected) — reference golden values
    ("QW_SUBSTRING('Hello World', 1, 4)", "ello"),      # 0-based start
    ("QW_LEFT('Hello World', 5)", "Hello"),
    ("QW_RIGHT('Hello World', 5)", "World"),
    ("QW_RIGHT('abc', 5)", None),                        # n > len -> NULL
    ("QW_SPLIT('Hello World,Yes;No', ' ,;')", ["Hello", "World", "Yes", "No"]),
    ("QW_PADLEFT('Hello', 10)", "     Hello"),
    ("QW_PADRIGHT('Hello', 10)", "Hello     "),
    ("QW_SIGN(-0.1)", -1.0),
    ("QW_SQRT(4.0)", 2.0),
    ("QW_POW(2.0, 3.0)", 8.0),
    ("QW_LEN('Hello')", 5),
    ("QW_TRIM('  Hello  ')", "Hello"),
    ("QW_CONCAT('Hello ', 'World')", "Hello World"),
]


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    names = register_compat_functions(spark)
    assert "QW_SUBSTRING" in names


@pytest.mark.parametrize("expr,expected", GOLDEN, ids=[g[0][:40] for g in GOLDEN])
def test_golden(spark, expr, expected):
    got = spark.sql(f"SELECT {expr} AS v").collect()[0]["v"]
    if isinstance(expected, float):
        assert got is not None and math.isclose(got, expected)
    elif isinstance(expected, list):
        assert list(got) == expected
    else:
        assert got == expected


def test_now_and_uuid_shapes(spark):
    row = spark.sql("SELECT QW_NOW() AS t, QW_UUID() AS u").collect()[0]
    assert row["t"] is not None
    assert len(row["u"]) == 36 and row["u"].count("-") == 4


def test_qw_date_format_parse_roundtrip(spark):
    row = spark.sql(
        "SELECT QW_DATE_FORMAT(TIMESTAMP '1997-03-15 08:30:00', 'yyyy/MM/dd HH:mm') AS f, "
        "QW_DATE_PARSE('2001-07-04 12:00:00', 'yyyy-MM-dd HH:mm:ss') AS p"
    ).collect()[0]
    assert row["f"] == "1997/03/15 08:30"
    assert str(row["p"]) == "2001-07-04 12:00:00"


def test_qw_rand_in_unit_interval(spark):
    rows = spark.sql(
        "SELECT QW_RAND() AS r FROM range(100)"
    ).collect()
    assert all(0.0 <= r["r"] < 1.0 for r in rows)
    assert len({round(r["r"], 9) for r in rows}) > 50  # actually varies
