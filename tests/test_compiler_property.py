"""Property-based tests (hypothesis, derandomized) for the statement
splitter and the quote-aware expander — the two compiler functions whose
round-1 bugs came from hand-rolled text scanning."""

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from qwery_spark.compiler.engine import split_commas, split_statements  # noqa: E402

# words that must NOT trip the BEGIN/END block tracker
TRICKY_WORDS = st.sampled_from(
    ["trend", "weekend", "end_time", "beginner", "ending", "append",
     "legend", "x", "col1", "suspend"]
)

# string literals that must never split a statement, including quotes
# escaped by doubling OR by backslash (Spark's default parser accepts
# both) and ; / @ / keywords inside
LITERALS = st.sampled_from(
    ["'a;b'", "\"x;y\"", "'it''s'", "'bob@example.com'", "'END'",
     "'BEGIN; END'", "'semi ; colon'",
     "'don\\'t; split'", '"say \\"hi;\\" now"', "'tail\\\\'"]
)


@st.composite
def simple_statement(draw):
    w = draw(TRICKY_WORDS)
    lit = draw(LITERALS)
    form = draw(st.integers(0, 2))
    if form == 0:
        return f"SELECT {w}, {lit} AS s FROM t"
    if form == 1:
        return f"SET @{w} = {lit}"
    return (
        f"CREATE PROCEDURE p_{w}() AS BEGIN "
        f"SELECT {w} FROM u; SELECT {lit} AS s; END"
    )


@settings(max_examples=200, derandomize=True)
@given(st.lists(simple_statement(), min_size=1, max_size=6))
def test_split_statements_count_roundtrip(stmts):
    """Joining N statements with ';' and splitting returns exactly N,
    regardless of literals, @-signs, or END-like identifiers inside."""
    script = "; ".join(stmts)
    out = split_statements(script)
    assert len(out) == len(stmts)
    for want, got in zip(stmts, out):
        assert got == want.strip()


@settings(max_examples=200, derandomize=True)
@given(st.lists(st.sampled_from(
    ["a", "'x,y'", "(1,2)", "JSON PATH (a,b)", "DELIMITER '|'", "f(g(','))"]),
    min_size=1, max_size=5))
def test_split_commas_respects_quotes_and_parens(parts):
    # nested parens beyond one level aren't in the hint grammar; filter
    joined = ",".join(parts)
    out = split_commas(joined)
    assert [p for p in out] == parts


@settings(max_examples=150, derandomize=True)
@given(
    st.text(alphabet="abc@ ;'\"x_", min_size=0, max_size=40),
)
def test_expand_preserves_quoted_regions(spark_engine, text):
    """Whatever @-garbage appears INSIDE balanced quotes survives expand
    verbatim; expand never raises for quoted-only @ patterns."""
    eng = spark_engine
    # build a statement with the fuzz text safely inside a single-quoted
    # literal (escape embedded quotes by doubling)
    lit = "'" + text.replace("'", "''") + "'"
    expanded = eng.expand(f"SELECT {lit} AS s")
    # the literal region must be untouched
    assert lit in expanded


@pytest.fixture(scope="module")
def spark_engine(spark):
    from qwery_spark.compiler import ScriptEngine

    return ScriptEngine(spark)


def test_backslash_escaped_quote_does_not_split(spark_engine):
    """Spark parses SELECT 'don\\'t' fine — the splitter and @var
    expansion must treat the escaped quote as literal-interior."""
    stmts = split_statements("SELECT 'don\\'t; really' AS s; SELECT 2 AS t")
    assert len(stmts) == 2
    assert stmts[0] == "SELECT 'don\\'t; really' AS s"
    # @-patterns inside the backslash-escaped literal survive expand
    eng = spark_engine
    out = eng.expand("SELECT 'a\\'@notavar' AS s")
    assert "@notavar" in out


@settings(max_examples=60, derandomize=True, deadline=None)
@given(st.text(alphabet="ab\\'\"\n\t%_ ;@", min_size=0, max_size=20))
def test_sql_literal_roundtrips_through_spark(spark_engine, value):
    """_sql_literal(v) must parse back to exactly v under Spark's default
    string-literal rules (backslash escapes interpreted) — including
    values ending in a backslash and containing \\n-like sequences."""
    from qwery_spark.compiler.engine import _sql_literal

    got = spark_engine.spark.sql(f"SELECT {_sql_literal(value)} AS v").first()["v"]
    assert got == value


def test_set_variable_with_backslash_value(spark_engine):
    eng = spark_engine
    eng.variables["p"] = "C:\\tmp\\new"
    row = eng.execute("SELECT @p AS path").first()
    assert row["path"] == "C:\\tmp\\new"
