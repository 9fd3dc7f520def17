"""Decompiler round-trip (reference parity:
core:QweryDecompiler.scala:15-23): render is a fixpoint of the
grammar, and the canonical text stays executable by ScriptEngine."""

import pytest

from qwery_spark.compiler.decompiler import decompile, parse_statement, render

# one sample per verb, deliberately messy (case, spacing, trailing ;)
SAMPLES = [
    "create lake if not exists '/tmp/t'  ( doc_id string,  v  int )  "
    "keyed on doc_id   buckets 8 mode mor codec zstd stats ( v );",
    "CREATE LAKE '/tmp/t' (id string, price decimal(12,2)) KEYED ON id",
    "drop lake IF EXISTS '/tmp/t';",
    "DROP LAKE '/tmp/t'",
    "alter lake '/tmp/t'   add column lang   string",
    "ALTER LAKE '/tmp/t' RENAME COLUMN a TO b",
    "alter lake '/tmp/t' widen column v to  bigint",
    "ALTER LAKE '/tmp/t' DROP COLUMN lang",
    "alter lake '/tmp/t' rebucket 32",
    "upsert into lake '/tmp/t' keyed on doc_id ordinal ord "
    "SELECT * FROM VALUES (1, 'a') AS t(ord, doc_id)",
    "UPDATE LAKE '/tmp/t' KEYED ON doc_id SELECT 'a' AS doc_id, 1L AS ordinal",
    "update lake '/tmp/t' set v = v + 1,  w = 2 keyed on doc_id "
    "ordinal 9 where v > 0",
    "DELETE FROM LAKE '/tmp/t' KEYED ON doc_id ORDINAL 5 WHERE v < 0",
    "compact lake '/tmp/t'  sort by ( doc_id )  drop tombstones",
    "COMPACT LAKE '/tmp/t' ZORDER BY (x, y)",
    "compact lake '/tmp/t'",
    "vacuum lake '/tmp/t' grace 0",
    "VACUUM LAKE '/tmp/t'",
    "expire snapshots '/tmp/t' keep 2",
    "SHOW SNAPSHOTS '/tmp/t'",
    "show changes '/tmp/t' from 1 to 5",
    "show lineage '/tmp/lin'  expecting 100000",
    "SHOW LINEAGE '/tmp/lin'",
    "SHOW CHANGES '/tmp/t' FROM 2 COARSE",
    "show changes '/tmp/t'  window 4",
    "replicate lake '/tmp/src'  into '/tmp/dst'  from 2 to 7 epoch 'w:7'",
    "REPLICATE LAKE '/tmp/src' INTO '/tmp/dst'",
    "DESCRIBE LAKE '/tmp/t'",
    "SELECT 1 AS x",  # sql passthrough
]


@pytest.mark.parametrize("s", SAMPLES)
def test_render_is_grammar_fixpoint(s):
    ast = parse_statement(s)
    canon = render(ast)
    assert parse_statement(canon) == ast
    assert decompile(canon) == canon  # idempotent


def test_every_verb_has_a_distinct_kind():
    kinds = {parse_statement(s).kind for s in SAMPLES}
    assert kinds >= {
        "create_lake", "drop_lake", "alter_lake", "upsert", "update_set",
        "delete", "compact", "vacuum", "expire", "show_snapshots",
        "show_changes", "replicate_lake", "describe_lake", "sql",
    }


def test_canonical_text_executes(spark, tmp_path):
    """The behavioral coupling to the engine: a full lifecycle script
    written in messy text, decompiled statement-by-statement, executes
    to the same final state as the original."""
    from qwery_spark.compiler.engine import ScriptEngine, split_statements
    from qwery_spark.lake.table import LakeTable

    def lifecycle(path):
        return f"""
        create lake '{path}'  ( doc_id string, v int )   keyed on doc_id
          buckets 4 mode mor stats ( v );
        upsert into lake '{path}' keyed on doc_id
          SELECT * FROM VALUES ('a', 1, 1L), ('b', 2, 2L) AS t(doc_id, v, ordinal);
        update lake '{path}' set v = v + 10 keyed on doc_id where doc_id = 'a';
        delete from lake '{path}' keyed on doc_id ordinal 99 where doc_id = 'b';
        alter lake '{path}' add column lang string;
        compact lake '{path}' sort by ( doc_id );
        expire snapshots '{path}' keep 1;
        vacuum lake '{path}' grace 0;
        """

    eng = ScriptEngine(spark)
    raw_path = str(tmp_path / "raw")
    eng.run_script(lifecycle(raw_path))

    canon_path = str(tmp_path / "canon")
    for stmt in split_statements(lifecycle(canon_path)):
        canon = decompile(stmt)
        eng.execute(canon)

    raw = sorted(map(tuple, LakeTable(raw_path).read(spark).collect()))
    canon = sorted(map(tuple, LakeTable(canon_path).read(spark).collect()))
    assert raw == canon and raw == [("a", 11, None)]


# property: parse(render(ast)) == ast over GENERATED ASTs (not just the
# hand-picked samples) for the fully-structured verbs
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _ident = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
    _path = st.from_regex(r"/tmp/[a-z0-9_]{1,12}", fullmatch=True)

    _create = st.fixed_dictionaries({
        "if_not_exists": st.booleans(),
        "path": _path,
        "columns": st.just("doc_id string, v int"),
        "key": st.just("doc_id"),
        "buckets": st.one_of(st.none(), st.integers(1, 4096)),
        "mode": st.one_of(st.none(), st.sampled_from(["mor", "cow"])),
        "codec": st.one_of(st.none(), st.sampled_from(["snappy", "zstd"])),
        "stats": st.one_of(st.none(), st.just(["v"])),
    }).map(lambda p: Stmt("create_lake", p))

    _compact = st.fixed_dictionaries({
        "path": _path,
        "cluster": st.sampled_from([None, "SORT", "ZORDER"]),
        "cols": st.lists(_ident, min_size=1, max_size=3, unique=True),
        "drop_tombstones": st.booleans(),
    }).map(lambda p: Stmt(
        "compact", {**p, "cols": p["cols"] if p["cluster"] else None}))

    _delete = st.fixed_dictionaries({
        "path": _path,
        "key": _ident,
        "ordinal": st.integers(0, 10**9),
        "where": st.one_of(st.none(), st.just("v > 0")),
    }).map(lambda p: Stmt("delete", p))

    from qwery_spark.compiler.decompiler import Stmt

    @settings(max_examples=150, deadline=None, derandomize=True)
    @given(st.one_of(_create, _compact, _delete))
    def test_generated_ast_round_trips(ast):
        assert parse_statement(render(ast)) == ast
except ImportError:  # pragma: no cover
    pass


def test_string_literals_survive_decompilation_verbatim():
    """SET assignments and WHERE predicates can carry string literals
    whose INNER whitespace is semantic — the canonical form must keep
    them byte-identical (review finding: _ws used to collapse them)."""
    s = (
        "update lake '/t' set note = 'a  b   c' keyed on doc_id "
        "where tag = 'x  y'"
    )
    ast = parse_statement(s)
    assert ast.props["assignments"] == "note = 'a  b   c'"
    assert ast.props["where"] == "tag = 'x  y'"
    canon = decompile(s)
    assert "'a  b   c'" in canon and "'x  y'" in canon

    d = "delete from lake '/t' keyed on doc_id ordinal 5 where note = 'p  q'"
    assert "'p  q'" in decompile(d)

    u = ("upsert into lake '/t' keyed on doc_id "
         "SELECT 'v  w' AS doc_id, 1L AS ordinal")
    assert "'v  w'" in decompile(u)


def test_alter_with_extra_spaces_still_canonicalizes():
    s = "alter  lake '/t'   rebucket 4"
    ast = parse_statement(s)
    assert ast.kind == "alter_lake" and ast.props["verb"] == "rebucket"
    assert decompile(s) == "ALTER LAKE '/t' REBUCKET 4"


def test_engine_and_decompiler_share_one_grammar():
    """Drift guard: both modules must reference the same compiled
    pattern objects."""
    import qwery_spark.compiler.decompiler as D
    import qwery_spark.compiler.engine as E
    from qwery_spark.compiler import grammar

    assert E.G is grammar and D.G is grammar
