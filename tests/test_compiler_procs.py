"""Procedures, CALL, UPDATE LAKE (matched-only), and block splitting."""

import pandas as pd
import pytest

from qwery_spark.compiler import ScriptEngine
from qwery_spark.compiler.engine import split_statements


def test_split_respects_begin_end():
    script = (
        "SET @x = 1; CREATE PROCEDURE p() AS BEGIN SELECT 1; SELECT 2; END; SELECT 3"
    )
    stmts = split_statements(script)
    assert len(stmts) == 3
    assert stmts[1].upper().startswith("CREATE PROCEDURE")
    assert "SELECT 2" in stmts[1]


@pytest.fixture()
def eng(spark):
    return ScriptEngine(spark)


def test_procedure_call_binds_args(eng, tmp_path):
    src = str(tmp_path / "nums.csv")
    pd.DataFrame({"n": range(20), "grp": ["a", "b"] * 10}).to_csv(src, index=False)
    results = eng.run_script(f"""
      CREATE PROCEDURE top_group(minval) AS BEGIN
        SELECT grp, COUNT(*) AS cnt FROM '{src}'
          WHERE CAST(n AS INT) >= @minval GROUP BY grp;
      END;
      CALL top_group(10)
    """)
    rows = {r["grp"]: r["cnt"] for r in results[-1].collect()}
    assert rows == {"a": 5, "b": 5}
    shows = eng.execute("SHOW PROCEDURES").collect()
    assert shows[0]["name"] == "top_group"


def test_call_restores_scope(eng):
    eng.execute("SET @v = 7")
    eng.execute("CREATE PROCEDURE setv(v) AS BEGIN SELECT @v AS x; END")
    out = eng.execute("CALL setv(99)")
    assert out.collect()[0]["x"] == 99
    assert eng.variables["v"] == 7  # restored


def test_update_lake_matched_only(eng, tmp_path):
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.schema import TARGET_SCHEMA

    path = str(tmp_path / "lake")
    LakeTable.create(path, TARGET_SCHEMA, n_buckets=4)
    eng.execute(
        f"UPSERT INTO LAKE '{path}' KEYED ON doc_id ORDINAL ord "
        "SELECT * FROM VALUES (1, 'a', array(1), 1, 'web') AS t(ord, doc_id, tokens, n_tok, source)"
    )
    res = eng.execute(
        f"UPDATE LAKE '{path}' KEYED ON doc_id ORDINAL ord "
        "SELECT * FROM VALUES "
        "(5, 'a', array(2, 2), 2, 'web'), "     # matched -> update
        "(6, 'zzz', array(9), 1, 'web') "       # unmatched -> no-op
        "AS t(ord, doc_id, tokens, n_tok, source)"
    ).collect()[0]
    tbl = LakeTable(path)
    state = tbl.read(eng.spark).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in state] == ["a"]
    assert list(state[0]["tokens"]) == [2, 2]
