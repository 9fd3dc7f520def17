"""Every suite query vs its DuckDB oracle at sf0.001 (the driver runs
the same comparison at sf0.01)."""

import pytest

from qwery_spark.oracle_compare import compare, duck_con
from qwery_spark.suite import REGISTRY

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_con(SF)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, con, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF).toPandas()
    if q.sql is None:
        assert len(sdf) >= 0  # rows-only check
        return
    ddf = con.execute(q.sql).df()
    problems = compare(sdf, ddf)
    assert not problems, f"{name}: " + " | ".join(problems)
