"""Driver-style oracle checker: run every suite query on Spark AND its
SQL on DuckDB, compare row-count + schema-insensitive sorted values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from qwery_spark.oracle_compare import compare, duck_con  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    from qwery_spark.session import get_spark
    from qwery_spark.suite import REGISTRY

    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)
    con = duck_con(sf_dir)
    failures = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERROR {str(e)[:300]}")
            failures += 1
            continue
        if q.sql is None:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            ddf = con.execute(q.sql).df()
        except Exception as e:
            print(f"FAIL  {name}: DUCK ERROR {str(e)[:300]}")
            failures += 1
            continue
        problems = compare(sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL  {name}: " + " | ".join(problems))
        else:
            print(f"OK    {name}: {len(sdf)} rows")
    print(f"\n{failures} failures / {len(REGISTRY)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
