"""JDBC keyed upsert: set-oriented restatement of the reference's
row-at-a-time insert-or-update sink
(core:sources/JDBCOutputSource.scala:62-80 — try INSERT, on 'duplicate'
error retry as UPDATE ... KEYED ON).

Spark-first shape: stage the batch into a scratch table with one
bulk ``df.write.jdbc`` (parallel executors, batched inserts), then one
vendor-appropriate set-based statement merges stage -> target on the
key columns. That is the only shape that scales: per-row
INSERT-catch-UPDATE round-trips die at 10^6 rows/batch.

Statement generation is pure and unit-tested here; execution needs the
vendor driver jar on the classpath (absent in this sandbox — the
execute path raises a clear error until the jar is provided).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

_DIALECTS = ("ansi", "postgresql", "mysql", "sqlite")


def dialect_for_url(url: str) -> str:
    """jdbc:postgresql://... -> 'postgresql'; unknown vendors get the
    ANSI/SQL:2003 MERGE (Oracle/MSSQL/DB2/H2 all accept it)."""
    for d in ("postgresql", "mysql", "sqlite"):
        if url.startswith(f"jdbc:{d}:"):
            return d
    return "ansi"


def _quoter(dialect: str):
    """Identifier quoting per vendor (MySQL's default sql_mode rejects
    double-quoted identifiers — it needs backticks). Schema-qualified
    names quote each dot segment separately so `public.users` stays a
    schema reference, matching the table Spark's stage write created."""
    if dialect == "mysql":
        def q(ident: str) -> str:
            return ".".join(
                "`" + p.replace("`", "``") + "`" for p in ident.split(".")
            )
    else:
        def q(ident: str) -> str:
            return ".".join(
                '"' + p.replace('"', '""') + '"' for p in ident.split(".")
            )
    return q


def upsert_statement(
    table: str, stage: str, columns: list[str], keys: list[str], dialect: str = "ansi"
) -> str:
    """One set-based statement applying ``stage`` into ``table`` keyed on
    ``keys`` (insert-or-update, the reference's UPSERT KEYED ON)."""
    if dialect not in _DIALECTS:
        raise ValueError(f"unknown dialect {dialect!r}; expected one of {_DIALECTS}")
    _q = _quoter(dialect)
    missing = [k for k in keys if k not in columns]
    if missing:
        raise ValueError(f"key columns not in column list: {missing}")
    non_keys = [c for c in columns if c not in keys]
    cols = ", ".join(_q(c) for c in columns)

    if dialect == "postgresql":
        conflict = ", ".join(_q(k) for k in keys)
        sets = ", ".join(f"{_q(c)} = EXCLUDED.{_q(c)}" for c in non_keys)
        action = f"DO UPDATE SET {sets}" if non_keys else "DO NOTHING"
        return (
            f"INSERT INTO {_q(table)} ({cols}) SELECT {cols} FROM {_q(stage)} "
            f"ON CONFLICT ({conflict}) {action}"
        )
    if dialect == "mysql":
        sets = ", ".join(f"{_q(c)} = new.{_q(c)}" for c in non_keys) or ", ".join(
            f"{_q(k)} = new.{_q(k)}" for k in keys
        )
        return (
            f"INSERT INTO {_q(table)} ({cols}) SELECT {cols} FROM {_q(stage)} AS new "
            f"ON DUPLICATE KEY UPDATE {sets}"
        )
    if dialect == "sqlite":
        conflict = ", ".join(_q(k) for k in keys)
        sets = ", ".join(f"{_q(c)} = excluded.{_q(c)}" for c in non_keys)
        action = f"DO UPDATE SET {sets}" if non_keys else "DO NOTHING"
        return (
            f"INSERT INTO {_q(table)} ({cols}) SELECT {cols} FROM {_q(stage)} "
            f"WHERE true ON CONFLICT ({conflict}) {action}"
        )
    # ANSI MERGE (SQL:2003)
    on = " AND ".join(f"t.{_q(k)} = s.{_q(k)}" for k in keys)
    sets = ", ".join(f"{_q(c)} = s.{_q(c)}" for c in non_keys)
    ins_vals = ", ".join(f"s.{_q(c)}" for c in columns)
    matched = f"WHEN MATCHED THEN UPDATE SET {sets} " if non_keys else ""
    return (
        f"MERGE INTO {_q(table)} t USING {_q(stage)} s ON {on} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({ins_vals})"
    )


def upsert_plan(
    url: str, table: str, columns: list[str], keys: list[str],
    dialect: str | None = None, stage: str | None = None,
) -> dict:
    """The full staged-upsert plan: stage table name, the merge
    statement, and the cleanup statement. Pure metadata (unit-testable
    without a driver jar)."""
    d = dialect or dialect_for_url(url)
    stage = stage or f"{table}_stage_{uuid.uuid4().hex[:8]}"
    return {
        "dialect": d,
        "stage_table": stage,
        "merge_sql": upsert_statement(table, stage, columns, keys, d),
        "cleanup_sql": f"DROP TABLE {_quoter(d)(stage)}",
    }


def jdbc_upsert(
    df: DataFrame, url: str, table: str, keys: list[str],
    dialect: str | None = None, properties: dict | None = None,
) -> dict:
    """Execute the staged upsert: bulk-write ``df`` to a scratch table,
    run the vendor merge through a driver-side JDBC connection, drop the
    stage. Requires the vendor jar (jar-gated in this sandbox)."""
    plan = upsert_plan(url, table, df.columns, keys, dialect)
    spark = df.sparkSession
    props = dict(properties or {})
    # 1. parallel bulk stage write (executors, batched)
    df.write.mode("overwrite").jdbc(url, plan["stage_table"], properties=props)
    # 2. one set-based merge through the driver's JVM — with the SAME
    # credentials the stage write used, and the scratch table dropped
    # even when the merge fails (no orphan stage tables on retries)
    jvm = spark.sparkContext._jvm
    jprops = jvm.java.util.Properties()
    for k, v in props.items():
        jprops.setProperty(str(k), str(v))
    conn = jvm.java.sql.DriverManager.getConnection(url, jprops)
    try:
        st = conn.createStatement()
        try:
            st.execute(plan["merge_sql"])
        finally:
            try:
                st.execute(plan["cleanup_sql"])
            except Exception:
                pass  # cleanup is best-effort; the merge error wins
            st.close()
    finally:
        conn.close()
    return plan
