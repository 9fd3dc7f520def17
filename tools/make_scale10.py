"""Build a ~sf1.0-scale dataset by deterministic 10x replication of
sf0.1 — for OPTIMIZATION-round perf validation only (the driver
generates its own sf1.0 for measurement; /root/testdata is read-only
and untouched).

Replication is key-offset per replica (FK strides preserved) so join /
group cardinalities scale linearly. Two tables need more care than a
plain copy so the 10x corpus doesn't have a synthetic 10x duplicate
rate that the real generator would not produce:

  - documents: replica texts are RE-SAMPLED word salads from the sf0.1
    vocabulary (deterministic in doc_id), keeping each source row's
    word count — near-dup density stays at the natural rate instead of
    every doc having 9 exact clones.
  - embeddings: replica vectors get a tiny deterministic perturbation
    so no vector has exact clones (degenerate equal-cosine ties).

Usage: python tools/make_scale10.py [out_dir] [replicas]
Defaults: /root/testdata_x10/sf1.0, 10.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

STRIDES = {
    "events": {"event_id": 100_000, "user_id": 1_500},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {"l_orderkey": 150_000, "l_partkey": 20_000,
                 "l_suppkey": 1_000},
    "customer": {"c_custkey": 15_000},
    "part": {"p_partkey": 20_000},
    "supplier": {"s_suppkey": 1_000},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
COPY_ONCE = ["nation", "region"]


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata_x10/sf1.0"
    n_rep = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")

    for t in COPY_ONCE:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"copied {t}")

    # word vocabulary of the synthetic documents (small, spark-ish)
    con.execute(
        f"CREATE TEMP TABLE vocab AS SELECT DISTINCT unnest(string_split(text, ' ')) AS w "
        f"FROM '{SRC}/documents.parquet' WHERE text IS NOT NULL"
    )
    nv = con.execute("SELECT count(*) FROM vocab").fetchone()[0]
    con.execute(
        "CREATE TEMP TABLE vlist AS SELECT list(w ORDER BY w) AS ws FROM vocab"
    )
    print(f"vocab: {nv} words")

    for t, strides in STRIDES.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        parts = []
        for k in range(n_rep):
            sel = []
            for c in cols:
                if c in strides:
                    sel.append(f"{c} + {k * strides[c]} AS {c}")
                elif t == "documents" and c == "text" and k > 0:
                    # fresh word salad, same word count, deterministic
                    sel.append(
                        f"array_to_string(list_transform("
                        f"range(1, len(string_split(text, ' ')) + 1), "
                        f"i -> v.ws[1 + CAST(hash(doc_id + {k * strides['doc_id']}, i) % {nv} AS INTEGER)]"
                        f"), ' ') AS text"
                    )
                elif t == "documents" and c == "n_chars" and k > 0:
                    sel.append("0 AS n_chars")  # fixed below
                elif t == "embeddings" and c == "embedding" and k > 0:
                    sel.append(
                        f"list_transform(embedding, x -> x + "
                        f"CAST(CAST(hash(vec_id, {k}) % 1000 AS BIGINT) - 500 AS DOUBLE) * 1e-6) "
                        f"AS embedding"
                    )
                else:
                    sel.append(c)
            frm = f"'{SRC}/{t}.parquet'"
            if t == "documents":
                frm += ", vlist v"
            parts.append(f"SELECT {', '.join(sel)} FROM {frm}")
        q = " UNION ALL ".join(parts)
        if t == "documents":
            # n_chars tracks the regenerated text exactly as in sf0.1
            q = (
                f"SELECT * REPLACE (CASE WHEN n_chars = 0 THEN len(text) "
                f"ELSE n_chars END AS n_chars) FROM ({q})"
            )
        con.execute(
            f"COPY ({q}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out_dir}/{t}.parquet'"
        ).fetchone()[0]
        print(f"built {t}: {n} rows")
    open(os.path.join(out_dir, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
