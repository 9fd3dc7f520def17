"""Deterministic seeded global shuffle (operators/shuffle.py)."""

import hashlib

from pyspark.sql import functions as F

from qwery_spark.operators.shuffle import shard_assignments, write_shards


def _df(spark, n=200):
    return spark.range(n).select(F.col("id").alias("doc_id"),
                                 (F.col("id") * 7).alias("payload"))


def _ref_order(n, seed, n_shards):
    rows = []
    for i in range(n):
        k = hashlib.md5(f"{seed}|{i}".encode()).hexdigest()
        rows.append((int(k[:8], 16) % n_shards, k, i))
    out = {}
    for shard in range(n_shards):
        members = sorted((k, i) for s, k, i in rows if s == shard)
        for pos, (k, i) in enumerate(members, 1):
            out[i] = (shard, pos)
    return out


def test_assignments_match_reference(spark):
    got = {r["doc_id"]: (r["shard"], r["pos"])
           for r in shard_assignments(_df(spark), "doc_id", 42, 8).collect()}
    assert got == _ref_order(200, 42, 8)


def test_different_seed_different_order(spark):
    a = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shard_assignments(_df(spark), "doc_id", 1, 8).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in shard_assignments(_df(spark), "doc_id", 2, 8).collect()}
    assert a != b
    # but each is internally consistent: every shard has positions 1..n
    for m in (a, b):
        by_shard = {}
        for shard, pos in m.values():
            by_shard.setdefault(shard, []).append(pos)
        for poss in by_shard.values():
            assert sorted(poss) == list(range(1, len(poss) + 1))


def test_write_shards_layout_and_order(spark, tmp_table_dir):
    write_shards(_df(spark), "doc_id", 42, 4, tmp_table_dir + "/out")
    ref = _ref_order(200, 42, 4)
    out = spark.read.parquet(tmp_table_dir + "/out")
    assert out.count() == 200
    # each shard dir holds exactly its members, in shuffle order
    for shard in range(4):
        members = [i for i, (s, _) in ref.items() if s == shard]
        got = [r["doc_id"] for r in
               out.filter(F.col("shard") == shard).collect()]
        want_order = sorted(
            members,
            key=lambda i: (hashlib.md5(f"42|{i}".encode()).hexdigest(), i),
        )
        assert got == want_order
    # payload survives alongside the ordering
    row = out.filter(F.col("doc_id") == 3).first()
    assert row["payload"] == 21
