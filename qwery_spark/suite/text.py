"""Training-data pipeline operators over `documents`: deduplication
(exact, minhash-LSH, simhash, ngram-jaccard), text quality, language
ID, token counting, fingerprinting. Thin wrappers over
qwery_spark.operators.* with DuckDB oracle SQL.

Engine-parity trick for oracle checking: every hash used here is md5
(bit-identical in Spark and DuckDB), never engine-local hash functions.

All 500 driver texts are distinct, so dedup queries build a corpus with
KNOWN duplicates deterministically: documents UNION a copy with
doc_id+100000 (exact dups) UNION a copy with doc_id+200000 whose last
word is stripped (near dups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from qwery_spark.operators.dedupe import (
    exact_duplicates,
    minhash_candidates,
    minhash_signatures,
    ngram_jaccard,
    simhash64,
)
from qwery_spark.operators.text import (
    fingerprint,
    marker_lang_scores,
    quality_score,
    repetition_stats,
    token_budget_sample,
    token_stats,
    wordfreq_logprob,
)
from qwery_spark.suite import load, load_spread, register

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")
_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"

_CORPUS_SQL = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 200000 AS doc_id,
             regexp_replace(text, '\\s+\\S+$', '') AS text
      FROM documents
"""


def _corpus(spark, sf_dir, spread: bool = False) -> DataFrame:
    # spread=True pre-repartitions the raw documents before deriving —
    # for consumers whose downstream is md5-per-ngram shingling that
    # would otherwise run inside the single document file's few scan
    # tasks (suite.load_spread). Cheap consumers (dedup_exact's one md5
    # per row) keep the unspread single-Exchange plan (plan-gated).
    d = (
        load_spread(spark, sf_dir, "documents", "doc_id")
        if spread else load(spark, sf_dir, "documents")
    ).select("doc_id", "text")
    exact = d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    near = d.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.regexp_replace("text", r"\s+\S+$", "").alias("text"),
    )
    return d.unionAll(exact).unionAll(near)


# ---------------- exact dedup ----------------
@register(
    "dedup_exact",
    f"""
    SELECT md5(text) AS text_hash, count(*) AS n_copies, min(doc_id) AS keeper
    FROM ({_CORPUS_SQL}) c
    GROUP BY md5(text) HAVING count(*) > 1
    """,
    doc="Exact dedup: hash-groupBy on md5(text). At 100TB: one shuffle on "
    "the digest (uniform keys, no skew), partial-agg combines map-side; "
    "keeper = min(doc_id) makes the survivor deterministic.",
)
def dedup_exact(spark, sf_dir):
    return exact_duplicates(_corpus(spark, sf_dir), "doc_id", "text")


# ---------------- minhash + LSH banding ----------------
_NBANDS = 8

_SHINGLE_SQL = f"""
      SELECT doc_id, h,
             CAST(('0x' || substr(h, 1, 2)) AS INTEGER) % {_NBANDS} AS band
      FROM (
        SELECT doc_id, md5(unnest(list_transform(
                 range(1, len(ws) - 1),
                 i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2])))) AS h
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS ws
              FROM ({_CORPUS_SQL}) c) w
        WHERE len(ws) >= 3
      ) s
"""


@register(
    "dedup_minhash_signatures",
    f"""
    SELECT doc_id, band, min(h) AS minhash
    FROM ({_SHINGLE_SQL}) b
    GROUP BY doc_id, band
    """,
    doc="MinHash sketch: per (doc, band) minimum of md5(shingle) — the "
    "banded signature. shingle->explode->groupBy is one shuffle on "
    "(doc_id, band); partial min combines map-side.",
)
def dedup_minhash_signatures(spark, sf_dir):
    return minhash_signatures(_corpus(spark, sf_dir, spread=True), "doc_id", "text", _NBANDS)


@register(
    "dedup_minhash_candidates",
    f"""
    WITH sig AS (
      SELECT doc_id, band, min(h) AS minhash
      FROM ({_SHINGLE_SQL}) b GROUP BY doc_id, band
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(DISTINCT a.band) AS bands_hit
    FROM sig a JOIN sig b
      ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
    doc="LSH candidate pairs: bucket-join on (band, minhash). The join key "
    "includes the signature so only genuine band collisions pair up — "
    "at scale this is the standard band-bucket shuffle, never O(n^2).",
)
def dedup_minhash_candidates(spark, sf_dir):
    return minhash_candidates(_corpus(spark, sf_dir, spread=True), "doc_id", "text", _NBANDS)


# ---------------- incremental dedup via the persisted signature index --
# Deterministic 3-epoch lifecycle over the known-dup corpus, split by a
# cross-engine md5 byte (h2 = first md5 byte of str(doc_id)):
#   epoch 0 : docs with h2 % 5 != 0                    -> build index
#   epoch 1 : adds   h2 % 5 == 0
#             updates h2 % 5 != 0 and h2 % 7 == 1 (text gets a suffix)
#             deletes h2 % 5 != 0 and h2 % 7 == 2
# The index is maintained INCREMENTALLY from the docs table's change
# feed (only epoch-1 docs re-shingle); the oracle recomputes candidates
# from scratch over the final corpus — value equality proves
# incremental == batch.
_INC_UPD_SUFFIX = " refreshed tail tokens"

_INC_FINAL_SQL = f"""
      SELECT doc_id,
             CASE WHEN h2 % 5 <> 0 AND h2 % 7 = 1
                  THEN text || '{_INC_UPD_SUFFIX}' ELSE text END AS text
      FROM (
        SELECT doc_id, text,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                    AS INTEGER) AS h2
        FROM ({_CORPUS_SQL}) c
      ) t
      WHERE NOT (h2 % 5 <> 0 AND h2 % 7 = 2)
"""

_INC_SHINGLE_SQL = f"""
      SELECT doc_id, h,
             CAST(('0x' || substr(h, 1, 2)) AS INTEGER) % {_NBANDS} AS band
      FROM (
        SELECT doc_id, md5(unnest(list_transform(
                 range(1, len(ws) - 1),
                 i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2])))) AS h
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS ws
              FROM ({_INC_FINAL_SQL}) f) w
        WHERE len(ws) >= 3
      ) s
"""


@register(
    "dedup_incremental_candidates",
    f"""
    WITH sig AS (
      SELECT doc_id, band, min(h) AS minhash
      FROM ({_INC_SHINGLE_SQL}) b GROUP BY doc_id, band
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           count(DISTINCT a.band) AS bands_hit
    FROM sig a JOIN sig b
      ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
    doc="Incremental dedup over a PERSISTED MinHash signature index "
    "(operators/sigindex.py): build from epoch 0 of a CDC docs table, "
    "then maintain from the change feed — epoch 1's adds/updates "
    "re-shingle and deletes tombstone, the corpus is never rescanned. "
    "Candidates come from the durable index (no localCheckpoint, no "
    "signature recomputation); the oracle recomputes from scratch over "
    "the final corpus, so a value match proves incremental == batch.",
)
def dedup_incremental_candidates(spark, sf_dir):
    import hashlib
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from qwery_spark.lake.merge import append_changes
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.operators.sigindex import (
        build_signature_index,
        index_candidates,
        update_signature_index,
    )

    h2 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    tagged = _corpus(spark, sf_dir, spread=True).select(
        F.col("doc_id").cast("long").alias("doc_id"), "text", h2.alias("h2")
    )

    tag = hashlib.md5(f"{sf_dir}|inc_cand".encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"qwery_inc_cand_{tag}")
    d = tempfile.mkdtemp(prefix="qwery_inc_cand_tbl_")
    try:
        docs = LakeTable.create(
            d + "/docs",
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("text", T.StringType()),
                ]
            ),
            n_buckets=8,
            key_col="doc_id",
            write_mode="mor",
        )
        ep0 = tagged.filter(F.col("h2") % 5 != 0).select(
            "doc_id", "text", F.lit("U").alias("op"),
            F.col("doc_id").alias("ordinal"),
        )
        append_changes(spark, docs, ep0)
        v1 = docs.current_version()
        idx = build_signature_index(
            spark, docs, d + "/idx", n_bands=_NBANDS, n_buckets=8
        )
        adds = tagged.filter(F.col("h2") % 5 == 0).select(
            "doc_id", "text", F.lit("U").alias("op"),
            (F.col("doc_id") + 1_000_000).alias("ordinal"),
        )
        upd = tagged.filter(
            (F.col("h2") % 5 != 0) & (F.col("h2") % 7 == 1)
        ).select(
            "doc_id",
            F.concat("text", F.lit(_INC_UPD_SUFFIX)).alias("text"),
            F.lit("U").alias("op"),
            (F.col("doc_id") + 2_000_000).alias("ordinal"),
        )
        dels = tagged.filter(
            (F.col("h2") % 5 != 0) & (F.col("h2") % 7 == 2)
        ).select(
            "doc_id",
            F.lit(None).cast("string").alias("text"),
            F.lit("D").alias("op"),
            (F.col("doc_id") + 3_000_000).alias("ordinal"),
        )
        append_changes(spark, docs, adds.unionAll(upd).unionAll(dels))
        update_signature_index(
            spark, docs, idx, from_version=v1, n_bands=_NBANDS
        )
        index_candidates(spark, idx).write.mode("overwrite").parquet(out_dir)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.read.parquet(out_dir)


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH grams AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, len(ws) - 1),
               i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))) AS gs
      FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS ws
            FROM ({_CORPUS_SQL}) c) w
      WHERE len(ws) >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.gs, b.gs)) AS DOUBLE) /
                 len(list_distinct(list_concat(a.gs, b.gs))), 6) AS jaccard
    FROM grams a JOIN grams b ON b.doc_id = a.doc_id + 200000
    """,
    doc="n-gram Jaccard verification on candidate pairs (here: each doc vs "
    "its near-dup twin). At scale this runs AFTER LSH pruning, on "
    "candidates only — never all-pairs.",
)
def dedup_ngram_jaccard(spark, sf_dir):
    corpus = _corpus(spark, sf_dir, spread=True)
    base = load(spark, sf_dir, "documents")
    pairs = base.select(
        F.col("doc_id").alias("doc_a"), (F.col("doc_id") + 200000).alias("doc_b")
    )
    return ngram_jaccard(pairs, corpus, "doc_id", "text")


# ---------------- simhash (64-bit, md5-derived) ----------------
def _simhash_oracle_sql() -> str:
    """Generate the 64-term SimHash SQL (mirrors operators.dedupe.simhash64
    bit-for-bit: nibble b//4 of md5(word), bit b%4, sign-sum, sign bit)."""
    per_bit_sums = ",\n        ".join(
        f"sum(CASE WHEN (CAST(('0x' || substr(h, {b // 4 + 1}, 1)) AS INTEGER) "
        f">> {b % 4}) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(64)
    )
    sig_terms = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({2**b if b < 63 else -(2**63)} AS BIGINT) "
        f"ELSE 0 END)"
        for b in range(64)
    )
    return f"""
    WITH words AS (
      SELECT doc_id, md5(unnest(string_split_regex(text, '\\s+'))) AS h
      FROM ({_CORPUS_SQL}) c
    ),
    sums AS (
      SELECT doc_id,
        {per_bit_sums}
      FROM words GROUP BY doc_id
    )
    SELECT doc_id, {sig_terms} AS simhash FROM sums
    """


@register(
    "dedup_simhash",
    _simhash_oracle_sql(),
    doc="64-bit SimHash per doc: sign-sum of md5 bits over words — one "
    "explode + one partial-agg'd groupBy carrying 64 longs per key. "
    "Exact copies collide; near-dups land within small hamming distance "
    "(blocked-signature join gives the candidate pairs at scale).",
)
def dedup_simhash(spark, sf_dir):
    return simhash64(_corpus(spark, sf_dir, spread=True), "doc_id", "text")


# ---------------- text analysis ----------------
# ---------------- incremental materialized aggregate (CDC rollup) ----
# Same deterministic 2-epoch lifecycle pattern as the signature index,
# over (doc_id, lang, n_chars): epoch 1 adds docs, MOVES some docs to a
# new group (lang='moved', n_chars+1000), deletes others. The rollup is
# maintained purely from the change feed's preimage/postimage rows
# (subtract old group, add new group); the oracle recomputes the
# grouped aggregate from scratch over the final corpus.
_AGG_FINAL_SQL = """
      SELECT doc_id,
             CASE WHEN h2 % 4 <> 0 AND h2 % 5 = 1 THEN 'moved' ELSE lang END AS lang,
             CASE WHEN h2 % 4 <> 0 AND h2 % 5 = 1 THEN n_chars + 1000
                  ELSE n_chars END AS n_chars
      FROM (
        SELECT doc_id, lang, n_chars,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                    AS INTEGER) AS h2
        FROM documents
      ) t
      WHERE NOT (h2 % 4 <> 0 AND h2 % 5 = 2)
"""


@register(
    "cdc_incremental_agg",
    f"""
    SELECT lang, count(*) AS n_rows,
           CAST(sum(n_chars) AS DOUBLE) AS sum_n_chars
    FROM ({_AGG_FINAL_SQL}) f
    GROUP BY lang
    """,
    doc="Incrementally maintained materialized aggregate "
    "(operators/materialize.py): a per-lang count/sum rollup lake table "
    "built at epoch 0, then updated from ONE change-feed window "
    "(include_preimages=True — update_preimage rows subtract the old "
    "group, postimage rows add the new, so group-moving updates need no "
    "special casing; deletes subtract their preimage). The oracle "
    "recomputes the aggregate from scratch over the final corpus: value "
    "equality proves the incremental view maintenance is exact. At "
    "100 TB the refresh costs one window-sized shuffle, never a base "
    "table scan.",
)
def cdc_incremental_agg(spark, sf_dir):
    import hashlib
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from qwery_spark.lake.merge import append_changes
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.operators.materialize import build_agg, update_agg

    h2 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    tagged = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang",
        F.col("n_chars").cast("long").alias("n_chars"), h2.alias("h2"),
    )

    tag = hashlib.md5(f"{sf_dir}|inc_agg".encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"qwery_inc_agg_{tag}")
    d = tempfile.mkdtemp(prefix="qwery_inc_agg_tbl_")
    try:
        src = LakeTable.create(
            d + "/src",
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("lang", T.StringType()),
                    T.StructField("n_chars", T.LongType()),
                ]
            ),
            n_buckets=8,
            key_col="doc_id",
            write_mode="mor",
        )
        ep0 = tagged.filter(F.col("h2") % 4 != 0).select(
            "doc_id", "lang", "n_chars", F.lit("U").alias("op"),
            F.col("doc_id").alias("ordinal"),
        )
        append_changes(spark, src, ep0)
        v1 = src.current_version()
        agg = build_agg(spark, src, d + "/agg", "lang", ["n_chars"])
        adds = tagged.filter(F.col("h2") % 4 == 0).select(
            "doc_id", "lang", "n_chars", F.lit("U").alias("op"),
            (F.col("doc_id") + 1_000_000).alias("ordinal"),
        )
        moves = tagged.filter(
            (F.col("h2") % 4 != 0) & (F.col("h2") % 5 == 1)
        ).select(
            "doc_id", F.lit("moved").alias("lang"),
            (F.col("n_chars") + 1000).alias("n_chars"),
            F.lit("U").alias("op"),
            (F.col("doc_id") + 2_000_000).alias("ordinal"),
        )
        dels = tagged.filter(
            (F.col("h2") % 4 != 0) & (F.col("h2") % 5 == 2)
        ).select(
            "doc_id", F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("long").alias("n_chars"),
            F.lit("D").alias("op"),
            (F.col("doc_id") + 3_000_000).alias("ordinal"),
        )
        append_changes(spark, src, adds.unionAll(moves).unionAll(dels))
        update_agg(spark, src, agg, "lang", ["n_chars"], from_version=v1)
        agg.read(spark).select(
            "lang", "n_rows", F.col("sum_n_chars")
        ).write.mode("overwrite").parquet(out_dir)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.read.parquet(out_dir)


@register(
    "cdc_incremental_agg_minmax",
    f"""
    SELECT lang, count(*) AS n_rows,
           CAST(min(n_chars) AS DOUBLE) AS min_n_chars,
           CAST(max(n_chars) AS DOUBLE) AS max_n_chars
    FROM ({_AGG_FINAL_SQL}) f
    GROUP BY lang
    """,
    doc="MIN/MAX materialized aggregate with retraction fallback "
    "(operators/materialize.update_agg(min_cols=/max_cols=)): same "
    "2-epoch lifecycle as cdc_incremental_agg but applied as TWO "
    "in-order windows — adds+group-moves (retracting moved docs' old "
    "values, some of which ARE their group's extremum), then deletes "
    "(certainly deleting group maxima). Additions tighten min/max "
    "in-delta; only groups whose stored extremum was retracted are "
    "recomputed from the base (semi-join on affected groups, "
    "col-stats-prunable). The DuckDB oracle recomputes min/max from "
    "scratch over the final corpus — value equality proves the "
    "retraction fallback exact, including delete-the-max windows.",
)
def cdc_incremental_agg_minmax(spark, sf_dir):
    import hashlib
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from qwery_spark.lake.merge import append_changes
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.operators.materialize import build_agg, update_agg

    h2 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    tagged = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang",
        F.col("n_chars").cast("long").alias("n_chars"), h2.alias("h2"),
    )
    mm = dict(min_cols=["n_chars"], max_cols=["n_chars"])

    tag = hashlib.md5(f"{sf_dir}|inc_agg_mm".encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"qwery_inc_agg_mm_{tag}")
    d = tempfile.mkdtemp(prefix="qwery_inc_agg_mm_tbl_")
    try:
        src = LakeTable.create(
            d + "/src",
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("lang", T.StringType()),
                    T.StructField("n_chars", T.LongType()),
                ]
            ),
            n_buckets=8,
            key_col="doc_id",
            write_mode="mor",
        )
        ep0 = tagged.filter(F.col("h2") % 4 != 0).select(
            "doc_id", "lang", "n_chars", F.lit("U").alias("op"),
            F.col("doc_id").alias("ordinal"),
        )
        append_changes(spark, src, ep0)
        v1 = src.current_version()
        agg = build_agg(spark, src, d + "/agg", "lang", [], **mm)
        adds = tagged.filter(F.col("h2") % 4 == 0).select(
            "doc_id", "lang", "n_chars", F.lit("U").alias("op"),
            (F.col("doc_id") + 1_000_000).alias("ordinal"),
        )
        moves = tagged.filter(
            (F.col("h2") % 4 != 0) & (F.col("h2") % 5 == 1)
        ).select(
            "doc_id", F.lit("moved").alias("lang"),
            (F.col("n_chars") + 1000).alias("n_chars"),
            F.lit("U").alias("op"),
            (F.col("doc_id") + 2_000_000).alias("ordinal"),
        )
        # window A: adds + group-moves (each move retracts its old
        # group's value — extremum hits trigger per-group recompute)
        append_changes(spark, src, adds.unionAll(moves))
        v2 = src.current_version()
        update_agg(spark, src, agg, "lang", [], from_version=v1, **mm)
        # window B: deletes — guaranteed to retract some group's max
        dels = tagged.filter(
            (F.col("h2") % 4 != 0) & (F.col("h2") % 5 == 2)
        ).select(
            "doc_id", F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("long").alias("n_chars"),
            F.lit("D").alias("op"),
            (F.col("doc_id") + 3_000_000).alias("ordinal"),
        )
        append_changes(spark, src, dels)
        update_agg(spark, src, agg, "lang", [], from_version=v2, **mm)
        agg.read(spark).select(
            "lang", "n_rows", "min_n_chars", "max_n_chars"
        ).write.mode("overwrite").parquet(out_dir)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.read.parquet(out_dir)


# ---------------- incremental materialized JOIN view --------------
# Two lake tables (fact = documents keyed by doc_id with fk `source`,
# dim = the 20 sources keyed by source) and ONE combined change window
# touching both sides: left adds/fk-moves/deletes + dim weight
# updates (fanning out to every doc of that source), a dim delete
# (dropping its docs from the inner view), and a dim insert arriving
# in the same window the fk-moves start pointing at it. The view is
# maintained with the delta-join decomposition (operators/joinview.py)
# — never recomputed — and the oracle recomputes the join from scratch
# over both final states.
_JOIN_LEFT_FINAL_SQL = """
      SELECT doc_id,
             CASE WHEN h2 % 4 <> 0 AND h2 % 5 = 1 THEN 'src_moved'
                  ELSE source END AS source,
             CASE WHEN h2 % 4 <> 0 AND h2 % 5 = 1 THEN n_chars + 1000
                  ELSE n_chars END AS n_chars
      FROM (
        SELECT doc_id, source, n_chars,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                    AS INTEGER) AS h2
        FROM documents
      ) t
      WHERE NOT (h2 % 4 <> 0 AND h2 % 5 = 2)
"""
_JOIN_DIM_FINAL_SQL = """
      SELECT source,
             CAST(CASE WHEN sfx % 2 = 0 THEN sfx + 100 ELSE sfx END
                  AS BIGINT) AS weight
      FROM (SELECT DISTINCT source,
                   CAST(substr(source, 4) AS INTEGER) AS sfx
            FROM documents) d
      WHERE sfx % 5 <> 3
      UNION ALL
      SELECT 'src_moved', CAST(999 AS BIGINT)
"""


@register(
    "cdc_incremental_join",
    f"""
    SELECT l.doc_id, l.source, CAST(l.n_chars AS BIGINT) AS n_chars,
           d.weight
    FROM ({_JOIN_LEFT_FINAL_SQL}) l
    JOIN ({_JOIN_DIM_FINAL_SQL}) d USING (source)
    """,
    doc="Incrementally maintained materialized JOIN view "
    "(operators/joinview.py): fact docs enriched with a per-source dim "
    "weight, built once and then maintained from ONE combined change "
    "window via the delta-join decomposition — affected keys = "
    "keys(dL) + live fact rows whose fk is in keys(dR); only those are "
    "recomputed (key-hull-pruned base read + broadcast-semi-joined dim "
    "slice) and LWW-merged (upserts + cascade deletes). Exercises fk "
    "moves to a dim key inserted in the SAME window, dim-delete "
    "cascades, and dim-update fan-out. The oracle recomputes the join "
    "from scratch over both final states: value equality proves the "
    "maintenance exact. At 100 TB the refresh costs O(window + dim "
    "fan-out), never a two-table re-join.",
)
def cdc_incremental_join(spark, sf_dir):
    import hashlib
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from qwery_spark.lake.merge import append_changes
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.operators.joinview import build_join, update_join

    h2 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    tagged = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "source",
        F.col("n_chars").cast("long").alias("n_chars"), h2.alias("h2"),
    )
    sfx = F.substring("source", 4, 10).cast("int")
    dims = (
        load(spark, sf_dir, "documents")
        .select("source").distinct()
        .select("source", sfx.cast("long").alias("weight"),
                sfx.alias("sfx"))
    )

    tag = hashlib.md5(f"{sf_dir}|inc_join".encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"qwery_inc_join_{tag}")
    d = tempfile.mkdtemp(prefix="qwery_inc_join_tbl_")
    try:
        left = LakeTable.create(
            d + "/fact",
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("source", T.StringType()),
                    T.StructField("n_chars", T.LongType()),
                ]
            ),
            n_buckets=8, key_col="doc_id", write_mode="mor",
        )
        right = LakeTable.create(
            d + "/dim",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("weight", T.LongType()),
                ]
            ),
            n_buckets=2, key_col="source", write_mode="cow",
        )
        ep0 = tagged.filter(F.col("h2") % 4 != 0).select(
            "doc_id", "source", "n_chars", F.lit("U").alias("op"),
            F.col("doc_id").alias("ordinal"),
        )
        append_changes(spark, left, ep0)
        append_changes(spark, right, dims.select(
            "source", "weight", F.lit("U").alias("op"),
            F.col("sfx").cast("long").alias("ordinal"),
        ))
        vl, vr = left.current_version(), right.current_version()
        view = build_join(
            spark, left, right, d + "/view", "source",
            ["n_chars"], ["weight"],
        )
        # ---- left window ----
        adds = tagged.filter(F.col("h2") % 4 == 0).select(
            "doc_id", "source", "n_chars", F.lit("U").alias("op"),
            (F.col("doc_id") + 1_000_000).alias("ordinal"),
        )
        moves = tagged.filter(
            (F.col("h2") % 4 != 0) & (F.col("h2") % 5 == 1)
        ).select(
            "doc_id", F.lit("src_moved").alias("source"),
            (F.col("n_chars") + 1000).alias("n_chars"),
            F.lit("U").alias("op"),
            (F.col("doc_id") + 2_000_000).alias("ordinal"),
        )
        dels = tagged.filter(
            (F.col("h2") % 4 != 0) & (F.col("h2") % 5 == 2)
        ).select(
            "doc_id", F.lit(None).cast("string").alias("source"),
            F.lit(None).cast("long").alias("n_chars"),
            F.lit("D").alias("op"),
            (F.col("doc_id") + 3_000_000).alias("ordinal"),
        )
        append_changes(spark, left, adds.unionAll(moves).unionAll(dels))
        # ---- right window: weight bump (even suffix), dim delete
        # (suffix % 5 == 3), and the fk-move target's insert ----
        dim_upd = dims.filter(F.col("sfx") % 2 == 0).select(
            "source", (F.col("weight") + 100).alias("weight"),
            F.lit("U").alias("op"),
            (F.col("sfx") + 1_000).cast("long").alias("ordinal"),
        )
        dim_del = dims.filter(F.col("sfx") % 5 == 3).select(
            "source", F.lit(None).cast("long").alias("weight"),
            F.lit("D").alias("op"),
            (F.col("sfx") + 2_000).cast("long").alias("ordinal"),
        )
        dim_ins = spark.createDataFrame(
            [("src_moved", 999, "U", 3_000)],
            "source string, weight long, op string, ordinal long",
        )
        append_changes(spark, right,
                       dim_upd.unionAll(dim_del).unionAll(dim_ins))
        update_join(spark, left, right, view, "source",
                    ["n_chars"], ["weight"], vl, vr)
        view.read(spark).select(
            "doc_id", "source", "n_chars", "weight"
        ).write.mode("overwrite").parquet(out_dir)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.read.parquet(out_dir)


@register(
    "cdc_scd2_materialized",
    """
    WITH t AS (
      SELECT doc_id, lang, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                  AS INTEGER) AS h2
      FROM documents
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(doc_id AS BIGINT) AS valid_from,
           CAST(CASE WHEN h2 % 5 = 1 THEN doc_id + 2000000
                     WHEN h2 % 5 = 2 THEN doc_id + 3000000 END
                AS BIGINT) AS valid_to
    FROM t
    UNION ALL
    SELECT doc_id, lang, CAST(n_chars + 1000 AS BIGINT) AS n_chars,
           CAST(doc_id + 2000000 AS BIGINT) AS valid_from,
           CAST(NULL AS BIGINT) AS valid_to
    FROM t WHERE h2 % 5 = 1
    """,
    doc="Incrementally maintained SCD2 history "
    "(operators/materialize.build_scd2/update_scd2): every key version "
    "is a history row (valid_from/valid_to ordinal range) kept current "
    "purely from the change feed's preimage/postimage rows — updates "
    "close the old version in place and open a new one, deletes close "
    "it at the tombstone ordinal; the history table is NEVER read "
    "during maintenance. The oracle constructs the expected history "
    "directly from the deterministic lifecycle.",
)
def cdc_scd2_materialized(spark, sf_dir):
    import hashlib
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from qwery_spark.lake.merge import append_changes
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.operators.materialize import build_scd2, update_scd2

    h2 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    tagged = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang",
        F.col("n_chars").cast("long").alias("n_chars"), h2.alias("h2"),
    )

    tag = hashlib.md5(f"{sf_dir}|scd2".encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"qwery_scd2_{tag}")
    d = tempfile.mkdtemp(prefix="qwery_scd2_tbl_")
    try:
        src = LakeTable.create(
            d + "/src",
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("lang", T.StringType()),
                    T.StructField("n_chars", T.LongType()),
                ]
            ),
            n_buckets=8,
            key_col="doc_id",
            write_mode="mor",
        )
        ep0 = tagged.select(
            "doc_id", "lang", "n_chars", F.lit("U").alias("op"),
            F.col("doc_id").alias("ordinal"),
        )
        append_changes(spark, src, ep0)
        v1 = src.current_version()
        hist = build_scd2(spark, src, d + "/hist")
        upd = tagged.filter(F.col("h2") % 5 == 1).select(
            "doc_id", "lang", (F.col("n_chars") + 1000).alias("n_chars"),
            F.lit("U").alias("op"),
            (F.col("doc_id") + 2_000_000).alias("ordinal"),
        )
        dels = tagged.filter(F.col("h2") % 5 == 2).select(
            "doc_id", F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("long").alias("n_chars"),
            F.lit("D").alias("op"),
            (F.col("doc_id") + 3_000_000).alias("ordinal"),
        )
        append_changes(spark, src, upd.unionAll(dels))
        update_scd2(spark, src, hist, from_version=v1)
        hist.read(spark).select(
            "doc_id", "lang", "n_chars", "valid_from", "valid_to"
        ).write.mode("overwrite").parquet(out_dir)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.read.parquet(out_dir)


@register(
    "cdc_scd2_fidelity",
    """
    WITH t AS (
      SELECT doc_id, lang, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                  AS INTEGER) AS h2
      FROM documents
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(doc_id AS BIGINT) AS valid_from,
           CAST(CASE WHEN h2 % 5 = 1 THEN doc_id + 2000000
                     WHEN h2 % 5 = 2 THEN doc_id + 4000000 END
                AS BIGINT) AS valid_to
    FROM t
    UNION ALL
    SELECT doc_id, 'moved', CAST(n_chars + 1000 AS BIGINT) AS n_chars,
           CAST(doc_id + 2000000 AS BIGINT) AS valid_from,
           CAST(doc_id + 3000000 AS BIGINT) AS valid_to
    FROM t WHERE h2 % 5 = 1
    UNION ALL
    SELECT doc_id, 'moved2', CAST(n_chars + 2000 AS BIGINT) AS n_chars,
           CAST(doc_id + 3000000 AS BIGINT) AS valid_from,
           CAST(NULL AS BIGINT) AS valid_to
    FROM t WHERE h2 % 5 = 1
    """,
    doc="SCD2 mid-window fidelity (r4 verdict task 7): the same keys "
    "change TWICE across separate commits, then the history is "
    "maintained per-commit (granular windows, the follow_changes "
    "delivery shape) — so the MIDDLE version, which a coarse "
    "endpoint-diff window would never materialize (it appears and dies "
    "inside the window), gets its own history row with exact "
    "valid_from/valid_to ordinal bounds. The oracle enumerates the "
    "FULL expected version history, not just the final state.",
)
def cdc_scd2_fidelity(spark, sf_dir):
    import hashlib
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from qwery_spark.lake.merge import append_changes
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.operators.materialize import build_scd2, update_scd2

    h2 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    tagged = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang",
        F.col("n_chars").cast("long").alias("n_chars"), h2.alias("h2"),
    )

    tag = hashlib.md5(f"{sf_dir}|scd2fid".encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"qwery_scd2fid_{tag}")
    d = tempfile.mkdtemp(prefix="qwery_scd2fid_tbl_")
    try:
        src = LakeTable.create(
            d + "/src",
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("lang", T.StringType()),
                    T.StructField("n_chars", T.LongType()),
                ]
            ),
            n_buckets=8,
            key_col="doc_id",
            write_mode="mor",
        )
        ep0 = tagged.select(
            "doc_id", "lang", "n_chars", F.lit("U").alias("op"),
            F.col("doc_id").alias("ordinal"),
        )
        append_changes(spark, src, ep0)
        v1 = src.current_version()
        hist = build_scd2(spark, src, d + "/hist")
        # three separate commits: move, move AGAIN (same keys — the
        # middle version exists only between commits 1 and 2), delete
        mv = tagged.filter(F.col("h2") % 5 == 1)
        append_changes(spark, src, mv.select(
            "doc_id", F.lit("moved").alias("lang"),
            (F.col("n_chars") + 1000).alias("n_chars"),
            F.lit("U").alias("op"),
            (F.col("doc_id") + 2_000_000).alias("ordinal"),
        ))
        append_changes(spark, src, mv.select(
            "doc_id", F.lit("moved2").alias("lang"),
            (F.col("n_chars") + 2000).alias("n_chars"),
            F.lit("U").alias("op"),
            (F.col("doc_id") + 3_000_000).alias("ordinal"),
        ))
        append_changes(spark, src, tagged.filter(F.col("h2") % 5 == 2).select(
            "doc_id", F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("long").alias("n_chars"),
            F.lit("D").alias("op"),
            (F.col("doc_id") + 4_000_000).alias("ordinal"),
        ))
        # per-commit maintenance: window = exactly one source commit
        for v in range(v1, src.current_version()):
            update_scd2(spark, src, hist, from_version=v, to_version=v + 1)
        hist.read(spark).select(
            "doc_id", "lang", "n_chars", "valid_from", "valid_to"
        ).write.mode("overwrite").parquet(out_dir)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.read.parquet(out_dir)


@register(
    "cdc_stats_pruned_read",
    """
    WITH t AS (
      SELECT doc_id, lang, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 2))
                  AS INTEGER) AS h2
      FROM documents
    ),
    final AS (
      SELECT doc_id, lang,
             CASE WHEN h2 % 5 = 1 THEN n_chars + 1000 ELSE n_chars END
               AS n_chars
      FROM t WHERE h2 % 5 <> 2
    )
    SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars
    FROM final WHERE n_chars >= 700
    """,
    doc="Payload-column statistics pruning (stats_cols / col_ranges): a "
    "MOR table created with STATS on n_chars, compacted sorted-by-"
    "n_chars into many small files, then hit with delta updates that "
    "cross the predicate boundary and tombstones — read with a "
    "col_ranges scan hint + the row filter. Files are skipped by their "
    "manifest bounds (per-file on resolved buckets, all-or-nothing on "
    "delta-bearing buckets so a winning version or tombstone is never "
    "separated from its bucket); value equality vs the plain SQL WHERE "
    "proves the pruning loses nothing.",
)
def cdc_stats_pruned_read(spark, sf_dir):
    import hashlib
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from qwery_spark.lake.merge import append_changes, compact
    from qwery_spark.lake.table import LakeTable

    h2 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    tagged = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "lang",
        F.col("n_chars").cast("long").alias("n_chars"), h2.alias("h2"),
    )

    tag = hashlib.md5(f"{sf_dir}|statsprune".encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"qwery_statsprune_{tag}")
    d = tempfile.mkdtemp(prefix="qwery_statsprune_tbl_")
    try:
        src = LakeTable.create(
            d + "/t",
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("lang", T.StringType()),
                    T.StructField("n_chars", T.LongType()),
                ]
            ),
            n_buckets=4,
            key_col="doc_id",
            write_mode="mor",
            stats_cols=["n_chars"],
        )
        append_changes(spark, src, tagged.select(
            "doc_id", "lang", "n_chars", F.lit("U").alias("op"),
            F.col("doc_id").alias("ordinal"),
        ))
        # sorted compact -> tight per-file n_chars bounds, many files
        compact(spark, src, sort_cols=["n_chars"], max_records_per_file=64)
        # deltas: boundary-crossing updates + deletes (buckets go
        # unresolved -> the all-or-nothing rule is exercised)
        upd = tagged.filter(F.col("h2") % 5 == 1).select(
            "doc_id", "lang", (F.col("n_chars") + 1000).alias("n_chars"),
            F.lit("U").alias("op"),
            (F.col("doc_id") + 2_000_000).alias("ordinal"),
        )
        dels = tagged.filter(F.col("h2") % 5 == 2).select(
            "doc_id", F.lit(None).cast("string").alias("lang"),
            F.lit(None).cast("long").alias("n_chars"),
            F.lit("D").alias("op"),
            (F.col("doc_id") + 3_000_000).alias("ordinal"),
        )
        append_changes(spark, src, upd.unionAll(dels))
        (
            src.read(spark, col_ranges={"n_chars": (700, None)})
            .filter("n_chars >= 700")
            .select("doc_id", "lang", "n_chars")
            .write.mode("overwrite")
            .parquet(out_dir)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.read.parquet(out_dir)


@register(
    "text_token_stats",
    """
    SELECT doc_id,
           len(string_split_regex(text, '\\s+')) AS n_words,
           length(text) AS n_chars,
           round(CAST(length(text) AS DOUBLE) /
                 len(string_split_regex(text, '\\s+')), 6) AS chars_per_word
    FROM documents
    """,
    doc="Whitespace token counting (BPE-ish regex split) — pure builtins, "
    "whole-stage codegen, zero shuffle.",
)
def text_token_stats(spark, sf_dir):
    return token_stats(load(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "text_quality",
    f"""
    SELECT doc_id,
           n_words,
           round(stop_hits * 1.0 / n_words, 6) AS stopword_ratio,
           CASE WHEN n_words BETWEEN 20 AND 1000
                 AND stop_hits * 1.0 / n_words > 0.05 THEN 'good'
                WHEN n_words < 5 THEN 'too_short' ELSE 'suspect' END AS quality
    FROM (
      SELECT doc_id, len(ws) AS n_words,
             len(list_filter(ws, w -> w IN {_STOP_SQL})) AS stop_hits
      FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents) t
    ) s
    """,
    doc="Quality scoring: length bounds + stopword ratio (reference-free "
    "heuristics for training-data filtering).",
)
def text_quality(spark, sf_dir):
    return quality_score(load(spark, sf_dir, "documents"), "doc_id", "text", STOPWORDS)


@register(
    "text_fingerprint",
    """
    SELECT doc_id,
           substr(md5(text), 1, 16) AS fp64,
           md5(concat(CAST(doc_id AS VARCHAR), ':', text)) AS salted_fp
    FROM documents
    """,
    doc="Document fingerprinting via md5 (rolling-hash analogue); "
    "bit-identical across engines, so oracle-checked exactly.",
)
def text_fingerprint(spark, sf_dir):
    return fingerprint(load(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------- language ID ----------------
_MARKERS = {
    "kv": ("key", "hash", "value"),
    "sql": ("join", "window", "order"),
    "scan": ("table", "scan", "row"),
}
_MARKER_SQL_COLS = ",\n           ".join(
    f"len(list_filter(ws, w -> w IN ({', '.join(repr(w) for w in words)}))) AS score_{lang}"
    for lang, words in _MARKERS.items()
)
_LANGS = list(_MARKERS)
_GUESS_SQL = "CASE "
for _l in _LANGS[:-1]:
    _GUESS_SQL += (
        f"WHEN score_{_l} = greatest("
        + ", ".join(f"score_{x}" for x in _LANGS)
        + f") THEN '{_l}' "
    )
_GUESS_SQL += f"ELSE '{_LANGS[-1]}' END"


@register(
    "lang_id_markers",
    f"""
    SELECT doc_id, score_kv, score_sql, score_scan, {_GUESS_SQL} AS lang_guess
    FROM (
      SELECT doc_id,
           {_MARKER_SQL_COLS}
      FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS ws FROM documents) t
    ) s
    """,
    doc="Marker-word language/domain ID: per-class hit counts + argmax "
    "(ties -> first class). The n-gram-heuristic lang-ID shape; the "
    "classes here are the SYNTHETIC corpus's vocabulary domains (the "
    "documents table isn't natural language, so real-language markers "
    "would score all-zero on it). Real six-language marker sets ship as "
    "operators/text.LANG_MARKERS — same operator, pytest-verified on "
    "natural-language sentences in tests/test_lang_id.py.",
)
def lang_id_markers(spark, sf_dir):
    return marker_lang_scores(
        load(spark, sf_dir, "documents"), "doc_id", "text", _MARKERS
    )


@register(
    "text_bpe_token_count",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens,
           len(string_split_regex(text, '\s+')) AS n_ws_tokens
    FROM documents
    """,
    doc="BPE-ish token counting: word-or-punctuation regex (the standard "
    "pre-tokenizer shape) next to the whitespace count — pure Catalyst "
    "regexp_extract_all, zero shuffle.",
)
def text_bpe_token_count(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"\w+|[^\w\s]"), 0)).alias("n_bpe_tokens"),
        F.size(F.split("text", r"\s+")).alias("n_ws_tokens"),
    )


# ---------------- distributed BPE training / encoding -------------
# The DuckDB oracle UNROLLS the full training loop (4 merge
# iterations): per iteration, adjacent-pair counts from the current
# vocab symbol strings, the deterministic top pair (count DESC, pair
# ASC), and the same exact-greedy list_reduce fold the Spark side
# implements with F.aggregate — value equality proves the entire
# distributed training trajectory, not just a final projection.
_BPE_V0_SQL = r"""
  v0 AS (
    SELECT word, CAST(count(*) AS BIGINT) AS freq,
           trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS syms
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
          FROM documents) w
    WHERE word <> ''
    GROUP BY word
  )"""


def _bpe_iter_sql(i: int) -> str:
    """One unrolled training iteration: pair counts -> top pair ->
    exact-greedy fold merge (matches operators/bpe.merge_fold)."""
    return f"""
  p{i} AS (
    SELECT p AS pair, sum(freq) AS cnt
    FROM v{i - 1}, UNNEST(list_transform(
           range(2, len(string_split(syms, ' ')) + 1),
           i -> string_split(syms, ' ')[i - 1] || ' ' ||
                string_split(syms, ' ')[i])) AS t(p)
    GROUP BY p
  ),
  b{i} AS (
    SELECT split_part(pair, ' ', 1) AS a, split_part(pair, ' ', 2) AS b
    FROM p{i} ORDER BY cnt DESC, pair ASC LIMIT 1
  ),
  v{i} AS (
    SELECT word, freq,
           list_reduce(string_split(syms, ' '), (acc, x) -> CASE
             WHEN (acc = a OR right(acc, len(a) + 1) = ' ' || a)
                  AND x = b
             THEN left(acc, len(acc) - len(a)) || a || b
             ELSE acc || ' ' || x END) AS syms
    FROM v{i - 1} CROSS JOIN b{i}
  )"""


_BPE_N_MERGES = 4
_BPE_TRAIN_CTES = "WITH " + _BPE_V0_SQL + "," + ",".join(
    _bpe_iter_sql(i) for i in range(1, _BPE_N_MERGES + 1)
)


@register(
    "tok_bpe_train",
    _BPE_TRAIN_CTES + f"""
    {"".join(f'''
    SELECT CAST({i} AS INT) AS merge_rank, a AS lhs, b AS rhs FROM b{i}
    {'UNION ALL' if i < _BPE_N_MERGES else ''}''' for i in range(1, _BPE_N_MERGES + 1))}
    """,
    doc="Distributed BPE tokenizer TRAINING (operators/bpe.py): corpus "
    "-> (word, freq) vocab in ONE shuffle (the corpus is never read "
    "again), then per merge a vocab-sized pair-count agg + a "
    "pure-Catalyst exact-greedy fold merge; only the top pair (1 row) "
    "reaches the driver per iteration. The oracle unrolls the SAME 4 "
    "training iterations in SQL — the learned merge list must match "
    "pair-for-pair, proving the whole trajectory. At 100 TB: the vocab "
    "table is a few million rows regardless of corpus size; M merges "
    "cost M tiny aggs, not M corpus scans.",
)
def tok_bpe_train(spark, sf_dir):
    from qwery_spark.operators.bpe import train_bpe

    merges = train_bpe(load(spark, sf_dir, "documents"), "text",
                       _BPE_N_MERGES)
    return spark.createDataFrame(
        [(i + 1, a, b) for i, (a, b) in enumerate(merges)],
        "merge_rank int, lhs string, rhs string",
    )


@register(
    "tok_bpe_encode",
    _BPE_TRAIN_CTES + f""",
    docwords AS (
      SELECT doc_id,
             unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      FROM documents
    )
    SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
           CAST(sum(len(string_split(v.syms, ' '))) AS BIGINT) AS n_pieces
    FROM docwords d JOIN v{_BPE_N_MERGES} v USING (word)
    WHERE d.word <> ''
    GROUP BY d.doc_id
    """,
    doc="BPE ENCODING via the trained vocab table "
    "(operators/bpe.encode_words): training already applied every "
    "merge to every corpus word, so encoding is explode-words -> "
    "broadcast-join the vocab -> per-doc piece counts — no per-row "
    "merge loop anywhere. (encode_text_udf covers unseen text; its "
    "rank-greedy == in-order-merge equivalence is pytest-pinned.) The "
    "oracle replays training AND encoding in SQL.",
)
def tok_bpe_encode(spark, sf_dir):
    from qwery_spark.operators.bpe import encode_words, train_bpe

    docs = load(spark, sf_dir, "documents")
    _, vocab = train_bpe(docs, "text", _BPE_N_MERGES, return_vocab=True)
    return encode_words(docs, "text", vocab, "doc_id")


@register(
    "dedup_pipeline_survivors",
    f"""
    WITH RECURSIVE
    sig AS (
      SELECT doc_id, band, min(h) AS minhash
      FROM ({_SHINGLE_SQL}) b GROUP BY doc_id, band
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM sig a JOIN sig b
        ON a.band = b.band AND a.minhash = b.minhash AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    grams AS (
      SELECT doc_id, list_distinct(list_transform(
               range(1, len(ws) - 1),
               i -> concat(ws[i], ' ', ws[i+1], ' ', ws[i+2]))) AS gs
      FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS ws
            FROM ({_CORPUS_SQL}) c) w
      WHERE len(ws) >= 3
    ),
    verified AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN grams ga ON ga.doc_id = c.doc_a
      JOIN grams gb ON gb.doc_id = c.doc_b
      WHERE round(CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE) /
                  len(list_distinct(list_concat(ga.gs, gb.gs))), 6) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM verified
      UNION ALL
      SELECT doc_b, doc_a FROM verified
    ),
    nodes AS (SELECT DISTINCT a AS node FROM edges),
    walk(node, label) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT e.a, w.label FROM edges e JOIN walk w ON w.node = e.b
    )
    SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
           count(*) AS n_members,
           CAST(min(node) AS BIGINT) AS keeper,
           count(*) - 1 AS n_dropped
    FROM (SELECT node, min(label) AS cluster_id FROM walk GROUP BY node) c
    GROUP BY cluster_id
    """,
    doc="THE dedup pipeline end-to-end in one query: banded MinHash-LSH "
    "candidates (bucket join) -> exact n-gram Jaccard verification on "
    "candidates only (>= 0.5) -> connected components (min-label "
    "propagation) -> per-cluster survivor choice (keeper = min doc_id, "
    "the rest dropped). Every stage value-checked against DuckDB, the "
    "iterative one via a RECURSIVE CTE.",
)
def dedup_pipeline_survivors(spark, sf_dir):
    from qwery_spark.operators.graph import connected_components

    corpus = _corpus(spark, sf_dir, spread=True)
    cand = minhash_candidates(corpus, "doc_id", "text", _NBANDS).select(
        "doc_a", "doc_b"
    )
    verified = ngram_jaccard(cand, corpus, "doc_id", "text").filter(
        F.col("jaccard") >= 0.5
    )
    cc = connected_components(verified, src="doc_a", dst="doc_b")
    return cc.groupBy(F.col("component").cast("bigint").alias("cluster_id")).agg(
        F.count("*").alias("n_members"),
        F.min("node").cast("bigint").alias("keeper"),
        (F.count("*") - 1).alias("n_dropped"),
    )


# ---------------- deterministic sampling / splits (training-data ops) ---
# Hash-threshold sampling: md5(doc_id) is uniform and engine-portable,
# so sample membership is a pure projection — reproducible across runs,
# engines, and cluster sizes (no RNG state, no shuffle). At 100 TB this
# beats .sample(): zero planning constraints, pushdown-friendly, and
# the same row always lands in the same split (leak-proof train/test).
_HASH_BUCKET_SQL = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 1000"


def _hash_bucket():
    """Spark twin of _HASH_BUCKET_SQL — one definition each side; a
    bucketing change must touch exactly these two lines."""
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 1000
    )


@register(
    "split_assignment",
    f"""
    SELECT split, count(*) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc,
           round(avg(n_chars), 4) AS avg_chars
    FROM (
      SELECT doc_id, n_chars,
             CASE WHEN {_HASH_BUCKET_SQL} < 800 THEN 'train'
                  WHEN {_HASH_BUCKET_SQL} < 900 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ) s
    GROUP BY split
    """,
    doc="Deterministic 80/10/10 train/val/test split by md5 hash band — "
    "membership is a projection (no RNG, no shuffle), the same doc lands "
    "in the same split on any engine or cluster size: leak-proof by "
    "construction.",
)
def split_assignment(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    bucket = _hash_bucket()
    split = (
        F.when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "doc_id", "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


@register(
    "sample_stratified",
    f"""
    SELECT source, count(*) AS n_sampled, CAST(min(doc_id) AS BIGINT) AS min_doc
    FROM (
      SELECT doc_id, source, {_HASH_BUCKET_SQL} AS hb,
             CASE source WHEN 'web' THEN 500 WHEN 'books' THEN 900
                         ELSE 250 END AS rate_permille
      FROM documents
    ) s
    WHERE hb < rate_permille
    GROUP BY source
    """,
    doc="Stratified sampling with per-source rates (web 50%, books 90%, "
    "rest 25%) via the same hash-threshold trick — the data-mixing "
    "primitive of a training pipeline, expressed as a pushdown-friendly "
    "filter with zero RNG state.",
)
def sample_stratified(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    hb = _hash_bucket()
    rate = (
        F.when(F.col("source") == "web", 500)
        .when(F.col("source") == "books", 900)
        .otherwise(250)
    )
    return (
        d.filter(hb < rate)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_sampled"),
            F.min("doc_id").cast("bigint").alias("min_doc"),
        )
    )


@register(
    "sample_global_shuffle",
    """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(CAST(('0x' || substr(k, 1, 8)) AS BIGINT) % 16 AS INT)
             AS shard,
           CAST(row_number() OVER (
                  PARTITION BY CAST(('0x' || substr(k, 1, 8)) AS BIGINT) % 16
                  ORDER BY k, doc_id)
                AS BIGINT) AS pos
    FROM (SELECT doc_id, md5('42|' || CAST(doc_id AS VARCHAR)) AS k
          FROM documents) t
    """,
    doc="Deterministic seeded global shuffle (operators/shuffle.py): "
    "order key md5(seed|id) -> shard (first 32 bits mod 16) + 1-based "
    "position within the shard. The ENTIRE shuffle order is "
    "value-checked against DuckDB computing the same key — identical "
    "on any engine/cluster size/re-run with zero RNG state. Plan: ONE "
    "shard-partitioned shuffle with per-shard sort, never a global "
    "ORDER BY — shards are the training loader's parallelism unit, so "
    "per-shard order replaces a total order at a fraction of the cost.",
)
def sample_global_shuffle(spark, sf_dir):
    from qwery_spark.operators.shuffle import shard_assignments

    d = load(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id")
    )
    return shard_assignments(d, "doc_id", 42, 16)


_PII_EMAIL = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
_PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"

# deterministic PII injection shared by both engines (the driver corpus
# has no PII of its own): every 3rd doc gets an email, every 5th a phone
_AUG_SQL = """
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 3 = 0
                     THEN ' mail me at user' || doc_id || '@example.com ok'
                     ELSE '' END
             || CASE WHEN doc_id % 5 = 0
                     THEN ' call 555-123-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                     ELSE '' END AS text
      FROM documents
"""


@register(
    "text_pii_scrub",
    f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS INTEGER) AS n_email,
           CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS INTEGER) AS n_phone,
           md5(regexp_replace(regexp_replace(text, '{_PII_EMAIL}', '<email>', 'g'),
                              '{_PII_PHONE}', '<phone>', 'g')) AS scrubbed_md5
    FROM ({_AUG_SQL}) t
    """,
    doc="PII redaction (operators/text.pii_scrub): RE2-compatible email/"
    "phone patterns, per-kind match counts + scrubbed text value-checked "
    "via md5 — map-only regexp_replace, zero shuffle at any scale.",
)
def text_pii_scrub(spark, sf_dir):
    from qwery_spark.operators.text import pii_scrub

    docs = load(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" mail me at user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com ok"),
                ),
            ).otherwise(""),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" call 555-123-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(""),
        ).alias("text"),
    )
    return pii_scrub(aug, "text").select(
        "doc_id", "n_email", "n_phone", F.md5("text_scrubbed").alias("scrubbed_md5")
    )


@register(
    "text_decontaminate",
    """
    WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(0, greatest(len(w) - 3, 0) + 1),
                    i -> array_to_string(w[i + 1 : i + 3], ' '))) AS g
      FROM words
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0 AND g <> ''),
    corp AS (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 97 <> 0)
    SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM corp c JOIN bench b USING (g)
    GROUP BY 1
    """,
    doc="Benchmark decontamination (operators/text.decontaminate): flag "
    "corpus docs sharing any word 3-gram with a (deterministic) held-out "
    "benchmark subset — broadcast benchmark-gram join, corpus stays "
    "unshuffled until the per-doc count.",
)
def text_decontaminate(spark, sf_dir):
    from qwery_spark.operators.text import decontaminate

    docs = load(spark, sf_dir, "documents")
    return decontaminate(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        "doc_id",
        "text",
        n=3,
    )


@register(
    "sample_cap_per_group",
    """
    SELECT doc_id, source, CAST(rk AS INTEGER) AS rk
    FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
      FROM documents
    ) s
    WHERE rk <= 40
    """,
    doc="Balanced cap sampling: EXACTLY min(40, |group|) docs per source, "
    "chosen by deterministic md5 rank — no RNG, same picks on any engine "
    "or cluster size. The per-group window shuffles on source (group "
    "count is small); at 100 TB Spark 3.5+ WindowGroupLimit pushes the "
    "rk<=40 cap below the sort, so each partition keeps a 40-row heap "
    "instead of sorting the group.",
)
def sample_cap_per_group(spark, sf_dir):
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 40)
    )


@register(
    "text_repetition_quality",
    r"""
    WITH w AS (
      SELECT doc_id, string_split_regex(text, '\s+') AS ws FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(ws)),
                                   i -> ws[i] || ' ' || ws[i + 1])) AS gram
      FROM w
    ),
    c AS (SELECT doc_id, gram, count(*) AS cnt FROM bg GROUP BY 1, 2),
    t AS (SELECT doc_id, max(cnt) AS top_count FROM c GROUP BY 1)
    SELECT w.doc_id,
           len(ws) AS n_words,
           round((len(ws) - len(list_distinct(ws))) * 1.0 / len(ws), 6)
             AS dup_word_frac,
           CAST(coalesce(t.top_count, 0) AS INTEGER) AS top_bigram_count,
           round(coalesce(t.top_count, 0) * 1.0
                 / greatest(len(ws) - 1, 1), 6) AS top_bigram_frac,
           (round((len(ws) - len(list_distinct(ws))) * 1.0 / len(ws), 6) > 0.55
            OR round(coalesce(t.top_count, 0) * 1.0
                     / greatest(len(ws) - 1, 1), 6) > 0.04) AS is_repetitive
    FROM w LEFT JOIN t USING (doc_id)
    """,
    doc="Gopher-style repetition filters (duplicate-word fraction + "
    "top-bigram share): the Spark plan is ZERO-shuffle — the per-doc "
    "max bigram count is the longest equal-run in the array_sort'ed "
    "bigram array via the aggregate() HOF, one map stage over the scan "
    "— while the oracle recomputes it the naive explode/groupBy way.",
)
def text_repetition_quality(spark, sf_dir):
    return repetition_stats(load(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "sample_token_budget",
    r"""
    WITH w AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(text, '\s+')) AS INTEGER) AS n_tok,
             md5(CAST(doc_id AS VARCHAR)) AS o
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tok,
             CAST(SUM(n_tok) OVER (
               PARTITION BY source ORDER BY o
             ) AS BIGINT) AS cum_tok
      FROM w
    )
    SELECT doc_id, source, n_tok, cum_tok FROM c
    WHERE cum_tok - n_tok < 500
    """,
    doc="Mixture sampling under a per-domain token budget (the "
    "training-mixture capping step): deterministic md5 order, keep a "
    "doc iff it STARTS inside the budget. Spark side computes the "
    "grouped running sum with the range-partition + offset scheme "
    "(operators/rank.with_group_cumsum) instead of a per-group window "
    "— few huge domains would otherwise serialize through single "
    "tasks; the oracle uses the plain window.",
)
def sample_token_budget(spark, sf_dir):
    return token_budget_sample(
        load(spark, sf_dir, "documents"), "doc_id", "text", "source", budget=500
    )


@register(
    "text_wordfreq_logprob",
    r"""
    WITH w AS (
      SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS w
      FROM documents
    ),
    vocab AS (SELECT w, count(*) AS cnt FROM w GROUP BY w),
    tot AS (SELECT sum(cnt) AS total FROM vocab),
    top AS (
      SELECT w, ln(cnt * 1.0 / (SELECT total FROM tot)) AS logp
      FROM (
        SELECT w, cnt,
               row_number() OVER (ORDER BY cnt DESC, w ASC) AS r
        FROM vocab
      ) WHERE r <= 65536
    )
    SELECT w.doc_id,
           round(avg(coalesce(top.logp,
                              ln(1.0 / (SELECT total FROM tot)))), 6)
             AS avg_logp,
           count(*) AS n_words
    FROM w LEFT JOIN top USING (w)
    GROUP BY w.doc_id
    """,
    doc="Unigram-LM quality proxy (KenLM-filter shape, corpus as LM): "
    "per-doc mean log-probability under the corpus unigram "
    "distribution; vocab aggregated once, deterministically truncated, "
    "broadcast under the exploded words.",
)
def text_wordfreq_logprob(spark, sf_dir):
    return wordfreq_logprob(load(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------- exact duplicated-span (substring) dedup ----------------
# Synthetic token corpus with KNOWN repeated spans: a third of the docs
# carry a fixed 12-token boilerplate header (every corpus-duplicated
# window inside it must be cut from every carrier), and body sequences
# collide across docs exactly when event_id matches mod 997 at the same
# offset — a deterministic mix of corpus-wide boilerplate and rare
# aligned body repeats at every sf.
_SPAN_L = 8
_SPAN_DOCS_SQL = """
      SELECT event_id AS ordinal,
             list_concat(
               CASE WHEN event_id % 3 = 0
                    THEN [101,102,103,104,105,106,107,108,109,110,111,112]
                    ELSE CAST([] AS INTEGER[]) END,
               list_transform(range(0, 12 + CAST(event_id % 11 AS INTEGER)),
                              i -> CAST((event_id * 97 + i * 31 + (i * i) % 17)
                                        % 997 AS INTEGER))
             ) AS tokens
      FROM events
"""
# the oracle's window table: one (ordinal, pos, h) row per L-token
# window, hashed with md5 over the comma-joined span (bit-identical to
# the Spark side)
_SPAN_WINDOWS_SQL = f"""
    w0 AS (
      SELECT ordinal,
             CASE WHEN len(tokens) >= {_SPAN_L} THEN
               list_transform(range(1, len(tokens) - {_SPAN_L} + 2),
                 i -> struct_pack(pos := i,
                        h := md5(array_to_string(
                               list_transform(tokens[i:i+{_SPAN_L}-1],
                                              x -> CAST(x AS VARCHAR)), ','))))
             ELSE [] END AS ws
      FROM docs),
    wx AS (SELECT ordinal, unnest(ws) AS u FROM w0),
    wf AS (SELECT ordinal, (u).pos AS pos, (u).h AS h FROM wx)
"""


def _span_docs(spark, sf_dir, spread: bool = True) -> DataFrame:
    # spread=False for consumers whose post-fingerprint work is small
    # relative to the repartition (tok_span_scrub: interleaved A/B at
    # sf0.1 AND 10x measured the unspread plan ~30% faster, while
    # tok_dup_spans needs the spread 4-5x — round 7 second pass)
    ev = (load_spread(spark, sf_dir, "events", "event_id") if spread
          else load(spark, sf_dir, "events"))
    boiler = F.when(
        F.col("event_id") % 3 == 0,
        F.array(*[F.lit(v) for v in range(101, 113)]),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    body = F.expr(
        "transform(sequence(0, 11 + CAST(event_id % 11 AS INT)), "
        "i -> CAST((event_id * 97 + i * 31 + (i * i) % 17) % 997 AS INT))"
    )
    return ev.select(
        F.col("event_id").alias("ordinal"), F.concat(boiler, body).alias("tokens")
    )


@register(
    "tok_dup_spans",
    f"""
    WITH docs AS ({_SPAN_DOCS_SQL}), {_SPAN_WINDOWS_SQL}
    SELECT h AS span_hash, count(*) AS n_occ,
           count(DISTINCT ordinal) AS n_docs
    FROM wf GROUP BY h HAVING count(*) >= 2
    """,
    doc="Exact duplicated-span inventory (Lee et al. 2022 exact-substring "
    "dedup, distributed-SQL restatement): md5-fingerprint every 8-token "
    "window (map-only HOF, zero shuffle), then ONE partial-aggregated "
    "groupBy(span_hash) finds every window content occurring >= 2 times "
    "corpus-wide. operators/spandedup.py.",
)
def tok_dup_spans(spark, sf_dir):
    from qwery_spark.operators.spandedup import dup_spans

    return dup_spans(_span_docs(spark, sf_dir), "ordinal", "tokens", _SPAN_L)


@register(
    "tok_span_scrub",
    f"""
    WITH docs AS ({_SPAN_DOCS_SQL}), {_SPAN_WINDOWS_SQL},
    dups AS (SELECT h FROM wf GROUP BY h HAVING count(*) >= 2),
    dup_pos AS (
      SELECT ordinal, list(pos) AS ds FROM wf
      WHERE h IN (SELECT h FROM dups) GROUP BY ordinal),
    scr AS (
      SELECT d.ordinal,
             CASE WHEN dp.ds IS NULL THEN d.tokens ELSE
               list_where(d.tokens,
                 list_transform(range(1, len(d.tokens) + 1),
                   p -> len(list_filter(dp.ds,
                          s -> p >= s AND p <= s + {_SPAN_L} - 1)) = 0))
             END AS kept,
             len(d.tokens) AS n_tok,
             coalesce(len(dp.ds), 0) AS n_dup_windows
      FROM docs d LEFT JOIN dup_pos dp USING (ordinal))
    SELECT ordinal, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(len(kept) AS BIGINT) AS n_kept,
           CAST(n_dup_windows AS BIGINT) AS n_dup_windows,
           md5(coalesce(array_to_string(
                 list_transform(kept, x -> CAST(x AS VARCHAR)), ','),
               '')) AS kept_md5
    FROM scr
    """,
    doc="Exact-substring scrub: every position covered by a corpus-"
    "duplicated 8-token window is cut from its document's token array "
    "(boilerplate/license/header removal before training). Shuffles only "
    "on span_hash and doc id — the dup-position list per doc is bounded "
    "by the doc's own length, and the cut is an index-lambda HOF. "
    "Per-row kept-array md5 makes the scrub value-checked bit-exactly.",
)
def tok_span_scrub(spark, sf_dir):
    from qwery_spark.operators.spandedup import scrub_dup_spans

    s = scrub_dup_spans(
        _span_docs(spark, sf_dir, spread=False), "ordinal", "tokens", _SPAN_L
    )
    return s.select(
        "ordinal",
        F.size("tokens").cast("long").alias("n_tok"),
        F.size("tokens_clean").cast("long").alias("n_kept"),
        "n_dup_windows",
        F.md5(
            F.array_join(
                F.transform("tokens_clean", lambda x: x.cast("string")), ","
            )
        ).alias("kept_md5"),
    )


# ---------------- incremental vocabulary (token-frequency) view ----------------
# Final-state oracle for the vocab IVM lifecycle below: ep0 = docs with
# h2 % 4 != 0; epoch 2 adds the rest, shifts the token derivation for
# h2 % 5 = 1 docs (an array-changing update), and deletes h2 % 5 = 2
# docs. Docs with event_id % 4 = 0 carry their first token twice, so
# cnt > n_docs there — the occurrence-vs-document distinction is
# exercised, not just asserted.
_VOCAB_FINAL_SQL = """
      SELECT ordinal,
             CASE WHEN event_id % 4 = 0
                  THEN list_concat(base, [base[1]]) ELSE base END AS tokens
      FROM (
        SELECT event_id, event_id AS ordinal,
               list_transform(range(0, CAST(event_id % 7 AS INTEGER) + 1),
                 i -> CAST((event_id * 37 + i * 13 +
                            CASE WHEN h2 % 4 <> 0 AND h2 % 5 = 1
                                 THEN 1 ELSE 0 END) % 50257 AS INTEGER))
                 AS base
        FROM (
          SELECT event_id,
                 CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2))
                      AS INTEGER) AS h2
          FROM events
        ) h
        WHERE NOT (h2 % 4 <> 0 AND h2 % 5 = 2)
      ) b
"""


def _vocab_tagged(spark, sf_dir, shift: int) -> DataFrame:
    """Token arrays for every event at derivation offset ``shift``,
    with the doc-duplicated first token and the md5 epoch tag."""
    ev = load(spark, sf_dir, "events")
    base = F.expr(
        f"transform(sequence(0, CAST(event_id % 7 AS INT)), "
        f"i -> CAST((event_id * 37 + i * 13 + {shift}) % 50257 AS INT))"
    )
    toks = F.when(
        F.col("event_id") % 4 == 0,
        F.concat(base, F.array(F.element_at(base, 1))),
    ).otherwise(base)
    h2 = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    return ev.select(
        F.col("event_id").cast("long").alias("doc_id"),
        toks.alias("tokens"),
        h2.alias("h2"),
    )


@register(
    "cdc_incremental_vocab",
    f"""
    SELECT token, count(*) AS cnt,
           CAST(count(DISTINCT ordinal) AS BIGINT) AS n_docs
    FROM (SELECT ordinal, unnest(tokens) AS token
          FROM ({_VOCAB_FINAL_SQL}) f) u
    GROUP BY token
    """,
    doc="Incrementally maintained token-frequency (vocabulary) view "
    "(operators/vocab.py): a token-keyed (cnt, n_docs) lake table built "
    "at epoch 0, then updated from ONE preimage-bearing change-feed "
    "window — array-changing updates subtract the old array and add the "
    "new, deletes subtract their preimage, zeroed tokens leave the view. "
    "The oracle recomputes the vocabulary from scratch over the final "
    "corpus: value equality proves the explode-through IVM is exact. At "
    "100 TB the refresh shuffles (distinct tokens in the window), never "
    "the corpus.",
)
def cdc_incremental_vocab(spark, sf_dir):
    import hashlib
    import os
    import shutil
    import tempfile

    from pyspark.sql import types as T

    from qwery_spark.lake.merge import append_changes
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.operators.vocab import build_vocab, update_vocab

    base = _vocab_tagged(spark, sf_dir, 0)
    shifted = _vocab_tagged(spark, sf_dir, 1)

    tag = hashlib.md5(f"{sf_dir}|inc_vocab".encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"qwery_inc_vocab_{tag}")
    d = tempfile.mkdtemp(prefix="qwery_inc_vocab_tbl_")
    try:
        src = LakeTable.create(
            d + "/src",
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("tokens", T.ArrayType(T.IntegerType())),
                ]
            ),
            n_buckets=8,
            key_col="doc_id",
            write_mode="mor",
        )
        ep0 = base.filter(F.col("h2") % 4 != 0).select(
            "doc_id", "tokens", F.lit("U").alias("op"),
            F.col("doc_id").alias("ordinal"),
        )
        append_changes(spark, src, ep0)
        v1 = src.current_version()
        vocab = build_vocab(spark, src, d + "/vocab", "tokens")
        adds = base.filter(F.col("h2") % 4 == 0).select(
            "doc_id", "tokens", F.lit("U").alias("op"),
            (F.col("doc_id") + 1_000_000).alias("ordinal"),
        )
        updates = shifted.filter(
            (F.col("h2") % 4 != 0) & (F.col("h2") % 5 == 1)
        ).select(
            "doc_id", "tokens", F.lit("U").alias("op"),
            (F.col("doc_id") + 2_000_000).alias("ordinal"),
        )
        dels = base.filter(
            (F.col("h2") % 4 != 0) & (F.col("h2") % 5 == 2)
        ).select(
            "doc_id", F.lit(None).cast("array<int>").alias("tokens"),
            F.lit("D").alias("op"),
            (F.col("doc_id") + 3_000_000).alias("ordinal"),
        )
        append_changes(spark, src, adds.unionAll(updates).unionAll(dels))
        update_vocab(spark, src, vocab, "tokens", from_version=v1)
        vocab.read(spark).select("token", "cnt", "n_docs").write.mode(
            "overwrite"
        ).parquet(out_dir)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.read.parquet(out_dir)


# ---------------- persisted incremental span index ----------------
# Final corpus for the span-index lifecycle: ep0 = docs with h2 % 4 != 0
# at body shift 0; epoch 2 adds the rest, re-derives bodies at shift 1
# for h2 % 5 = 1 docs (every body window changes, boilerplate windows
# survive), and deletes h2 % 5 = 2 docs.
_SPANIDX_FINAL_SQL = """
      SELECT ordinal,
             list_concat(
               CASE WHEN event_id % 3 = 0
                    THEN [101,102,103,104,105,106,107,108,109,110,111,112]
                    ELSE CAST([] AS INTEGER[]) END,
               list_transform(range(0, 12 + CAST(event_id % 11 AS INTEGER)),
                 i -> CAST((event_id * 97 + i * 31 + (i * i) % 17 +
                            CASE WHEN h2 % 4 <> 0 AND h2 % 5 = 1
                                 THEN 1 ELSE 0 END) % 997 AS INTEGER))
             ) AS tokens, h2
      FROM (
        SELECT event_id, event_id AS ordinal,
               CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 2))
                    AS INTEGER) AS h2
        FROM events
      ) h
      WHERE NOT (h2 % 4 <> 0 AND h2 % 5 = 2)
"""


def _span_tagged(spark, sf_dir, shift: int) -> DataFrame:
    """The span corpus at body derivation offset ``shift``, with the
    md5 epoch tag (boilerplate headers are shift-invariant)."""
    ev = load_spread(spark, sf_dir, "events", "event_id")
    boiler = F.when(
        F.col("event_id") % 3 == 0,
        F.array(*[F.lit(v) for v in range(101, 113)]),
    ).otherwise(F.expr("CAST(array() AS array<int>)"))
    body = F.expr(
        f"transform(sequence(0, 11 + CAST(event_id % 11 AS INT)), "
        f"i -> CAST((event_id * 97 + i * 31 + (i * i) % 17 + {shift}) "
        f"% 997 AS INT))"
    )
    h2 = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    return ev.select(
        F.col("event_id").cast("long").alias("doc_id"),
        F.concat(boiler, body).alias("tokens"),
        h2.alias("h2"),
    )


def _span_index_lifecycle(spark, sf_dir, tmpdir: str):
    """Shared harness: source table through two epochs with the span
    index built at epoch 0 and advanced from the change feed. Returns
    (src, index, batch2_docs) with batch2 = epoch-2 upserts at their
    final arrays."""
    from pyspark.sql import types as T

    from qwery_spark.lake.merge import append_changes
    from qwery_spark.lake.table import LakeTable
    from qwery_spark.operators.spanindex import (
        build_span_index,
        update_span_index,
    )

    base = _span_tagged(spark, sf_dir, 0)
    shifted = _span_tagged(spark, sf_dir, 1)
    src = LakeTable.create(
        tmpdir + "/src",
        T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("tokens", T.ArrayType(T.IntegerType())),
            ]
        ),
        n_buckets=8,
        key_col="doc_id",
        write_mode="mor",
    )
    ep0 = base.filter(F.col("h2") % 4 != 0).select(
        "doc_id", "tokens", F.lit("U").alias("op"),
        F.col("doc_id").alias("ordinal"),
    )
    append_changes(spark, src, ep0)
    v1 = src.current_version()
    idx = build_span_index(spark, src, tmpdir + "/spanidx", "tokens", _SPAN_L)
    adds = base.filter(F.col("h2") % 4 == 0).select(
        "doc_id", "tokens", F.lit("U").alias("op"),
        (F.col("doc_id") + 1_000_000).alias("ordinal"),
    )
    updates = shifted.filter(
        (F.col("h2") % 4 != 0) & (F.col("h2") % 5 == 1)
    ).select(
        "doc_id", "tokens", F.lit("U").alias("op"),
        (F.col("doc_id") + 2_000_000).alias("ordinal"),
    )
    dels = base.filter(
        (F.col("h2") % 4 != 0) & (F.col("h2") % 5 == 2)
    ).select(
        "doc_id", F.lit(None).cast("array<int>").alias("tokens"),
        F.lit("D").alias("op"),
        (F.col("doc_id") + 3_000_000).alias("ordinal"),
    )
    append_changes(spark, src, adds.unionAll(updates).unionAll(dels))
    update_span_index(spark, src, idx, "tokens", _SPAN_L, from_version=v1)
    batch2 = adds.select("doc_id", "tokens").unionAll(
        updates.select("doc_id", "tokens")
    )
    return src, idx, batch2


@register(
    "tok_span_index_dups",
    f"""
    WITH docs AS ({_SPANIDX_FINAL_SQL}), {_SPAN_WINDOWS_SQL}
    SELECT h AS span_hash, count(*) AS cnt,
           CAST(count(DISTINCT ordinal) AS BIGINT) AS n_docs
    FROM wf GROUP BY h HAVING count(*) >= 2
    """,
    doc="Persisted incremental span index (operators/spanindex.py): the "
    "corpus-wide L-window inventory as a span_hash-keyed (cnt, n_docs) "
    "lake table built at epoch 0 and maintained from ONE preimage-"
    "bearing change window — changed docs subtract their old windows "
    "and add their new ones, zeroed spans leave the index. Output = the "
    "live duplicated-span inventory (cnt >= 2), zero corpus IO. The "
    "oracle re-fingerprints the final corpus from scratch: equality "
    "proves the incremental index is exact. At 100 TB the daily refresh "
    "costs O(window tokens), never a corpus pass.",
)
def tok_span_index_dups(spark, sf_dir):
    import hashlib
    import os
    import shutil
    import tempfile

    from qwery_spark.operators.spanindex import duplicated_spans

    tag = hashlib.md5(f"{sf_dir}|spanidx".encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"qwery_spanidx_{tag}")
    d = tempfile.mkdtemp(prefix="qwery_spanidx_tbl_")
    try:
        src, idx, _ = _span_index_lifecycle(spark, sf_dir, d)
        duplicated_spans(spark, idx).select(
            "span_hash", "cnt", "n_docs"
        ).write.mode("overwrite").parquet(out_dir)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.read.parquet(out_dir)


@register(
    "tok_span_scrub_incremental",
    f"""
    WITH docs AS ({_SPANIDX_FINAL_SQL}), {_SPAN_WINDOWS_SQL},
    dups AS (SELECT h FROM wf GROUP BY h HAVING count(*) >= 2),
    batch AS (
      SELECT ordinal, tokens FROM docs
      WHERE h2 % 4 = 0 OR (h2 % 4 <> 0 AND h2 % 5 = 1)),
    bw AS (
      SELECT b.ordinal, w.pos FROM wf w JOIN batch b USING (ordinal)
      WHERE w.h IN (SELECT h FROM dups)),
    dup_pos AS (SELECT ordinal, list(pos) AS ds FROM bw GROUP BY ordinal),
    scr AS (
      SELECT b.ordinal,
             CASE WHEN dp.ds IS NULL THEN b.tokens ELSE
               list_where(b.tokens,
                 list_transform(range(1, len(b.tokens) + 1),
                   p -> len(list_filter(dp.ds,
                          s -> p >= s AND p <= s + {_SPAN_L} - 1)) = 0))
             END AS kept,
             len(b.tokens) AS n_tok,
             coalesce(len(dp.ds), 0) AS n_dup_windows
      FROM batch b LEFT JOIN dup_pos dp USING (ordinal))
    SELECT ordinal AS doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(len(kept) AS BIGINT) AS n_kept,
           CAST(n_dup_windows AS BIGINT) AS n_dup_windows,
           md5(coalesce(array_to_string(
                 list_transform(kept, x -> CAST(x AS VARCHAR)), ','),
               '')) AS kept_md5
    FROM scr
    """,
    doc="Day-2 scrub against the persisted span index: the epoch-2 "
    "batch is cleaned against every span the WHOLE corpus repeats — "
    "only the batch is fingerprinted (map-only), its windows semi-join "
    "the index's cnt>=2 slice, covered positions are cut. O(batch), the "
    "corpus is never re-read. Oracle recomputes the dup set from the "
    "final corpus from scratch and scrubs the same batch in SQL.",
)
def tok_span_scrub_incremental(spark, sf_dir):
    import hashlib
    import os
    import shutil
    import tempfile

    from qwery_spark.operators.spanindex import scrub_against_index

    tag = hashlib.md5(f"{sf_dir}|spanscrub".encode()).hexdigest()[:10]
    out_dir = os.path.join(tempfile.gettempdir(), f"qwery_spanscrub_{tag}")
    d = tempfile.mkdtemp(prefix="qwery_spanscrub_tbl_")
    try:
        _, idx, batch2 = _span_index_lifecycle(spark, sf_dir, d)
        s = scrub_against_index(
            spark, batch2, idx, "doc_id", "tokens", _SPAN_L
        )
        s.select(
            "doc_id",
            F.size("tokens").cast("long").alias("n_tok"),
            F.size("tokens_clean").cast("long").alias("n_kept"),
            "n_dup_windows",
            F.md5(
                F.array_join(
                    F.transform("tokens_clean", lambda x: x.cast("string")),
                    ",",
                )
            ).alias("kept_md5"),
        ).write.mode("overwrite").parquet(out_dir)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return spark.read.parquet(out_dir)
