"""Training-data pipeline operators over `documents`: deduplication
(exact, minhash-LSH, ngram-jaccard), text quality, language ID,
token counting, fingerprinting.

Engine-parity trick for oracle checking: every hash used here is md5
(bit-identical in Spark and DuckDB), never engine-local hash functions.

All 500 driver texts are distinct, so dedup queries build a corpus with
KNOWN duplicates deterministically: documents UNION a copy with
doc_id+100000 (exact dups) UNION a copy with doc_id+200000 whose last
word is stripped (near dups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from qwery_spark.suite import load, register

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")
_STOP_SQL = "(" + ", ".join(f"'{w}'" for w in STOPWORDS) + ")"

# corpus with synthetic duplicates (deterministic in both engines)
_CORPUS_SQL = """
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 200000 AS doc_id,
             regexp_replace(text, '\\s+\\S+$', '') AS text
      FROM documents
"""


def _corpus(spark, sf_dir) -> DataFrame:
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
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
    return (
        _corpus(spark, sf_dir)
        .groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_copies") > 1)
    )


# ---------------- minhash + LSH banding ----------------
_NBANDS = 8


def _shingled(spark, sf_dir) -> DataFrame:
    """word-3-gram shingles, exploded; band = md5-derived bucket."""
    c = _corpus(spark, sf_dir).withColumn("ws", F.split("text", r"\s+")).filter(
        F.size("ws") >= 3
    )
    words = F.col("ws")
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(words) - 2),
        lambda i: F.concat_ws(
            " ", F.element_at(words, i), F.element_at(words, i + 1), F.element_at(words, i + 2)
        ),
    )
    return (
        c.select("doc_id", F.explode(shingles).alias("shingle"))
        .withColumn("h", F.md5("shingle"))
        .withColumn(
            "band", F.conv(F.substring("h", 1, 2), 16, 10).cast("int") % _NBANDS
        )
    )


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
    return _shingled(spark, sf_dir).groupBy("doc_id", "band").agg(F.min("h").alias("minhash"))


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
    sig = (
        _shingled(spark, sf_dir)
        .groupBy("doc_id", "band")
        .agg(F.min("h").alias("minhash"))
    )
    a = sig.alias("a")
    b = sig.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.minhash") == F.col("b.minhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.countDistinct("a.band").alias("bands_hit"))
    )


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
    WHERE len(a.gs) > 0 AND len(b.gs) > 0
    """,
    doc="n-gram Jaccard verification on candidate pairs (here: each doc vs "
    "its near-dup twin). At scale this runs AFTER LSH pruning, on "
    "candidates only — never all-pairs.",
)
def dedup_ngram_jaccard(spark, sf_dir):
    c = _corpus(spark, sf_dir).withColumn("ws", F.split("text", r"\s+")).filter(
        F.size("ws") >= 3
    )
    words = F.col("ws")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(words, i),
                F.element_at(words, i + 1),
                F.element_at(words, i + 2),
            ),
        )
    )
    g = c.select("doc_id", grams.alias("gs"))
    a = g.alias("a")
    b = g.alias("b")
    inter = F.size(F.array_intersect(F.col("a.gs"), F.col("b.gs")))
    union = F.size(F.array_distinct(F.concat(F.col("a.gs"), F.col("b.gs"))))
    return (
        a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + 200000)
        .filter((F.size(F.col("a.gs")) > 0) & (F.size(F.col("b.gs")) > 0))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(inter.cast("double") / union, 6).alias("jaccard"),
        )
    )


# ---------------- text analysis ----------------
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
    d = load(spark, sf_dir, "documents")
    words = F.split("text", r"\s+")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.length("text").alias("n_chars"),
        F.round(F.length("text").cast("double") / F.size(words), 6).alias("chars_per_word"),
    )


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
    d = load(spark, sf_dir, "documents")
    ws = F.split("text", r"\s+")
    stop_hits = F.size(F.filter(ws, lambda w: w.isin(*STOPWORDS)))
    n_words = F.size(ws)
    ratio = stop_hits * F.lit(1.0) / n_words
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when((n_words.between(20, 1000)) & (ratio > 0.05), "good")
        .when(n_words < 5, "too_short")
        .otherwise("suspect")
        .alias("quality"),
    )


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
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.substring(F.md5("text"), 1, 16).alias("fp64"),
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text"))).alias(
            "salted_fp"
        ),
    )


@register(
    "lang_id_heuristic",
    """
    SELECT lang, lang_guess, count(*) AS n FROM (
      SELECT lang,
             CASE WHEN length(text) % 5 = 0 THEN 'langA'
                  WHEN length(text) % 5 IN (1, 2) THEN 'langB'
                  ELSE 'langC' END AS lang_guess
      FROM documents) t
    GROUP BY lang, lang_guess
    """,
    doc="Language-ID harness shape: deterministic feature -> class -> "
    "confusion counts vs the labeled lang column. (Driver corpus is "
    "synthetic word-soup, so the feature is a placeholder; the Spark "
    "plumbing — classify + confusion matrix — is the operator.)",
)
def lang_id_heuristic(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    guess = (
        F.when(F.length("text") % 5 == 0, "langA")
        .when((F.length("text") % 5).isin(1, 2), "langB")
        .otherwise("langC")
    )
    return (
        d.select("lang", guess.alias("lang_guess"))
        .groupBy("lang", "lang_guess")
        .agg(F.count("*").alias("n"))
    )
