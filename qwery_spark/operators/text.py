"""Text-analysis operators: token counting, quality scoring,
fingerprinting, language-marker scoring. All pure Catalyst expressions
(whole-stage codegen, zero shuffle for the per-doc stages)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on")

# Real-language marker sets for marker_lang_scores: small lists of
# high-frequency function words (standard public stopword lists — the
# classic n-gram/stopword language-ID heuristic). The suite's
# lang_id_markers query instead uses the SYNTHETIC corpus's vocabulary
# classes (the test documents aren't natural language); these are the
# sets a real pipeline passes in.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "that", "with", "for"),
    "de": ("der", "die", "das", "und", "nicht", "ist", "ich", "mit"),
    "fr": ("le", "la", "les", "est", "je", "pas", "pour", "dans"),
    "es": ("el", "los", "las", "una", "por", "pero", "como", "más"),
    "it": ("il", "gli", "che", "di", "non", "sono", "anche", "della"),
    "pt": ("o", "os", "uma", "não", "para", "com", "mais", "você"),
}


def token_stats(df: DataFrame, key: str, text_col: str) -> DataFrame:
    words = F.split(F.col(text_col), r"\s+")
    return df.select(
        key,
        F.size(words).alias("n_words"),
        F.length(text_col).alias("n_chars"),
        F.round(F.length(text_col).cast("double") / F.size(words), 6).alias("chars_per_word"),
    )


def quality_score(
    df: DataFrame, key: str, text_col: str, stopwords: tuple = STOPWORDS,
    min_words: int = 20, max_words: int = 1000, min_stop_ratio: float = 0.05,
) -> DataFrame:
    ws = F.split(F.col(text_col), r"\s+")
    stop_hits = F.size(F.filter(ws, lambda w: w.isin(*stopwords)))
    n_words = F.size(ws)
    ratio = stop_hits * F.lit(1.0) / n_words
    return df.select(
        key,
        n_words.alias("n_words"),
        F.round(ratio, 6).alias("stopword_ratio"),
        F.when((n_words.between(min_words, max_words)) & (ratio > min_stop_ratio), "good")
        .when(n_words < 5, "too_short")
        .otherwise("suspect")
        .alias("quality"),
    )


def fingerprint(df: DataFrame, key: str, text_col: str) -> DataFrame:
    """md5-based document fingerprints (rolling-hash analogue)."""
    return df.select(
        key,
        F.substring(F.md5(text_col), 1, 16).alias("fp64"),
        F.md5(F.concat(F.col(key).cast("string"), F.lit(":"), F.col(text_col))).alias(
            "salted_fp"
        ),
    )


def marker_lang_scores(
    df: DataFrame, key: str, text_col: str, markers: dict[str, tuple[str, ...]]
) -> DataFrame:
    """Language-ID by marker-word hit counts: for each language, count
    how many of its marker words appear; guess = argmax (ties -> first
    language in dict order). markers = {'en': ('the','and',...), ...}"""
    ws = F.split(F.col(text_col), r"\s+")
    score_cols = [
        F.size(F.filter(ws, lambda w: w.isin(*words))).alias(f"score_{lang}")
        for lang, words in markers.items()
    ]
    scored = df.select(key, *score_cols)
    langs = list(markers)
    best = F.greatest(*[F.col(f"score_{l}") for l in langs])
    # first language (dict order) wins ties
    guess = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        guess = F.when(F.col(f"score_{lang}") == best, lang).otherwise(guess)
    return scored.select(key, *[f"score_{l}" for l in langs], guess.alias("lang_guess"))


# patterns shared by pii_scrub and its DuckDB oracle: RE2-compatible
# (no lookaround), so Spark's Java regex and DuckDB's RE2 agree
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
}


def pii_scrub(
    df: DataFrame, text_col: str, patterns: dict[str, str] | None = None
) -> DataFrame:
    """Redact PII spans (default: emails + NNN-NNN-NNNN phones) from
    ``text_col``, appending ``<col>_scrubbed`` and per-pattern
    ``n_<kind>`` match counts. Pure Catalyst regexp_replace /
    regexp_extract_all — zero shuffle, map-only at any scale. Patterns
    must stay RE2-compatible so the DuckDB oracle (suite
    text_pii_scrub) sees identical semantics."""
    patterns = PII_PATTERNS if patterns is None else patterns
    out = df
    scrubbed = F.col(text_col)
    for kind, pat in patterns.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))),
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{kind}>")
    return out.withColumn(f"{text_col}_scrubbed", scrubbed)


def word_ngrams(text_col: str, n: int):
    """array<string> column expression of space-joined word n-grams
    (documents are whitespace-tokenized). Map-only; used by
    decontaminate."""
    words = F.split(F.col(text_col), " ")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(words, i + 1, n), " "),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    key: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word
    ``n``-gram with the benchmark set — (key, n_shared) per contaminated
    doc, n_shared = distinct benchmark n-grams present.

    Scale shape: the benchmark n-gram set is tiny next to the corpus
    (that is the point of a benchmark), so the join side is
    F.broadcast and runs FIRST — the corpus explode streams map-side
    against the hashed benchmark set with no shuffle; only the matched
    (doc, gram) pairs (bounded by |docs| x |bench grams|, in practice a
    sliver of the corpus) pay the distinct + per-doc count shuffle. At
    100 TB this is one broadcast + one small count shuffle keyed by
    doc."""
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(text_col, n)).alias("g")
        )
        .filter(F.col("g") != "")
        .distinct()
    )
    return (
        corpus.select(F.col(key), F.explode(word_ngrams(text_col, n)).alias("g"))
        .join(F.broadcast(bench_grams), "g")
        .distinct()
        .groupBy(key)
        .agg(F.count("*").alias("n_shared"))
    )


def repetition_stats(
    df: DataFrame,
    key: str,
    text_col: str,
    dup_word_thresh: float = 0.55,
    top_bigram_thresh: float = 0.04,
) -> DataFrame:
    """Gopher-style repetition quality rules (Rae et al. 2021 filter
    heavily-repetitive documents before LM training): per-doc duplicate
    word fraction and the share of bigrams taken by the single most
    frequent bigram, plus the combined reject flag.

    Scale shape: ENTIRELY map-side — zero shuffle at any corpus size.
    The naive plan (explode bigrams -> groupBy(doc, gram) -> max per
    doc) shuffles ~|words| rows; instead the per-doc top-bigram count
    is the longest equal-run in the SORTED bigram array, computed with
    array_sort + aggregate() inside one projection — a single map
    stage over the scan (HOFs sit outside codegen but stay JVM-side;
    .explain shows zero Exchange, gated in tests/test_plans.py).
    """
    ws = F.split(F.col(text_col), r"\s+")
    n_words = F.size(ws)
    dup_frac = F.round(
        (n_words - F.size(F.array_distinct(ws))) * F.lit(1.0) / n_words, 6
    )
    # longest equal-run over the sorted bigram array == max bigram count
    top_count = F.expr(
        """
        aggregate(
          array_sort(
            zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)),
                     slice(ws, 2, greatest(size(ws) - 1, 0)),
                     (a, b) -> concat(a, ' ', b))),
          named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0),
          (acc, x) -> IF(acc.prev IS NOT NULL AND x = acc.prev,
            named_struct('prev', x, 'run', acc.run + 1,
                         'best', greatest(acc.best, acc.run + 1)),
            named_struct('prev', x, 'run', 1, 'best', greatest(acc.best, 1))),
          acc -> acc.best)
        """
    )
    n_bigrams = F.greatest(n_words - 1, F.lit(1))
    return (
        df.withColumn("ws", ws)
        .select(
            key,
            n_words.alias("n_words"),
            dup_frac.alias("dup_word_frac"),
            top_count.alias("top_bigram_count"),
            F.round(top_count * F.lit(1.0) / n_bigrams, 6).alias("top_bigram_frac"),
        )
        .withColumn(
            "is_repetitive",
            (F.col("dup_word_frac") > dup_word_thresh)
            | (F.col("top_bigram_frac") > top_bigram_thresh),
        )
    )


def token_budget_sample(
    df: DataFrame,
    key: str,
    text_col: str,
    group_col: str,
    budget: int,
) -> DataFrame:
    """Mixture sampling under a per-group token budget: within each
    group (domain/source), take documents in deterministic md5(key)
    order until the cumulative whitespace-token count reaches
    ``budget`` (a document is kept iff it STARTS inside the budget —
    so the output slightly overshoots, never undershoots, matching how
    training mixtures cap domains).

    Scale shape: the cumulative sum uses the range-partition + offset
    scheme (operators/rank.py), NOT a per-group window — a per-group
    window puts each group's entire corpus through one task, and real
    mixtures have few, huge groups (the 100-TB failure mode). Cost: one
    range shuffle + a bounded (partitions x resident groups) driver
    collect + a broadcast."""
    from qwery_spark.operators.rank import with_group_cumsum

    n_tok = F.size(F.split(F.col(text_col), r"\s+"))
    slim = df.select(key, group_col, n_tok.alias("n_tok")).withColumn(
        "_ord", F.md5(F.col(key).cast("string"))
    )
    cum = with_group_cumsum(slim, group_col, ["_ord"], "n_tok", cum_col="cum_tok")
    return (
        cum.filter(F.col("cum_tok") - F.col("n_tok") < budget)
        .select(key, group_col, "n_tok", "cum_tok")
    )


def wordfreq_logprob(
    df: DataFrame,
    key: str,
    text_col: str,
    top_k: int = 65536,
) -> DataFrame:
    """Unigram-LM quality proxy (the KenLM-perplexity-filter shape used
    by CCNet/RedPajama-style pipelines, with the corpus itself as the
    LM): per-doc mean log-probability of its words under the corpus
    unigram distribution. Low scores = rare-word soup (OCR garbage,
    boilerplate hashes); high = natural text.

    Scale shape: the vocabulary is aggregated with one map-side-partial
    groupBy (output is vocab-sized, not corpus-sized), truncated to a
    DETERMINISTIC top_k (count desc, word asc — no tie ambiguity),
    broadcast, and joined under the exploded words; the per-doc mean is
    one partial-agg'd shuffle on the key. OOV words (beyond top_k) get
    the floor probability 1/total. The rank window runs on the
    POST-AGG vocab table (tiny), so its single-partition stage is
    bounded by vocabulary, never corpus."""
    from pyspark.sql import Window

    ws = F.split(F.col(text_col), r"\s+")
    words = df.select(key, F.explode(ws).alias("w"))
    vocab = words.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt")).collect()[0][0] or 1
    top = (
        vocab.withColumn(
            "_r",
            F.row_number().over(
                Window.orderBy(F.col("cnt").desc(), F.col("w").asc())
            ),
        )
        .filter(F.col("_r") <= top_k)
        .select("w", F.log(F.col("cnt") * F.lit(1.0) / F.lit(total)).alias("logp"))
    )
    floor = F.log(F.lit(1.0) / F.lit(total))
    return (
        words.join(F.broadcast(top), "w", "left")
        .groupBy(key)
        .agg(
            F.round(F.avg(F.coalesce(F.col("logp"), floor)), 6).alias("avg_logp"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )
