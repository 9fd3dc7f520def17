"""Distributed BPE tokenizer training + encoding over a document
corpus — the missing half of a tokens pipeline: the engine doesn't
just COUNT tokens, it can learn the subword vocabulary itself at
corpus scale.

Training (Sennrich-style byte-pair encoding, restated Spark-first):

  1. corpus -> (word, freq) vocabulary table: ONE shuffle over the
     corpus (explode words, groupBy word). Natural-language corpora
     dedupe brutally here — the vocab table is a few million rows no
     matter how many TB the corpus is — and the corpus is NEVER read
     again.
  2. per merge iteration, entirely on the vocab table:
       a. pair counts: explode adjacent symbol pairs weighted by word
          freq, one partial-agg'd groupBy (vocab-sized shuffle), take
          the top pair (count DESC, pair ASC — a deterministic
          tie-break both engines share).
       b. apply the merge: a pure-Catalyst string FOLD per word
          (F.aggregate over the symbol array) with exact leftmost-
          greedy semantics — 'a a a a a a' + (a,a) -> 'aa aa aa',
          matching the reference BPE implementations. Zero shuffle,
          zero Python.
     Lineage is truncated every ``checkpoint_every`` iterations
     (localCheckpoint on the vocab-sized table — the standard
     iterative-algorithm device, same as GraphX; the corpus-sized
     data is long gone by then).

  M merges therefore cost one corpus shuffle + M vocab-sized aggs.
  A naive implementation re-tokenizes the corpus M times.

Encoding:

  - ``encode_words``: the trained vocab table IS the encoder for
    in-corpus words (training already applied every merge to every
    word) — encoding a corpus is a broadcast-ready join, no per-row
    loop at all.
  - ``encode_text_udf``: rank-greedy encoder for UNSEEN text as an
    Arrow-batched pandas UDF (repeatedly merge the lowest-rank
    adjacent pair — provably equivalent to applying the merge list in
    order). The per-word loop is data-dependent, which Catalyst can't
    express for an unbounded merge list; the UDF is map-only and
    vectorized, the acceptable Python path.

Pre-tokenization: lowercase + ``[a-z]+`` word extraction — a standard
BPE normalization choice that also keeps the DuckDB oracle's collation
trivially identical to Spark's for the tie-break ordering.

Reference anchor: beyond the reference (no tokenizer surface there);
the algorithm follows the public BPE literature (Sennrich et al.,
"Neural Machine Translation of Rare Words with Subword Units").
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_RE = "[a-z]+"


def word_freqs(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq, syms) vocabulary table: one corpus shuffle. syms =
    the word's symbols joined by single spaces (initially its chars);
    every merge iteration rewrites syms in place."""
    words = df.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col(f"`{text_col}`")),
                                 F.lit(WORD_RE), 0)
        ).alias("word")
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .select(
            "word", "freq",
            F.trim(F.regexp_replace("word", "(.)", "$1 ")).alias("syms"),
        )
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Frequency of each adjacent symbol pair across the vocab,
    weighted by word freq — one vocab-sized partial-agg'd shuffle."""
    arr = F.split("syms", " ")
    idx = F.when(F.size(arr) >= 2, F.sequence(F.lit(2), F.size(arr))) \
        .otherwise(F.array().cast("array<int>"))
    pairs = F.transform(
        idx,
        lambda i: F.concat(F.element_at(arr, i - 1), F.lit(" "),
                           F.element_at(arr, i)),
    )
    return (
        vocab.select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def merge_fold(syms: Column, a: str, b: str) -> Column:
    """Apply ONE merge (a,b) to a space-joined symbol string with
    exact leftmost-greedy semantics, as a pure-Catalyst fold: walk the
    symbols; when the accumulated string ends with symbol ``a`` and
    the next symbol is ``b``, splice them into ``ab``. The just-merged
    'ab' can never re-merge with the next symbol under the same rule
    (it would have to EQUAL ``a``, impossible with non-empty ``b``) —
    which is exactly the greedy non-overlap the reference
    implementations have. tests/test_bpe.py pins this against a
    pure-Python reference, repeated-symbol runs included."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    arr = F.split(syms, " ")
    tail = F.slice(arr, 2, F.greatest(F.size(arr) - 1, F.lit(0)))

    def step(acc, x):
        is_m = ((acc == la) | acc.endswith(F.concat(F.lit(" "), la))) & (x == lb)
        return F.when(
            is_m,
            F.concat(
                F.substring(acc, F.lit(1), F.length(acc) - F.length(la)),
                lab,
            ),
        ).otherwise(F.concat(acc, F.lit(" "), x))

    return F.aggregate(tail, F.element_at(arr, 1), step)


def _train_bpe_exact(
    pairs_wf: list, num_merges: int, min_freq: int
) -> tuple[list, list, list]:
    """Classic exact heap-based BPE over an in-memory (word, freq)
    list: incremental pair-count maintenance (only words containing the
    merged pair are touched) + a lazy-deletion heap ordered by
    (-cnt, 'a b') — the SAME (count DESC, pair ASC) tie-break as the
    distributed loop's orderBy, so the merge lists are byte-identical
    (pytest-pinned). Per-word application is leftmost-greedy
    non-overlapping, matching merge_fold. Returns (merges, symbol
    lists, freqs)."""
    import heapq
    from collections import defaultdict

    words = [list(w) for w, _ in pairs_wf]
    freqs = [int(f) for _, f in pairs_wf]
    pair_cnt: dict = defaultdict(int)
    pair_words: dict = defaultdict(set)
    for i, syms in enumerate(words):
        f = freqs[i]
        for j in range(len(syms) - 1):
            p = (syms[j], syms[j + 1])
            pair_cnt[p] += f
            pair_words[p].add(i)
    heap = [(-c, f"{p[0]} {p[1]}", p) for p, c in pair_cnt.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negc, _k, p = heapq.heappop(heap)
            if pair_cnt.get(p, 0) == -negc and -negc > 0:
                best, bc = p, -negc
                break
        if best is None or bc < min_freq:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for i in sorted(pair_words.get(best, ())):
            syms, f = words[i], freqs[i]
            for j in range(len(syms) - 1):
                p = (syms[j], syms[j + 1])
                pair_cnt[p] -= f
                pair_words[p].discard(i)
                if pair_cnt[p] > 0:
                    heapq.heappush(
                        heap, (-pair_cnt[p], f"{p[0]} {p[1]}", p)
                    )
            out, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and syms[j] == a and syms[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for j in range(len(out) - 1):
                p = (out[j], out[j + 1])
                pair_cnt[p] += f
                pair_words[p].add(i)
                if pair_cnt[p] > 0:
                    heapq.heappush(
                        heap, (-pair_cnt[p], f"{p[0]} {p[1]}", p)
                    )
        pair_cnt.pop(best, None)
        pair_words.pop(best, None)
    return merges, words, freqs


def train_bpe(
    df: DataFrame,
    text_col: str,
    num_merges: int,
    min_freq: int = 2,
    checkpoint_every: int = 8,
    return_vocab: bool = False,
    driver_max_words: int = 2_000_000,
):
    """Learn ``num_merges`` BPE merges. Returns the ordered merge list
    [(left, right), ...]; with ``return_vocab=True`` returns
    (merges, vocab_df) where vocab_df is the (word, freq, syms) table
    with ALL merges applied — the corpus-word encoder (see
    encode_words). Stops early when no pair reaches ``min_freq``.

    Two arms behind one contract (corpus shuffled once either way):

    * vocab <= ``driver_max_words`` rows: pull (word, freq) to the
      driver — a natural-language vocabulary is 10^5-10^6 rows
      (~100 MB at the 2M bound) no matter how many TB the corpus is —
      and run classic exact heap BPE there (_train_bpe_exact). A real
      30k-merge tokenizer takes seconds instead of 30k sequential
      Spark jobs; the merge list is byte-identical to the distributed
      loop's (shared tie-break, pytest-pinned).
    * bigger vocabularies keep the distributed loop: M vocab-sized
      aggs, ONE scalar row to the driver per merge."""
    vocab = word_freqs(df, text_col).persist()
    n_words = vocab.count()
    if n_words <= driver_max_words:
        wf = [(r["word"], r["freq"]) for r in
              vocab.select("word", "freq").collect()]
        merges, syms_lists, _ = _train_bpe_exact(wf, num_merges, min_freq)
        if not return_vocab:
            vocab.unpersist()
            return merges
        spark = df.sparkSession
        enc_vocab = spark.createDataFrame(
            [(w, int(f), " ".join(s))
             for (w, f), s in zip(wf, syms_lists)],
            "word string, freq long, syms string",
        )
        vocab.unpersist()
        return merges, enc_vocab
    prev = vocab
    merges: list[tuple[str, str]] = []
    for it in range(num_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_freq:
            break
        # symbols never contain spaces (words were split on
        # whitespace), so the pair splits unambiguously
        a, b = top[0]["pair"].split(" ", 1)
        merges.append((a, b))
        vocab = vocab.select(
            "word", "freq", merge_fold(F.col("syms"), a, b).alias("syms")
        )
        if (it + 1) % checkpoint_every == 0:
            # truncate the M-deep expression lineage on the
            # vocab-sized table (NOT corpus-sized); the previous
            # persist is released once the checkpoint materializes
            vocab = vocab.localCheckpoint()
            prev.unpersist()
            prev = vocab
    if return_vocab:
        return merges, vocab
    prev.unpersist()
    return merges


def encode_words(corpus: DataFrame, text_col: str, vocab: DataFrame,
                 id_col: str) -> DataFrame:
    """Encode every document's words with the trained vocab table:
    explode words -> join the vocab's fully-merged syms (training
    already encoded every in-corpus word) -> per-doc piece counts.
    Returns (id_col, n_words, n_pieces). The join side is the vocab
    table — broadcast-able for natural-language vocabularies."""
    words = corpus.select(
        F.col(f"`{id_col}`"),
        F.explode(
            F.regexp_extract_all(F.lower(F.col(f"`{text_col}`")),
                                 F.lit(WORD_RE), 0)
        ).alias("word"),
    ).filter(F.col("word") != "")
    enc = words.join(F.broadcast(vocab.select("word", "syms")), "word")
    return (
        enc.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.size(F.split("syms", " "))).cast("long")
            .alias("n_pieces"),
        )
    )


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Rank-greedy BPE encode of one word — equivalent to applying the
    merge list in order (a merge can only create pairs whose own merge
    has a HIGHER rank, so lowest-rank-first reproduces the sequential
    application)."""
    syms = list(word)
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        # merge EVERY occurrence of the winning pair left-to-right
        # (one merge application, greedy non-overlapping)
        a, b = syms[best_i], syms[best_i + 1]
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def encode_text_udf(merges: list[tuple[str, str]]):
    """Arrow-batched pandas UDF encoding arbitrary (unseen) text to
    BPE pieces with the trained merge list: map-only, vectorized
    transfer, a per-batch LRU of word encodings (words repeat
    heavily, so most lookups are dict hits, not merge loops)."""
    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    word_re = re.compile(WORD_RE)

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(t):
            pieces: list[str] = []
            for w in word_re.findall((t or "").lower()):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                pieces.extend(got)
            return pieces

        return texts.map(one)

    return enc
