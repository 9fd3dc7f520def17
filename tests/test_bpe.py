"""Distributed BPE training/encoding (operators/bpe.py) pinned
against a pure-Python reference implementation of Sennrich-style BPE
— merge lists, per-word symbol states, and encodings must match
exactly, repeated-symbol pathologies included."""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from qwery_spark.operators.bpe import (
    WORD_RE,
    encode_text_udf,
    encode_words,
    merge_fold,
    train_bpe,
    word_freqs,
)

CORPUS = [
    "the cat sat on the mat",
    "the bat and the cat chat",
    "that hat is the best hat",
    "aaaa aa aaaaaa banana bandana",
    "she sells sea shells on the sea shore",
]


# ---------------- pure-Python reference ----------------
def _ref_word_freqs(texts):
    c = Counter()
    for t in texts:
        c.update(re.findall(WORD_RE, t.lower()))
    return c


def _ref_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_train(texts, num_merges, min_freq=2):
    wf = {w: (list(w), f) for w, f in _ref_word_freqs(texts).items()}
    merges = []
    for _ in range(num_merges):
        pc = Counter()
        for syms, f in wf.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        # count DESC, pair ASC — the engine's deterministic tie-break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_freq:
            break
        merges.append((a, b))
        wf = {w: (_ref_merge(s, a, b), f) for w, (s, f) in wf.items()}
    return merges, {w: s for w, (s, f) in wf.items()}


def _corpus_df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)],
                                 "doc_id long, text string")


def test_train_matches_reference(spark):
    merges, vocab = train_bpe(_corpus_df(spark), "text", 8,
                              return_vocab=True)
    ref_merges, ref_vocab = _ref_train(CORPUS, 8)
    assert merges == ref_merges
    got = {r["word"]: r["syms"].split(" ") for r in vocab.collect()}
    assert got == ref_vocab


def test_train_checkpoint_boundary_stable(spark):
    # checkpoint_every smaller than num_merges: lineage truncation
    # must not change a single merge
    merges = train_bpe(_corpus_df(spark), "text", 8, checkpoint_every=3)
    ref_merges, _ = _ref_train(CORPUS, 8)
    assert merges == ref_merges


def test_merge_fold_pathological_runs(spark):
    """Repeated-symbol runs — where naive string replace diverges from
    greedy — must match the reference exactly."""
    cases = ["a a a", "a a a a", "a a a a a a", "b a a", "a", "a b a a b"]
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    got = [r["m"] for r in
           df.select(merge_fold(F.col("s"), "a", "a").alias("m")).collect()]
    want = [" ".join(_ref_merge(s.split(" "), "a", "a")) for s in cases]
    assert got == want


def test_min_freq_stops_training(spark):
    # every pair in a unique-chars corpus occurs once -> min_freq=2
    # learns nothing
    df = spark.createDataFrame([("qwxz vbnm",)], "text string")
    assert train_bpe(df, "text", 5) == []


def test_encode_words_counts(spark):
    df = _corpus_df(spark)
    merges, vocab = train_bpe(df, "text", 6, return_vocab=True)
    _, ref_vocab = _ref_train(CORPUS, 6)
    enc = {r["doc_id"]: (r["n_words"], r["n_pieces"])
           for r in encode_words(df, "text", vocab, "doc_id").collect()}
    for i, t in enumerate(CORPUS):
        words = re.findall(WORD_RE, t.lower())
        want_pieces = sum(len(ref_vocab[w]) for w in words)
        assert enc[i] == (len(words), want_pieces)


def test_encode_udf_matches_sequential_merge_application(spark):
    """Rank-greedy UDF encoding == applying the merge list in order
    (the classic equivalence), for in-corpus AND unseen words."""
    merges = train_bpe(_corpus_df(spark), "text", 8)
    texts = CORPUS + ["the theatre that never was", "catamaran chatter"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["p"] for r in
           df.select(encode_text_udf(merges)(F.col("text")).alias("p"))
           .collect()]
    for t, pieces in zip(texts, got):
        want = []
        for w in re.findall(WORD_RE, t.lower()):
            syms = list(w)
            for a, b in merges:
                syms = _ref_merge(syms, a, b)
            want.extend(syms)
        assert pieces == want, t


def test_word_freqs_one_row_per_word(spark):
    wf = word_freqs(_corpus_df(spark), "text")
    rows = {r["word"]: (r["freq"], r["syms"]) for r in wf.collect()}
    ref = _ref_word_freqs(CORPUS)
    assert {w: f for w, (f, _) in rows.items()} == dict(ref)
    assert rows["the"][1] == "t h e"


def test_driver_exact_arm_matches_distributed_loop(spark):
    """The round-7 driver-side exact heap BPE (vocab under
    driver_max_words) must produce a merge list BYTE-IDENTICAL to the
    distributed per-iteration loop — shared (count DESC, pair ASC)
    tie-break and leftmost-greedy application. Encoder vocab parity
    rides along (same words, same final syms)."""
    df = _corpus_df(spark)
    m_driver, v_driver = train_bpe(df, "text", 12, return_vocab=True)
    m_dist, v_dist = train_bpe(
        df, "text", 12, return_vocab=True, driver_max_words=0
    )
    assert m_driver == m_dist
    got = {r["word"]: (r["freq"], r["syms"]) for r in v_driver.collect()}
    want = {r["word"]: (r["freq"], r["syms"]) for r in v_dist.collect()}
    assert got == want


def test_driver_exact_arm_reaches_real_vocab_sizes(spark):
    """1,000 merges on the driver arm complete in interactive time
    (the distributed loop would be 1,000 sequential Spark jobs) and
    stay internally consistent: every learned pair was adjacent
    somewhere, ranks are unique."""
    import time

    df = _corpus_df(spark)
    t0 = time.monotonic()
    merges = train_bpe(df, "text", 1000, min_freq=1)
    assert time.monotonic() - t0 < 60
    assert len(merges) == len(set(merges))
    assert all(a and b for a, b in merges)
