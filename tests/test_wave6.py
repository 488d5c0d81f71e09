"""Wave 6: BPE training parity + grouped-agg pandas UDAF."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.bpe import (
    EOW,
    bpe_segment,
    bpe_train,
    bpe_train_batched,
)
from dissertation_data_pipeline_spark.operators.udafs import label_dim_medians


# --- independent reference implementation (Sennrich 2016, sequential) ----

def _ref_word_freqs(texts):
    c = Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if w:
                c[w] += 1
    return c


def _ref_pair_counts(word_syms, freqs):
    pc = Counter()
    for w, syms in word_syms.items():
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += freqs[w]
    return pc


def _ref_merge_word(syms, a, b):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _ref_bpe_train(texts, num_merges, min_pair_count=2):
    freqs = _ref_word_freqs(texts)
    word_syms = {w: list(w) + [EOW] for w in freqs}
    merges = []
    for _ in range(num_merges):
        pc = _ref_pair_counts(word_syms, freqs)
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        word_syms = {w: _ref_merge_word(s, a, b) for w, s in word_syms.items()}
    return merges, word_syms


TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest new low",
    "the lowest and the newest",
]


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)]
    )
    merges, words = bpe_train(docs, num_merges=12)
    ref_merges, ref_syms = _ref_bpe_train(TEXTS, 12)
    assert merges == ref_merges
    got = {r.word: list(r.syms) for r in words.collect()}
    assert got == ref_syms


def test_bpe_segment_empty_doc_yields_no_tokens(spark):
    # empty/whitespace-only docs must tokenize to ZERO tokens — the
    # whitespace split's empty words are filtered before segmentation,
    # matching the training path's length>0 rule (an unfiltered empty
    # word would emit a phantom '</w>' and inflate token counts)
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text="   "), Row(doc_id=3, text="ab")]
    )
    got = {r.doc_id: list(r.bpe_tokens) for r in bpe_segment(docs, []).collect()}
    assert got[1] == [] and got[2] == []
    assert got[3] == ["a", "b", EOW]


def test_bpe_train_early_stop(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="a b c")])
    # every word is a single char: pairs are (char, EOW) with count 1
    merges, _ = bpe_train(docs, num_merges=10, min_pair_count=2)
    assert merges == []


def test_bpe_segment_applies_merges(spark):
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)])
    merges, _ = bpe_train(docs, num_merges=8)
    seg = bpe_segment(docs, merges).select("doc_id", "bpe_tokens").collect()
    ref_merges, ref_syms = _ref_bpe_train(TEXTS, 8)
    for r in seg:
        expect = []
        for w in TEXTS[r.doc_id].lower().strip().split():
            syms = list(w) + [EOW]
            for a, b, _ in ref_merges:
                syms = _ref_merge_word(syms, a, b)
            expect.extend(syms)
        assert list(r.bpe_tokens) == expect


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bpe_train_randomized_parity(spark, seed):
    rng = np.random.default_rng(seed)
    vocab = ["ab", "abc", "bca", "aa", "cab", "bb", "abab", "ca"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 9)))
        for _ in range(12)
    ]
    docs = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    merges, _ = bpe_train(docs, num_merges=6)
    ref_merges, _ = _ref_bpe_train(texts, 6)
    assert merges == ref_merges


def test_bpe_batched_batch1_is_exact_sequential(spark):
    """batch=1 must reproduce the sequential trainer exactly (same
    argmax, same tiebreak) — the parity anchor for the batched path."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)]
    )
    seq_merges, _ = bpe_train(docs, num_merges=10)
    bat_merges, _, rounds = bpe_train_batched(docs, num_merges=10, batch=1)
    assert bat_merges == seq_merges
    assert rounds == len(seq_merges)


def test_bpe_batched_reduces_rounds(spark):
    """The whole point: ~batch-fold fewer driver round-trips, and each
    round's accepted pairs are pairwise symbol-disjoint."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)]
    )
    merges, words, rounds = bpe_train_batched(docs, num_merges=12, batch=4)
    assert len(merges) == 12
    assert rounds <= (12 + 3) // 4 + 2  # ~12/4 rounds, conflict slack
    assert rounds < 12  # strictly fewer jobs than sequential
    # final symbol table is consistent: every word re-joins to itself
    for r in words.collect():
        assert "".join(s for s in r.syms if s != EOW).replace(EOW, "") \
            == r.word.replace(EOW, "")


def test_bpe_batched_same_vocabulary_on_separated_corpus(spark):
    """Well-separated frequencies over disjoint alphabets: batched BPE
    learns the SAME merge set as sequential (order differs — sequential
    cascades each word's (token, EOW) merge immediately; batching
    defers it one round because every EOW pair shares the EOW symbol)
    in strictly fewer driver round-trips."""
    texts = ["ab"] * 40 + ["cd"] * 30 + ["ef"] * 20 + ["gh"] * 10
    docs = spark.createDataFrame([Row(doc_id=0, text=" ".join(texts))])
    seq_merges, _ = bpe_train(docs, num_merges=8)
    bat_merges, _, rounds = bpe_train_batched(docs, num_merges=8, batch=8)
    assert sorted(bat_merges) == sorted(seq_merges)
    assert rounds < 8  # 5: chars round + one EOW merge per round


def test_udaf_label_medians_exact(spark):
    rows = [
        Row(vec_id=1, label=0, embedding=[1.0, 10.0]),
        Row(vec_id=2, label=0, embedding=[3.0, 30.0]),
        Row(vec_id=3, label=0, embedding=[2.0, -20.0]),
        Row(vec_id=4, label=1, embedding=[5.0, 7.0]),
        Row(vec_id=5, label=1, embedding=[9.0, 3.0]),
    ]
    df = spark.createDataFrame(rows)
    got = {
        (r.label, r.dim): r.med
        for r in label_dim_medians(df).collect()
    }
    assert got[(0, 1)] == 2.0 and got[(0, 2)] == 10.0  # odd count: middle
    assert got[(1, 1)] == 7.0 and got[(1, 2)] == 5.0  # even count: midpair avg


def test_url_canonicalize_rules(spark):
    """Each canonicalization rule, pinned on handwritten URLs."""
    from dissertation_data_pipeline_spark.functions import urls as fu

    rows = [
        ("HTTP://WWW.Ex.COM:80/P/1?utm_source=n&b=2&a=1#f",
         "http://www.ex.com/P/1?a=1&b=2", "www.ex.com", "ex.com"),
        ("https://Ex.com:443/a/b?z=9&a=1&utm_campaign=x",
         "https://ex.com/a/b?a=1&z=9", "ex.com", "ex.com"),
        # non-default port kept; tracking-only query drops entirely
        ("https://sub.ex.co:8443/x?fbclid=abc",
         "https://sub.ex.co:8443/x", "sub.ex.co:8443", "ex.co"),
        # empty path -> '/'
        ("http://ex.org", "http://ex.org/", "ex.org", "ex.org"),
        # non-http scheme: port rules don't apply, ref param dropped
        ("ftp://F.Ex.net:80/data?ref=h&q=1",
         "ftp://f.ex.net:80/data?q=1", "f.ex.net:80", "ex.net"),
        # not a URL -> NULL canon
        ("not a url 7", None, "", ""),
        # case preserved in path/query
        ("https://A.B/Path?Q=Vv", "https://a.b/Path?Q=Vv", "a.b", "a.b"),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], "raw string")
    got = df.select(
        "raw",
        fu.canonicalize_url("raw").alias("c"),
        fu.url_host("raw").alias("h"),
        fu.url_registered_domain("raw").alias("d"),
    ).collect()
    by_raw = {r["raw"]: r for r in got}
    for raw, canon, host, dom in rows:
        r = by_raw[raw]
        assert r["c"] == canon, (raw, r["c"])
        assert r["h"] == host, (raw, r["h"])
        assert r["d"] == dom, (raw, r["d"])
