"""Property-based tests (hypothesis) for the scalar/dedup invariants.

Each hypothesis example builds ONE small DataFrame carrying every
generated value, so an example costs one Spark job, not one per value.
Examples are capped low — these are invariant probes on top of the
exhaustive DuckDB-oracle gate, not a replacement for it.
"""

from __future__ import annotations

import calendar
import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.functions.dates import parse_date_multi
from dissertation_data_pipeline_spark.functions.text import (
    bill_number_variants,
    normalize_bill_number,
    word_count,
)
from dissertation_data_pipeline_spark.operators.dedup import dedup_latest_per_key
from dissertation_data_pipeline_spark.operators.dedup_ext import (
    simhash,
    tokenset_dedup_groups,
)

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: ASCII-only text: Java's \s is ASCII; Python's str.split is unicode —
#: the engine pins ASCII semantics, so the generator does too
_ASCII = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)

_WORDS = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=6), min_size=1, max_size=12
)


@SET
@given(st.lists(_ASCII, min_size=1, max_size=30))
def test_normalize_bill_number_idempotent_and_canonical(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "raw string")
    out = df.select(
        normalize_bill_number("raw").alias("once"),
        normalize_bill_number(normalize_bill_number("raw")).alias("twice"),
    ).collect()
    for r in out:
        assert r["once"] == r["twice"]  # idempotent
        assert " " not in r["once"] and "." not in r["once"]  # canonical form


@SET
@given(st.lists(_ASCII, min_size=1, max_size=30))
def test_word_count_matches_python_split(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "raw string")
    out = df.select("raw", word_count("raw").alias("wc")).collect()
    for r in out:
        assert r["wc"] == len(r["raw"].split())


_FMT_RENDER = {
    "yyyy-MM-dd": lambda d: f"{d.year:04d}-{d.month:02d}-{d.day:02d}",
    "yyyy/MM/dd": lambda d: f"{d.year:04d}/{d.month:02d}/{d.day:02d}",
    "MM/dd/yyyy": lambda d: f"{d.month:02d}/{d.day:02d}/{d.year:04d}",
    "MM-dd-yyyy": lambda d: f"{d.month:02d}-{d.day:02d}-{d.year:04d}",
    "MM/dd/yy": lambda d: f"{d.month:02d}/{d.day:02d}/{d.year % 100:02d}",
    "MM-dd-yy": lambda d: f"{d.month:02d}-{d.day:02d}-{d.year % 100:02d}",
    "MMMM d, yyyy": lambda d: f"{calendar.month_name[d.month]} {d.day}, {d.year:04d}",
    "MMM d, yyyy": lambda d: f"{calendar.month_abbr[d.month]} {d.day}, {d.year:04d}",
}


@SET
@given(
    st.lists(
        st.tuples(
            st.dates(dt.date(2000, 1, 1), dt.date(2060, 12, 31)),
            st.sampled_from(sorted(_FMT_RENDER)),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_parse_date_multi_roundtrips_every_format(spark, cases):
    # 2-digit-year formats can only round-trip within the 2000-2099
    # pivot window — which the generator range already guarantees
    rendered = [(i, _FMT_RENDER[f](d)) for i, (d, f) in enumerate(cases)]
    df = spark.createDataFrame(rendered, "i int, raw string")
    got = {
        r["i"]: r["parsed"]
        for r in df.select("i", parse_date_multi("raw").alias("parsed")).collect()
    }
    for i, (d, f) in enumerate(cases):
        assert got[i] == d, (d, f, rendered[i][1], got[i])


@SET
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="ABCDEFGH", min_size=1, max_size=3),
            st.integers(1, 99999),
            st.sampled_from(["{p}{n}", "{p} {n}", "{p}. {n}", "{p}.{n}"]),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_bill_number_variants_all_normalize_to_compact(spark, bills):
    # every generated variant family collapses to one canonical form,
    # and the emitted variant list re-normalizes to exactly that form
    raws = []
    for i, (p, n, shape) in enumerate(bills):
        dotted_p = "".join(ch + "." for ch in p) if "." in shape else p
        raws.append((i, shape.format(p=dotted_p if shape == "{p}. {n}" else p, n=n)))
    df = spark.createDataFrame(raws, "i int, raw string")
    out = df.select(
        "i",
        normalize_bill_number("raw").alias("compact"),
        bill_number_variants("raw").alias("variants"),
    ).collect()
    renorm = spark.createDataFrame(
        [(r["i"], v) for r in out for v in r["variants"]], "i int, v string"
    ).select("i", normalize_bill_number("v").alias("c")).collect()
    compact = {r["i"]: r["compact"] for r in out}
    for r in renorm:
        assert r["c"] == compact[r["i"]]
    for r in out:
        assert len(set(r["variants"])) == len(r["variants"])  # stable dedup


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 50)),
        min_size=1,
        max_size=40,
    )
)
def test_dedup_latest_per_key_matches_reference_and_ignores_order(spark, rows):
    data = [(k, v, i) for i, (k, v) in enumerate(rows)]  # i: unique tiebreak
    df = spark.createDataFrame(data, "k int, v int, uid int")
    got = {
        (r["k"], r["v"], r["uid"])
        for r in dedup_latest_per_key(df, "k", ["v"], tiebreak=["uid"]).collect()
    }
    # driver-side reference: per key, max v; tie -> min uid
    want = {}
    for k, v, uid in data:
        cur = want.get(k)
        if cur is None or (v, -uid) > (cur[1], -cur[2]):
            want[k] = (k, v, uid)
    assert got == set(want.values())
    # partitioning/order invariance
    reshuffled = dedup_latest_per_key(
        df.repartition(7).orderBy(F.desc("uid")), "k", ["v"], tiebreak=["uid"]
    )
    assert {(r["k"], r["v"], r["uid"]) for r in reshuffled.collect()} == got


@SET
@given(st.lists(_WORDS, min_size=1, max_size=12))
def test_shuffled_token_copies_collapse(spark, docs):
    """simhash and the token-set digest are order-insensitive: a doc
    and its word-reversed copy always collapse."""
    rows = []
    for i, words in enumerate(docs):
        words = [*words, f"uid{i}"]  # unique marker: no cross-doc collisions
        rows.append((2 * i, " ".join(words)))
        rows.append((2 * i + 1, " ".join(reversed(words))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = tokenset_dedup_groups(df, "doc_id", "text").collect()
    assert all(g["n_copies"] == 2 for g in groups)
    assert len(groups) == len(docs)
    sh = df.select("doc_id", simhash("text").alias("s")).collect()
    by_doc = {r["doc_id"]: r["s"] for r in sh}
    for i in range(len(docs)):
        assert by_doc[2 * i] == by_doc[2 * i + 1]


@SET
@given(
    st.lists(
        st.tuples(st.text(alphabet="abcde", max_size=8), st.text(alphabet="abcde", max_size=8)),
        min_size=1,
        max_size=15,
    )
)
def test_thresholded_levenshtein_equals_plain(spark, pairs):
    """The early-exit 3-arg levenshtein must agree with the plain form
    on every pair: d<=k -> same distance, d>k -> -1."""
    df = spark.createDataFrame(pairs, "a string, b string")
    rows = df.select(
        F.levenshtein("a", "b").alias("d"),
        F.levenshtein("a", "b", 2).alias("dt"),
    ).collect()
    for r in rows:
        assert r["dt"] == (r["d"] if r["d"] <= 2 else -1)


@SET
@given(
    st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=20,
    )
)
def test_connected_components_agree_across_algorithms(spark, edges):
    """Min-label propagation (+ its single-task small-graph path) and
    large-star/small-star must produce identical components for any
    random edge list — including chains, cliques, and self-loop-free
    multigraphs."""
    from dissertation_data_pipeline_spark.operators.clusters import (
        connected_components,
        connected_components_star,
    )

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    a = {
        (r["doc_id"], r["component_id"])
        for r in connected_components(df).collect()
    }
    b = {
        (r["doc_id"], r["component_id"])
        for r in connected_components_star(df).collect()
    }
    assert a == b


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.sampled_from(["aa bb cc dd ee ff gg hh", "ii jj kk ll mm nn oo pp",
                         "qq rr ss tt uu vv ww xx"]),
        min_size=1,
        max_size=6,
    )
)
def test_incremental_dedup_invariants(spark, texts):
    """For ANY batch of (possibly duplicate) docs probed against an
    empty index: (1) surviving texts are unique; (2) every dropped doc
    shares a band (here: full text, since identical texts share all
    bands) with some survivor of smaller id; (3) replaying the batch
    against the grown index drops everything."""
    from dissertation_data_pipeline_spark.operators.dedup_incremental import (
        dedup_incremental,
    )

    batch = spark.createDataFrame(
        [(i, t + " " + t) for i, t in enumerate(texts)],
        "doc_id long, text string",
    )
    empty = spark.createDataFrame([], "_id long, band_idx int, band_key string")
    survivors, idx = dedup_incremental(batch, empty, "doc_id", "text")
    rows = survivors.collect()
    seen_texts = [r["text"] for r in rows]
    assert len(seen_texts) == len(set(seen_texts))  # unique contents
    # min-id survivor per duplicate family
    first_by_text = {}
    for i, t in enumerate(texts):
        first_by_text.setdefault(t, i)
    assert {r["doc_id"] for r in rows} == set(first_by_text.values())
    # replay: everything is now a known near-dup
    replay, _ = dedup_incremental(batch, idx, "doc_id", "text")
    assert replay.count() == 0
