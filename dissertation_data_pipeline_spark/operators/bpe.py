"""[EXT] Distributed BPE vocabulary training (Sennrich et al. 2016).

The tokenizer-training step of an LLM data pipeline, expressed the way
a 100 TB corpus forces you to:

1. **Corpus -> word-frequency table.** BPE statistics only depend on
   ``(word, count)``, so the trillions-of-tokens corpus reduces to a
   vocab-sized table in ONE map-side-combinable groupBy. Every
   subsequent round works on this table — the same reduction every
   published BPE trainer (subword-nmt, SentencePiece) performs
   in-memory, here as a DataFrame so it shards across executors.
2. **Iterative merges with driver-side small state.** Each round:
   adjacent symbol-pair counts (explode + hash aggregate, weighted by
   word frequency) -> global argmax with a deterministic tiebreak
   (count DESC, pair lexicographic) -> collect exactly ONE row -> apply
   the merge to every word's symbol array as a fold expression. This is
   the same driver-pattern as k-means (operators/similarity.py
   ``train_ivf``): per-round driver state is O(1), data-plane work is
   O(vocab), and the loop cuts lineage with a lazy localCheckpoint per
   round so plans don't double.

No DuckDB oracle: the per-round global argmax makes the loop
non-expressible in one SQL statement (recursive CTEs cannot aggregate
over their recursive term). Correctness evidence is parity with an
independent pure-Python reference implementation over randomized
corpora (tests/test_wave6.py), the same strategy as the reference
repo's script-vs-script consistency checks (SURVEY §5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.dedup_ext import tokens

#: end-of-word sentinel appended to every word's symbol sequence so
#: merges can't cross word boundaries (Sennrich 2016 §3.2)
EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, freq)`` from a document table — the BPE working set.

    Tokenization is ``dedup_ext.tokens`` — the ONE corpus tokenization
    rule every operator family (dedup, sketches, training stats)
    shares, so BPE statistics agree with cross-operator counts."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def initial_symbols(words: DataFrame) -> DataFrame:
    """Split each word into single-character symbols + the EOW mark."""
    chars = F.split(F.col("word"), "")  # Spark: '' pattern -> per-char array
    return words.select(
        "word",
        "freq",
        F.concat(
            F.filter(chars, lambda c: c != F.lit("")),
            F.array(F.lit(EOW)),
        ).alias("syms"),
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (empty for len<2)."""
    empty = F.array().cast("array<struct<a:string,b:string>>")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(syms) - 1),
        lambda i: F.struct(
            F.element_at(syms, i).alias("a"),
            F.element_at(syms, i + 1).alias("b"),
        ),
    )
    return F.when(F.size(syms) >= 2, pairs).otherwise(empty)


def pair_counts(symbol_words: DataFrame) -> DataFrame:
    """Corpus-wide adjacent-pair frequencies, weighted by word freq."""
    return (
        symbol_words.select(
            "freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
        )
        .groupBy("p.a", "p.b")
        .agg(F.sum("freq").alias("cnt"))
    )


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent ``(a, b)`` -> ``a+b``.

    A fold over the symbol array: if the accumulator's last element is
    ``a`` and the incoming symbol is ``b``, replace the last element
    with the merged token, else append. Matches the scan order of the
    sequential reference algorithm (in ``b b b`` with pair ``(b,b)``
    the first two merge, the third survives — the merged token no
    longer equals ``a``, so it can't cascade)."""
    merged = F.lit(a + b)
    la, lb = F.lit(a), F.lit(b)

    def step(acc: Column, s: Column) -> Column:
        last = F.element_at(acc, -1)
        return F.when(
            (F.size(acc) > 0) & (last == la) & (s == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def bpe_train(
    df: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 20,
    min_pair_count: int = 2,
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``num_merges`` BPE merges from a document table.

    Returns ``(merges, symbol_words)``: the ordered merge list as
    ``(left, right, count)`` tuples and the final per-word symbol
    table. Stops early when no pair reaches ``min_pair_count``.
    """
    words = initial_symbols(word_frequencies(df, text_col)).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        top = (
            pair_counts(words)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((a, b, cnt))
        words = words.withColumn(
            "syms", apply_merge(F.col("syms"), a, b)
        ).localCheckpoint(eager=False)
    return merges, words


def bpe_train_batched(
    df: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 20,
    min_pair_count: int = 2,
    batch: int = 8,
) -> tuple[list[tuple[str, str, int]], DataFrame, int]:
    """BPE training with BATCHED merge rounds — the 100 TB/30k-merge
    scale path. :func:`bpe_train` is exact sequential BPE but pays one
    driver collect + one plan checkpoint PER merge; at real vocab
    sizes (30k merges) that driver round-trip chain dominates
    wall-clock. This variant applies up to ``batch`` merges per round:

    1. ONE collect fetches the top pair candidates (count DESC, pair
       lexicographic — the sequential tiebreak).
    2. Greedily accept candidates whose symbols are DISJOINT from
       every earlier acceptance in the round. Symbol-disjoint merges
       commute and their pair counts are invariant under each other
       (a merge only consumes/creates adjacencies touching its own
       symbols, and a freshly merged token is a brand-new symbol), so
       applying the accepted set in one pass is order-independent and
       each accepted pair's count is its true pre-merge count.
    3. All accepted merges compile into one chained fold expression —
       one plan round, one lazy checkpoint.

    Semantics: the standard batched-BPE approximation. ``batch=1``
    reproduces :func:`bpe_train` exactly (same argmax, same tiebreak —
    pinned by test). For ``batch>1`` the GREEDY ORDER may differ from
    sequential BPE when a merge would have promoted an emergent pair
    (e.g. ``(ab, c)``) above a lower-count disjoint candidate; the
    learned vocabulary converges to the same high-frequency units and
    skipped conflicting pairs are simply re-offered next round at
    their recomputed counts. Exact parity at scale is what the
    sequential path is for; this is the path you run on a cluster.

    Returns ``(merges, symbol_words, rounds)`` — ``rounds`` is the
    number of Spark job round-trips spent (≈ num_merges/batch, the
    measured speed-up over sequential's num_merges).
    """
    if batch < 1:
        raise ValueError(f"batch must be >= 1 (got {batch})")
    words = initial_symbols(word_frequencies(df, text_col)).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    rounds = 0
    while len(merges) < num_merges:
        want = min(batch, num_merges - len(merges))
        # 4x headroom: conflicting candidates are skipped, not fetched
        # again — enough in practice, and a short round only costs one
        # extra (cheap) round-trip, never correctness
        top = (
            pair_counts(words)
            .filter(F.col("cnt") >= min_pair_count)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(max(4 * want, 8))
            .collect()
        )
        if not top:
            break
        used: set[str] = set()
        produced: set[str] = set()
        picked: list[tuple[str, str, int]] = []
        for r in top:
            if len(picked) >= want:
                break
            a, b = r["a"], r["b"]
            # disjointness also covers STRING collisions: a merged
            # token's text is its parts' concatenation, so a candidate
            # whose symbol equals an accepted pair's product would see
            # its count changed mid-round — defer it instead
            if used & {a, b} or produced & {a, b}:
                continue
            picked.append((a, b, int(r["cnt"])))
            used.update((a, b))
            produced.add(a + b)
        merges.extend(picked)
        col: Column = F.col("syms")
        for a, b, _ in picked:
            col = apply_merge(col, a, b)
        words = words.withColumn("syms", col).localCheckpoint(eager=False)
        rounds += 1
    return merges, words, rounds


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    *,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Apply a learned merge list to a document table (the tokenizer's
    inference path): per word, char-split + EOW, then each merge in
    learned order as a fold. The merge list is compiled into the plan
    (it is vocabulary-state, broadcast-small by construction).

    Empty/whitespace-only documents tokenize to ZERO tokens: the empty
    words the whitespace split produces are filtered before
    segmentation — the same ``length > 0`` rule the training path
    applies — so inference and training agree on what a word is (an
    unfiltered empty word would emit a phantom ``</w>`` token and
    inflate every downstream token count)."""
    words = F.filter(tokens(text_col), lambda w: F.length(w) > 0)

    def segment_word(w: Column) -> Column:
        chars = F.filter(F.split(w, ""), lambda c: c != F.lit(""))
        syms = F.concat(chars, F.array(F.lit(EOW)))
        for a, b, _ in merges:
            syms = apply_merge(syms, a, b)
        return syms

    return df.withColumn(
        out_col,
        F.flatten(F.transform(words, segment_word)),
    )
