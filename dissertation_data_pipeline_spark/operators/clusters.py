"""[EXT] Duplicate-cluster resolution: iterative connected components.

Pair-generating dedup (MinHash/SimHash/Jaccard, operators/dedup_ext.py)
emits *edges*; an actual dedup needs *clusters* — the transitive
closure — so each group keeps one canonical document. The reference
never needs this (its dedup keys are equality-based, SURVEY §2.5 W1/W2);
it is the genuinely iterative step of a near-dup pipeline and the one
operator here Spark's relational layer can't express in a single plan.

Algorithm: min-label propagation. Every node starts labeled with its
own id; each round replaces a node's label with the min over itself and
its neighbors; at fixpoint every node carries the min id of its
component. Rounds = graph diameter — near-dup clusters are shallow
(pairs share content, so clusters are near-cliques), so convergence is
typically 2-4 rounds.

Scale design (100 TB):
- Each round is one join + one groupBy on the edge list — shuffles on
  the node key, map-side combined, AQE-coalesced. No driver-side graph.
- ``localCheckpoint`` after every round truncates lineage, otherwise
  the plan doubles per iteration and the job dies on planning time
  long before data size matters.
- The convergence probe is a ``limit(1).count()`` on the change set —
  an early-exit semi-join, not a full materialization.
- For adversarial graphs (long chains, giant components) swap the loop
  body for the large-star/small-star rounds of Kiveris et al. 2014,
  which converge in O(log^2 n) with identical output; the fixpoint
  contract and oracle stay the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "connected_components_star",
    "dedup_survivors",
]


def _single_task_components(e: DataFrame) -> DataFrame:
    """Union-find over an edge list small enough for one task: the
    second level of the two-level strategy (see connected_components).
    One narrow shuffle to a single partition, one pass, no per-round
    global barriers. Deterministic min-id roots."""

    def solve(batches):
        import pandas as pd

        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for pdf in batches:
            for s, d in zip(pdf["src"], pdf["dst"]):
                rs, rd = find(int(s)), find(int(d))
                if rs != rd:
                    # min root wins -> component ids are min reachable ids
                    parent[max(rs, rd)] = min(rs, rd)
        yield pd.DataFrame(
            {
                "doc_id": list(parent.keys()),
                "component_id": [find(x) for x in parent.keys()],
            }
        )

    return e.coalesce(1).mapInPandas(solve, "doc_id long, component_id long")


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 25,
    small_edge_threshold: int = 2_000_000,
) -> DataFrame:
    """Resolve an undirected pair list to components.

    Returns (doc_id, component_id) for every node that appears in at
    least one pair, where component_id is the min doc_id reachable from
    the node. Deterministic for any input order or partitioning.

    Two-level strategy: the edge list is materialized once
    (localCheckpoint) and counted. At or below
    ``small_edge_threshold`` edges the graph is solved by union-find
    in a single task (~16 bytes/edge — the default 2M edges is tens of
    MB, far under task memory), because an iterative loop's cost at
    that size is pure per-round job latency, not data. Above it, the
    distributed min-label propagation below takes over. This is the
    100 TB shape: upstream contraction (e.g.
    dedup_ext.simhash_component_edges) shrinks a corpus-sized problem
    to a near-dup graph that usually fits one task; when it doesn't,
    the loop — or connected_components_star for adversarial diameters
    — handles it without any driver-side collect.
    """
    # materialize the (possibly expensive) pair plan ONCE, first:
    # self-unions and distincts below do NOT reuse exchanges, so every
    # derivation must read this checkpoint, never the upstream LSH
    # machinery (unchecked, the pair plan evaluates 3x here — measured)
    # NULL-id pairs are dropped EXPLICITLY: the distributed path's joins
    # would drop them silently while the single-task path would crash on
    # int(NaN) — same input must behave identically on both sides of
    # the size threshold
    e = (
        pairs.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("dst"),
        )
        .filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .localCheckpoint()
    )
    if e.count() <= small_edge_threshold:
        return _single_task_components(e)
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    nodes = sym.select("src").distinct()
    # self-edges make "min over neighborhood" include the node itself,
    # so each round is a pure join+groupBy — no left-join/backfill leg
    edges = sym.union(nodes.withColumn("dst", F.col("src"))).localCheckpoint()

    labels = nodes.select(F.col("src").alias("id"), F.col("src").alias("label"))

    # Convergence probe: labels only ever decrease, so the label-table
    # sum is strictly monotone until fixpoint — equal sums <=> no
    # change, with no old-vs-new join. DECIMAL sum: overflow-proof at
    # any node-id magnitude.
    prev_sum = None
    converged = False
    for _ in range(max_iter):
        # min label over the closed neighborhood (self-edge included)
        relab = (
            edges.join(
                labels.select(F.col("id").alias("dst"), F.col("label").alias("nl")),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("nl").alias("label"))
            .withColumnRenamed("src", "id")
        )
        # pointer jump (label <- label(label)): halves the remaining
        # diameter each round, so rounds = O(log d), not O(d)
        jmp = relab.select(F.col("id").alias("label"), F.col("label").alias("ll"))
        step = (
            relab.join(jmp, "label")
            .select("id", F.least(F.col("label"), F.col("ll")).alias("label"))
            # lazy checkpoint: truncates the *logical plan* immediately
            # (plan size would double per round otherwise) but rides
            # the probe's job — one action per round
            .localCheckpoint(eager=False)
        )
        s, n = step.agg(
            F.sum(F.col("label").cast("decimal(38,0)")), F.count(F.lit(1))
        ).first()
        labels = step
        if n == 0 or s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # returning here would hand back silently-split components
        # (under-deduplication downstream) — fail loudly instead; the
        # caller can raise max_iter or switch to the star variant,
        # whose round count is diameter-independent
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"rounds — pathological diameter; raise max_iter or use "
            f"connected_components_star"
        )
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("component_id")
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al. 2014): every strictly
    larger neighbor of u is re-attached to the minimum of u's closed
    neighborhood. Shrinks tall structures toward local minima."""
    m = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.filter(F.col("v") > F.col("u"))
        .join(m, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(sym: DataFrame) -> DataFrame:
    """One small-star round: u and all its strictly smaller neighbors
    attach to the minimum of that set. Flattens local structures into
    stars rooted at minima."""
    small = sym.filter(F.col("v") < F.col("u"))
    m = small.groupBy("u").agg(F.min("v").alias("m"))
    reattach = (
        small.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edge = m.select("u", F.col("m").alias("v"))
    return reattach.union(self_edge).distinct()


def connected_components_star(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by alternating large-star/small-star rounds
    (Kiveris et al. 2014, "Connected Components in MapReduce and
    Beyond") — the adversarial-graph fallback for
    ``connected_components``.

    Same contract and identical output: (doc_id, component_id) for
    every node appearing in a pair, component_id = min reachable id.
    Min-label propagation with pointer jumping is O(log d) rounds on
    the component *diameter*; large-star/small-star converges in
    O(log^2 n) rounds regardless of diameter, so a 100 TB run with a
    pathological chain component (crawl-chain near-dups, linked
    revisions) terminates without the diameter dependence.

    Each round is two join+groupBy stages over the edge list — the
    same shuffle class as one propagation round — with
    ``localCheckpoint`` truncating lineage per round. Convergence is a
    set-equality probe (count match + one-sided anti diff), checked on
    the star edge set which only ever contracts toward (node, root).
    """
    # checkpoint FIRST: nodes (a self-union = two scans) and edges (a
    # third) all derive from raw, and the upstream pair plan is the
    # expensive LSH machinery — same measured 3x trap
    # connected_components documents above
    raw = (
        pairs.select(
            F.col(src_col).cast("long").alias("u"),
            F.col(dst_col).cast("long").alias("v"),
        )
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
        .localCheckpoint()
    )
    # every node that appears in ANY pair — including self-pairs, whose
    # edges the star rounds cannot use but whose nodes the output
    # contract ("every node appearing in a pair") still owes, exactly
    # as connected_components emits them as their own singletons
    nodes = (
        raw.select(F.col("u").alias("id"))
        .union(raw.select(F.col("v").alias("id")))
        .distinct()
        .localCheckpoint()
    )
    e = raw.filter(F.col("u") != F.col("v"))
    edges = e.distinct().localCheckpoint()
    prev_cnt = None
    converged = False
    for _ in range(max_iter):
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        ls = _large_star(sym)
        ls_sym = ls.union(ls.select(F.col("v").alias("u"), F.col("u").alias("v")))
        new_edges = _small_star(ls_sym).localCheckpoint(eager=False)
        cnt = new_edges.count()
        if prev_cnt is not None and cnt == prev_cnt:
            # counts stable -> confirm set equality (distinct sets of
            # equal size are equal iff the one-sided diff is empty)
            if new_edges.exceptAll(edges).limit(1).count() == 0:
                edges = new_edges
                converged = True
                break
        edges = new_edges
        prev_cnt = cnt
    if not converged:
        # the post-loop star extraction assumes a TRUE star fixpoint;
        # on a non-fixpoint edge set it silently emits split
        # components — refuse instead
        raise RuntimeError(
            f"connected_components_star did not reach its star "
            f"fixpoint in {max_iter} rounds; raise max_iter"
        )
    # fixpoint: stars rooted at component minima — non-roots appear as
    # u exactly once, roots only as v (self-labeled)
    roots = edges.select(F.col("v").alias("id")).distinct()
    labels = edges.select(F.col("u").alias("id"), F.col("v").alias("label")).union(
        roots.select("id", F.col("id").alias("label"))
    )
    comp = labels.groupBy("id").agg(F.min("label").alias("component_id"))
    singletons = nodes.join(comp.select("id"), "id", "left_anti").select(
        "id", F.col("id").alias("component_id")
    )
    return comp.union(singletons).select(
        F.col("id").alias("doc_id"), "component_id"
    )


def dedup_survivors(
    df: DataFrame, components: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """The deduped corpus: drop every document whose component id is
    not itself (the canonical member survives; untouched docs — not in
    any pair — survive by the left-anti miss)."""
    losers = components.filter(F.col("component_id") != F.col("doc_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
