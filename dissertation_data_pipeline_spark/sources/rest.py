"""REST lookup sources (SURVEY §2.1 S6-S8, §2.10 U-f6) — mockable.

The reference's enricher does rate-limited per-row HTTP lookups with a
persistent positive/negative cache (legiscan_enricher.py:171-427). The
engine decomposes that into the scale-correct shape:

1. P8 filter: rows that need enrichment (``is_missing`` disjunction);
2. ``distinct()`` on the lookup key (O-m4 — never fetch a key twice);
3. anti-join against the cache table (I4 — negatives cached too);
4. the *only* non-relational step: a ``mapInPandas`` batch fetch with
   an injected ``fetch_fn`` (tests inject a deterministic mock; the
   real HTTP client lives outside CI). ``fetch_partitions`` bounds
   parallelism against the API (rate limits are per-process, so
   repartition(1) == the reference's sequential client);
5. cache upsert + broadcast-join results back onto the corpus.

No network code runs in tests or CI — ``fetch_fn`` is the boundary.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.sources.state import StateTable

#: fetch function contract: list of keys -> {key: value-or-None}
FetchFn = Callable[[list[str]], dict[str, str | None]]


def fetch_missing_keys(
    keys: DataFrame,
    key_col: str,
    fetch_fn: FetchFn,
    *,
    fetch_partitions: int = 1,
) -> DataFrame:
    """Run the injected fetch over distinct keys, ``fetch_partitions``
    concurrent clients. Returns (key, value, found) — misses are rows
    with found=false, so negative results are first-class (I4)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ks = pdf[key_col].dropna().unique().tolist()
            got = fetch_fn(ks) if ks else {}
            yield pd.DataFrame(
                {
                    key_col: ks,
                    "value": [got.get(k) for k in ks],
                    "found": [got.get(k) is not None for k in ks],
                }
            )

    return (
        keys.select(key_col)
        .distinct()
        .repartition(fetch_partitions)
        .mapInPandas(run, f"{key_col} string, value string, found boolean")
    )


def enrich_with_cache(
    df: DataFrame,
    key_col: str,
    target_col: str,
    cache: StateTable,
    fetch_fn: FetchFn,
    *,
    fetch_partitions: int = 1,
) -> DataFrame:
    """The full enricher shape: fill ``target_col`` where missing using
    cached-or-fetched values keyed by ``key_col``; update the cache
    (positives AND negatives) as a side effect."""
    from dissertation_data_pipeline_spark.functions import is_missing

    needs = df.filter(is_missing(target_col)).select(key_col).distinct()
    cached = cache.read()
    to_fetch = needs.join(cached.select(key_col), on=key_col, how="left_anti")

    # checkpoint BEFORE the emptiness probe: fetch_fn is a side-effecting
    # (rate-limited, billed) call, and an unpersisted mapInPandas plan
    # would execute it once for the probe and AGAIN inside upsert's
    # write — double the API spend, and a transient failure on the
    # second run could cache a different answer than the one probed
    fetched = fetch_missing_keys(
        to_fetch, key_col, fetch_fn, fetch_partitions=fetch_partitions
    ).localCheckpoint()
    if fetched.limit(1).count() > 0:
        cache.upsert(fetched)
        cached = cache.read()

    lookup = cached.filter(F.col("found")).select(
        F.col(key_col), F.col("value").alias("_enriched")
    )
    out = df.join(F.broadcast(lookup), on=key_col, how="left")
    return out.withColumn(
        target_col,
        F.when(is_missing(target_col) & F.col("_enriched").isNotNull(), F.col("_enriched"))
        .otherwise(F.col(target_col)),
    ).drop("_enriched")
