"""Gate row for the §2.9 incremental-ingest state-table protocol
(I1 content-hash change detection, I2/I3 processed-set resume).

The reference keeps this state as JSON files (legiscan_api.py:21-56,
utils.py:14-53); the engine keeps it as a keyed parquet ``StateTable``
probed with joins.  This query drives the REAL protocol end-to-end —
``StateTable.upsert`` twice (second batch overwrites a key subset, so
update-wins is exercised), ``read`` back, then the two membership
operators — and oracles the outcome with plain SQL that restates the
state's content independently.  Everything is deterministic: the state
is derived from the orders table by exact key rules both engines can
reproduce.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.plans.registry import register
from dissertation_data_pipeline_spark.tables import load_table

#: The simulated ingest state, as exact key rules:
#:   - keys % 3 == 0 were processed before (they are IN the state);
#:   - of those, keys % 9 == 0 have since changed upstream (the state
#:     holds a stale hash — the second upsert batch overwrote them).
#: Work to do = keys never processed ('new') + keys whose current
#: content hash differs from the recorded one ('changed').
_STATE_SQL = """
    WITH work AS (
      SELECT o_orderkey AS key,
             md5(o_orderstatus || '|' || o_orderpriority) AS content_hash
      FROM orders
    ),
    state AS (
      SELECT key,
             CASE WHEN key % 9 = 0 THEN 'stale-hash' ELSE content_hash END
               AS content_hash
      FROM work WHERE key % 3 = 0
    )
    SELECT w.key,
           CASE WHEN s.key IS NULL THEN 'new' ELSE 'changed' END AS reason
    FROM work w LEFT JOIN state s USING (key)
    WHERE s.key IS NULL OR w.content_hash <> s.content_hash
    """


@register("i1_i3_state_protocol", _STATE_SQL)
def i1_i3_state_protocol(spark, sf_dir):
    """I1-I3 as a gate row: build a processed-set StateTable on disk
    through two real upserts (the second overwrites the %9 keys with a
    stale hash — deterministic-tiebreak update-wins), read it back,
    and report the work that remains: rows absent from the state
    (``filter_unprocessed`` — 'new') plus rows whose content hash
    drifted from the recorded one (``content_changed`` — 'changed').
    At 100 TB the state table is a small keyed side input and both
    probes are one join each — membership never touches the driver."""
    import shutil

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from dissertation_data_pipeline_spark.sources.state import (
        StateTable,
        content_changed,
        filter_unprocessed,
    )

    work = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("key"),
        F.md5(F.concat_ws("|", "o_orderstatus", "o_orderpriority")).alias(
            "content_hash"
        ),
    )
    schema = StructType(
        [
            StructField("key", LongType()),
            StructField("content_hash", StringType()),
        ]
    )
    from dissertation_data_pipeline_spark.plans.queries_fixtures import (
        _tmp_layout,
    )

    path = _tmp_layout("state", sf_dir)
    shutil.rmtree(path, ignore_errors=True)  # fresh protocol run
    st = StateTable(spark, path, schema, key="key")
    # batch 1: everything % 3 recorded at its CURRENT hash
    st.upsert(work.filter(F.col("key") % 3 == 0))
    # batch 2: the % 9 subset re-recorded with a stale hash — the
    # upsert's update-wins path, and the I1 'changed' population
    st.upsert(
        work.filter(F.col("key") % 9 == 0).withColumn(
            "content_hash", F.lit("stale-hash")
        )
    )
    state = st.read()
    new = filter_unprocessed(work, state, "key").select(
        "key", F.lit("new").alias("reason")
    )
    changed = (
        content_changed(work, state, "key")
        .join(state.select("key"), "key", "left_semi")
        .select("key", F.lit("changed").alias("reason"))
    )
    return new.unionByName(changed)


#: I4 as exact key rules over the %7 needs-enrichment slice.  Seed
#: order matters: %14 keys are seeded NEGATIVE even when %21 also
#: divides them, so the oracle checks %14 first.  The injected fetch
#: returns the poison value 'LEAKED-<key>' for any key the cache
#: should have answered — a broken negative-cache anti-join therefore
#: surfaces as a VALUE mismatch here, not just a perf regression.
_I4_SQL = """
    SELECT c_custkey AS key,
           CASE
             WHEN c_custkey % 14 = 0 THEN NULL
             WHEN c_custkey % 21 = 0
               THEN 'cached-' || CAST(c_custkey AS VARCHAR)
             WHEN c_custkey % 5 = 0 THEN NULL
             ELSE 'fetched-' || CAST(c_custkey AS VARCHAR)
           END AS phone
    FROM customer
    WHERE c_custkey % 7 = 0
    """


@register("i4_negative_cache", _I4_SQL)
def i4_negative_cache(spark, sf_dir):
    """I4 negative-result cache as a gate row (reference
    legiscan_enricher.py:171-427: misses are cached so a key is never
    re-fetched, found or not).  Drives ``enrich_with_cache`` twice over
    customers whose phone is blanked on the %7 slice, against a cache
    pre-seeded with positives (%21, not %14) and NEGATIVES (%14):

    - pass 1's injected fetch returns ``LEAKED-<key>`` for any seeded
      key it is asked for — if the cache anti-join (positive OR
      negative) ever leaked, the leak lands in the output phone and
      hash-mismatches the oracle;
    - pass 1's real misses (%5 == 0) are upserted as negatives;
    - pass 2 runs with a fetch that RAISES on any non-empty key batch:
      after one pass every needed key is cached — including the
      negatives — so the second enrichment must fetch nothing.

    At 100 TB the cache is a keyed state table probed with one
    anti-join per run and the fetch touches only never-seen keys —
    API spend is O(new keys), not O(corpus)."""
    import shutil

    from pyspark.sql.types import (
        BooleanType,
        StringType,
        StructField,
        StructType,
    )

    from dissertation_data_pipeline_spark.sources.rest import (
        enrich_with_cache,
    )
    from dissertation_data_pipeline_spark.sources.state import StateTable
    from dissertation_data_pipeline_spark.plans.queries_fixtures import (
        _tmp_layout,
    )

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("cust_id"),
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None))
        .otherwise(F.col("c_name"))
        .alias("phone"),
    )
    schema = StructType(
        [
            StructField("cust_id", StringType()),
            StructField("value", StringType()),
            StructField("found", BooleanType()),
        ]
    )
    path = _tmp_layout("i4cache", sf_dir)
    shutil.rmtree(path, ignore_errors=True)  # fresh protocol run
    cache = StateTable(spark, path, schema, key="cust_id")
    keys = cust.select(F.col("cust_id").cast("long").alias("k"))
    cache.upsert(
        keys.filter((F.col("k") % 7 == 0) & (F.col("k") % 14 == 0)).select(
            F.col("k").cast("string").alias("cust_id"),
            F.lit(None).cast("string").alias("value"),
            F.lit(False).alias("found"),
        )
    )
    cache.upsert(
        keys.filter(
            (F.col("k") % 21 == 0) & (F.col("k") % 14 != 0)
        ).select(
            F.col("k").cast("string").alias("cust_id"),
            F.concat(F.lit("cached-"), F.col("k")).alias("value"),
            F.lit(True).alias("found"),
        )
    )

    def fetch_pass1(ks):
        out = {}
        for k in ks:
            n = int(k)
            if n % 14 == 0 or (n % 21 == 0):
                out[k] = f"LEAKED-{k}"  # cache should have answered
            elif n % 5 == 0:
                out[k] = None  # genuine miss -> cached as negative
            else:
                out[k] = f"fetched-{k}"
        return out

    def fetch_pass2(ks):
        raise AssertionError(
            f"I4 violated: second pass re-fetched {len(ks)} keys "
            f"(negative results were not cached): {sorted(ks)[:5]}"
        )

    # pass 1: the fetch + cache-upsert side effects run eagerly inside
    # the call (rest.py checkpoints the fetch before probing it) — the
    # returned frame itself is not needed
    enrich_with_cache(cust, "cust_id", "phone", cache, fetch_pass1)
    out = enrich_with_cache(cust, "cust_id", "phone", cache, fetch_pass2)
    return out.filter(F.col("cust_id").cast("long") % 7 == 0).select(
        F.col("cust_id").cast("long").alias("key"),
        F.col("phone"),
    )
