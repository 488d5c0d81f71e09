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
