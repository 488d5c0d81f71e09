"""Property-based invariants for the merge/maintenance family.

Algebraic laws the maintenance operators must satisfy regardless of
how a corpus is split into batches — the guarantees that make
incremental refresh safe to run unattended at scale. One DataFrame per
hypothesis example (see test_properties.py conventions).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.merge import (
    apply_changes,
    merge_aggregates,
    merge_upsert,
)

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: (key, value, in_delta) rows — the split flag is generated, so
#: hypothesis explores every old/delta partition of the same corpus
_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.integers(min_value=-100, max_value=100),
        st.booleans(),
    ),
    min_size=1,
    max_size=25,
)


def _agg(df):
    return df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )


@SET
@given(_ROWS)
def test_merged_state_equals_full_recompute(spark, rows):
    df = spark.createDataFrame(rows, "k int, v long, d boolean")
    merged = merge_aggregates(
        _agg(df.filter(~F.col("d"))),
        _agg(df.filter(F.col("d"))),
        "k",
        count_col="n",
        sum_cols=["s"],
    )
    expect = {(r.k, r.n, r.s) for r in _agg(df).collect()}
    assert {(r.k, r.n, r.s) for r in merged.collect()} == expect


@SET
@given(_ROWS)
def test_retraction_restores_prior_state(spark, rows):
    df = spark.createDataFrame(rows, "k int, v long, d boolean")
    state = _agg(df.filter(~F.col("d")))
    delta = _agg(df.filter(F.col("d")))
    advanced = merge_aggregates(state, delta, "k", count_col="n", sum_cols=["s"])
    retract = delta.select("k", (-F.col("n")).alias("n"), (-F.col("s")).alias("s"))
    restored = merge_aggregates(advanced, retract, "k", count_col="n", sum_cols=["s"])
    expect = {(r.k, r.n, r.s) for r in state.collect()}
    assert {(r.k, r.n, r.s) for r in restored.collect()} == expect


_KV = st.lists(
    st.tuples(st.integers(min_value=0, max_value=8), st.integers(0, 50)),
    min_size=1,
    max_size=15,
    unique_by=lambda t: t[0],
)


@SET
@given(_KV, _KV)
def test_merge_upsert_idempotent(spark, tgt, src):
    target = spark.createDataFrame(tgt, "k int, v long")
    source = spark.createDataFrame(src, "k int, nv long")
    kwargs = dict(
        update_set={"v": F.col("s.nv")},
        insert_values={"k": F.col("s.k"), "v": F.col("s.nv")},
    )
    once = merge_upsert(target, source, "k", **kwargs)
    twice = merge_upsert(once, source, "k", **kwargs)
    assert {(r.k, r.v) for r in twice.collect()} == {
        (r.k, r.v) for r in once.collect()
    }


@SET
@given(_KV)
def test_apply_changes_empty_log_keeps_base(spark, base_rows):
    base = spark.createDataFrame(base_rows, "k int, v long")
    log = spark.createDataFrame([], "k int, ts long, op string")
    out = apply_changes(
        base, log, "k", order_by=[F.desc("ts")], is_delete=F.col("op") == "del"
    ).collect()
    assert {(r.k, r.v, r.change_status) for r in out} == {
        (k, v, "kept") for k, v in base_rows
    }
