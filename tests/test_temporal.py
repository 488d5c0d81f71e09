"""Temporal operators: as-of join, interval join, rollup — semantics +
physical-plan contracts (union-tag as-of must plan ZERO join nodes)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dissertation_data_pipeline_spark.operators.temporal import (
    asof_join,
    interval_join,
    time_rollup,
)
from dissertation_data_pipeline_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, minutes=m)


def _mk_asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(1), "l1"),   # before any right row -> no match
            (1, _ts(2), "l2"),   # equal ts -> inclusive match r1
            (1, _ts(9), "l3"),   # latest right <= 9:00 is r2 (5:00)
            (2, _ts(3), "l4"),   # user with no right rows at all
        ],
        "user_id int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(2), 100, None),   # NULL payload field still matches
            (1, _ts(5), 200, "ok"),
        ],
        "user_id int, ts timestamp, amount int, note string",
    )
    return left, right


def test_asof_backward_inclusive_semantics(spark):
    left, right = _mk_asof_frames(spark)
    out = asof_join(left, right, on=["user_id"], payload=["amount", "note"])
    got = {r.tag: (r.asof_ts, r.amount, r.note) for r in out.collect()}
    assert got == {
        "l1": (None, None, None),
        "l2": (_ts(2), 100, None),  # inclusive >= ; NULL field carried atomically
        "l3": (_ts(5), 200, "ok"),
        "l4": (None, None, None),
    }
    assert out.count() == left.count()  # left-join cardinality, never inflated


def test_asof_tolerance_nulls_stale_matches(spark):
    left, right = _mk_asof_frames(spark)
    out = asof_join(
        left,
        right,
        on=["user_id"],
        payload=["amount", "note"],
        tolerance_seconds=3600,
    )
    got = {r.tag: r.amount for r in out.collect()}
    # l3 is 4h after its match (5:00) -> outside the 1h tolerance
    assert got == {"l1": None, "l2": 100, "l3": None, "l4": None}


def test_asof_plans_zero_join_nodes(spark):
    """The whole point of the union-tag shape: one exchange, no join."""
    df = QUERIES["ext_asof_join"].fn(spark, SF_DIR)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Join" not in plan, plan
    # one node-details header per physical node: union shuffle + pre-agg
    import re

    nodes = re.findall(r"^\((\d+)\) (\w+)", plan, flags=re.M)
    exchanges = [n for _, n in nodes if n == "Exchange"]
    assert len(exchanges) <= 2, nodes


def test_interval_join_matches_naive_cross_filter(spark):
    probe = spark.createDataFrame(
        [(i, _ts(0, i)) for i in range(0, 120, 7)], "pid int, ts timestamp"
    )
    iv = spark.createDataFrame(
        [
            (10, _ts(0, 10), _ts(0, 40)),
            (11, _ts(0, 35), _ts(1, 5)),   # overlapping windows both match
            (12, _ts(1, 50), _ts(1, 59)),  # empty window
        ],
        "iid int, w_start timestamp, w_end timestamp",
    )
    got = interval_join(
        probe, iv, probe_ts="ts", start="w_start", end="w_end", bucket_seconds=600
    )
    naive = probe.crossJoin(iv).filter(
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end"))
    )
    key = lambda df: sorted((r.pid, r.iid) for r in df.select("pid", "iid").collect())  # noqa: E731
    assert key(got) == key(naive)
    assert key(got)  # non-degenerate fixture


def test_rollup_levels_and_grand_total(spark):
    from dissertation_data_pipeline_spark.tables import load_table

    e = load_table(spark, SF_DIR, "events")
    out = time_rollup(
        e,
        ts="ts",
        levels=["day", "hour"],
        extra=["event_type"],
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    rows = out.collect()
    gids = {r.gid for r in rows}
    assert gids == {0, 1, 3, 7}  # hour, day, type, grand-total levels
    total = e.count()
    for gid in (0, 1, 3, 7):
        assert sum(r.n for r in rows if r.gid == gid) == total
    [grand] = [r for r in rows if r.gid == 7]
    assert grand.event_type is None and grand.ts_day is None
