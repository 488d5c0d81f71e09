"""Transport policy tests: pacing, 429 backoff, Retry-After, budget.

All timing runs on a fake clock — no real sleeps, exact assertions on
the sleep sequence the policy produces.
"""

from __future__ import annotations

import json

import pytest

from dissertation_data_pipeline_spark.sources.datasource import fetch_page
from dissertation_data_pipeline_spark.sources.transport import (
    PolicyTransport,
    RetryBudgetExhausted,
    RetryPolicy,
    TransportError,
)


class FakeClock:
    """Manual-advance clock; sleep() advances it and records the ask."""

    def __init__(self) -> None:
        self.now = 1000.0
        self.sleeps: list[float] = []

    def clock(self) -> float:
        return self.now

    def sleep(self, seconds: float) -> None:
        self.sleeps.append(round(seconds, 6))
        self.now += seconds


def make_transport(responses, clock, **kw):
    """responses: list of (status, headers, body) popped per send."""
    calls = []

    def send(url):
        calls.append(url)
        return responses[min(len(calls), len(responses)) - 1]

    t = PolicyTransport(send, clock=clock.clock, sleep=clock.sleep, **kw)
    return t, calls


def test_success_no_retry_no_sleep():
    clk = FakeClock()
    t, calls = make_transport([(200, {}, "ok")], clk)
    assert t.get("http://x/a") == "ok"
    assert calls == ["http://x/a"]
    assert clk.sleeps == []


def test_backoff_on_429_exponential_sequence():
    clk = FakeClock()
    t, calls = make_transport(
        [(429, {}, ""), (429, {}, ""), (200, {}, "ok")], clk, min_interval=0.0
    )
    assert t.get("http://x/a") == "ok"
    assert len(calls) == 3
    # reference constants: 0.5 s base, doubling
    assert clk.sleeps == [0.5, 1.0]


def test_retry_after_header_overrides_backoff_and_is_capped():
    clk = FakeClock()
    t, _ = make_transport(
        [(429, {"retry-after": "7"}, ""), (429, {"retry-after": "9999"}, ""), (200, {}, "ok")],
        clk,
        min_interval=0.0,
    )
    assert t.get("http://x/a") == "ok"
    assert clk.sleeps == [7.0, 30.0]  # numeric header wins, capped at 30 s


def test_non_numeric_retry_after_falls_back_to_backoff():
    clk = FakeClock()
    t, _ = make_transport(
        [(429, {"retry-after": "Wed, 21 Oct"}, ""), (200, {}, "ok")], clk, min_interval=0.0
    )
    assert t.get("http://x/a") == "ok"
    assert clk.sleeps == [0.5]


def test_budget_exhaustion_raises_with_attempt_count():
    clk = FakeClock()
    policy = RetryPolicy(max_retries=3)
    t, calls = make_transport([(429, {}, "")], clk, policy=policy, min_interval=0.0)
    with pytest.raises(RetryBudgetExhausted) as ei:
        t.get("http://x/a")
    assert ei.value.attempts == 4  # initial try + 3 retries
    assert ei.value.last_status == 429
    assert len(calls) == 4
    # 0.5, 1.0, 2.0 — no sleep after the final failed attempt
    assert clk.sleeps == [0.5, 1.0, 2.0]


def test_backoff_caps_at_max_delay():
    policy = RetryPolicy(max_retries=8)
    assert [policy.delay_for(a) for a in range(8)] == [
        0.5, 1.0, 2.0, 4.0, 8.0, 16.0, 30.0, 30.0,
    ]


def test_non_retryable_status_raises_immediately():
    clk = FakeClock()
    t, calls = make_transport([(403, {}, "")], clk)
    with pytest.raises(TransportError):
        t.get("http://x/a")
    assert len(calls) == 1
    assert clk.sleeps == []


def test_pacing_enforces_min_interval_between_sends():
    clk = FakeClock()
    t, _ = make_transport([(200, {}, "ok")], clk, min_interval=0.5)
    t.get("http://x/1")
    clk.now += 0.1  # 0.1 s of work between requests
    t.get("http://x/2")
    assert clk.sleeps == [pytest.approx(0.4)]


def test_pacing_skipped_when_interval_already_elapsed():
    clk = FakeClock()
    t, _ = make_transport([(200, {}, "ok")], clk, min_interval=0.5)
    t.get("http://x/1")
    clk.now += 2.0
    t.get("http://x/2")
    assert clk.sleeps == []


def test_fetch_page_http_uses_injected_transport():
    clk = FakeClock()
    records = [{"jurisdiction": "CO", "session": "2020", "identifier": "HB1", "title": "t"}]
    t, calls = make_transport([(200, {}, json.dumps(records))], clk)
    assert fetch_page("http://api.example/bills", 3, transport=t) == records
    assert calls == ["http://api.example/bills?page=3"]


def test_fetch_page_http_404_is_empty_page():
    clk = FakeClock()
    t, _ = make_transport([(404, {}, "")], clk)
    assert fetch_page("http://api.example/bills", 99, transport=t) == []


def test_fetch_page_http_retries_through_429(tmp_path):
    clk = FakeClock()
    t, calls = make_transport(
        [(429, {}, ""), (200, {}, "[]")], clk, min_interval=0.0
    )
    assert fetch_page("http://api.example/bills?k=1", 1, transport=t) == []
    assert calls == ["http://api.example/bills?k=1&page=1"] * 2
    assert clk.sleeps == [0.5]


def test_connection_errors_retry_on_backoff_then_succeed():
    """URLError/timeouts (OSError class) get the SAME backoff budget a
    retryable HTTP status does — previously they bypassed retry
    entirely and killed the task on the first transient blip."""
    clk = FakeClock()
    calls = []

    def send(url):
        calls.append(url)
        if len(calls) < 3:
            raise OSError("connection reset")
        return (200, {}, "ok")

    t = PolicyTransport(
        send, clock=clk.clock, sleep=clk.sleep, min_interval=0.0
    )
    assert t.get("http://api.example/x") == "ok"
    assert len(calls) == 3
    assert clk.sleeps == [0.5, 1.0]  # exponential, same as HTTP backoff


def test_connection_errors_exhaust_budget_with_last_status_minus_one():
    clk = FakeClock()

    def send(url):
        raise OSError("dns failure")

    t = PolicyTransport(
        send, clock=clk.clock, sleep=clk.sleep, min_interval=0.0
    )
    with pytest.raises(RetryBudgetExhausted) as ei:
        t.get("http://api.example/x")
    assert ei.value.last_status == -1
    assert ei.value.attempts == 6  # max_retries=5 -> 6 attempts


def test_shared_http_transport_is_process_cached():
    """Pacing state must span consecutive fetches — a fresh transport
    per call resets _last_send and defeats min_interval."""
    from dissertation_data_pipeline_spark.sources import datasource as ds

    old = ds._SHARED_TRANSPORT
    ds._SHARED_TRANSPORT = None
    try:
        t1 = ds._shared_http_transport()
        t2 = ds._shared_http_transport()
        assert t1 is t2
    finally:
        ds._SHARED_TRANSPORT = old
