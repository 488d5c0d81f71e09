"""HTTP transport policy: pacing, backoff, retry budget (SURVEY §2.1).

The reference's API clients enforce politeness in the driver loop —
a fixed inter-request delay, exponential backoff on HTTP 429 with a
hard cap, and a bounded retry count before giving up
(/root/reference/scripts/legislation/legiscan_enricher.py:50-52,284-287
and legiscan_api.py:84-125: 0.5 s base delay, 30 s cap, Retry-After
honored when the server sends one).

This module re-expresses that policy as an *injectable transport* so
the Spark-side sources stay pure: ``PolicyTransport`` wraps any
``send(url) -> (status, headers, body)`` callable with

- **pacing**: at least ``min_interval`` seconds between consecutive
  sends (per transport instance == per executor task slot, matching
  the reference's per-process sequential client);
- **backoff**: retryable statuses (429 + transient 5xx) sleep
  ``base_delay * multiplier**attempt`` capped at ``max_delay``; a
  numeric ``Retry-After`` header overrides the computed delay (still
  capped);
- **budget**: after ``max_retries`` failed attempts the transport
  raises ``RetryBudgetExhausted`` — callers treat it as a task
  failure, so Spark's task retry (one partition == one page) is the
  outer loop, never a silent drop.

Clock and sleep are constructor-injected; tests drive a fake clock so
the full 429 -> backoff -> budget-exhaustion path runs in microseconds
with exact sleep-sequence assertions. No network code runs in CI — the
urllib-backed ``urllib_send`` is only constructed when a caller asks
for a real HTTP transport.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable
from dataclasses import dataclass, field

#: raw send contract: url -> (http status, lowercase headers, body text)
SendFn = Callable[[str], tuple[int, dict[str, str], str]]


class TransportError(Exception):
    """Base class for transport failures."""


class RetryBudgetExhausted(TransportError):
    """Raised when every attempt in the retry budget failed."""

    def __init__(self, url: str, attempts: int, last_status: int) -> None:
        super().__init__(
            f"{attempts} attempts exhausted for {url} (last status {last_status})"
        )
        self.url = url
        self.attempts = attempts
        self.last_status = last_status


@dataclass(frozen=True)
class RetryPolicy:
    """The reference's politeness constants, one place."""

    base_delay: float = 0.5  # legiscan_enricher.py:50 rate_limit_delay
    max_delay: float = 30.0  # legiscan_enricher.py:52 backoff cap
    multiplier: float = 2.0
    max_retries: int = 5
    retry_statuses: frozenset[int] = field(
        default_factory=lambda: frozenset({429, 500, 502, 503, 504})
    )

    def delay_for(self, attempt: int) -> float:
        """Backoff before retry number ``attempt`` (0-based)."""
        return min(self.max_delay, self.base_delay * self.multiplier**attempt)


class PolicyTransport:
    """Wrap a raw ``send`` with pacing + backoff + a retry budget."""

    def __init__(
        self,
        send: SendFn,
        policy: RetryPolicy | None = None,
        *,
        min_interval: float = 0.5,
        clock: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self._send = send
        self.policy = policy or RetryPolicy()
        self.min_interval = min_interval
        self._clock = clock
        self._sleep = sleep
        self._last_send: float | None = None

    def _pace(self) -> None:
        if self._last_send is not None:
            wait = self.min_interval - (self._clock() - self._last_send)
            if wait > 0:
                self._sleep(wait)

    def get(self, url: str) -> str:
        """Fetch ``url``, returning the body; retries per policy.

        Connection-level failures (DNS, resets, timeouts — raised by
        the send as ``OSError``/``urllib.error.URLError``, which
        subclasses it) are retried on the same backoff budget as a
        retryable HTTP status: they are the canonical transient class
        the backoff exists for. They carry no Retry-After and record
        ``last_status=-1``."""
        last_status = -1
        for attempt in range(self.policy.max_retries + 1):
            self._pace()
            try:
                status, headers, body = self._send(url)
            except OSError as e:
                self._last_send = self._clock()
                last_status = -1
                if attempt < self.policy.max_retries:
                    self._sleep(self.policy.delay_for(attempt))
                    continue
                raise RetryBudgetExhausted(
                    url, self.policy.max_retries + 1, last_status
                ) from e
            self._last_send = self._clock()
            if status == 200:
                return body
            last_status = status
            if status not in self.policy.retry_statuses:
                raise TransportError(f"HTTP {status} for {url}")
            if attempt < self.policy.max_retries:
                delay = self.policy.delay_for(attempt)
                retry_after = headers.get("retry-after")
                if retry_after is not None:
                    try:
                        delay = min(self.policy.max_delay, float(retry_after))
                    except ValueError:
                        pass  # non-numeric Retry-After: keep the backoff
                self._sleep(delay)
        raise RetryBudgetExhausted(url, self.policy.max_retries + 1, last_status)

    def get_json(self, url: str):
        return json.loads(self.get(url))


def urllib_send(url: str) -> tuple[int, dict[str, str], str]:
    """Real-network send (stdlib only). Never invoked by tests or CI —
    constructed lazily so sandboxed environments import cleanly."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=30) as resp:  # noqa: S310
            headers = {k.lower(): v for k, v in resp.headers.items()}
            return resp.status, headers, resp.read().decode("utf-8")
    except urllib.error.HTTPError as e:  # 4xx/5xx carry retry headers
        headers = {k.lower(): v for k, v in (e.headers or {}).items()}
        return e.code, headers, ""


def http_transport(
    policy: RetryPolicy | None = None, *, min_interval: float = 0.5
) -> PolicyTransport:
    """A real paced+retrying HTTP transport over urllib."""
    return PolicyTransport(urllib_send, policy, min_interval=min_interval)
