"""Fetch discipline for the REST connectors: retry/backoff and
pagination exhaustion, modeled the way the reference's workflow consumes
the GitHub API (`/root/reference/.github/workflows/pr-review-flow.yml:
88-98` — paginated list endpoints, subject to 403/429 rate limiting with
a Retry-After hint and transient 5xx).

Offline by design (no network in this environment): the connectors call
these helpers around an injectable `fetch` callable, and the test suite
injects 403-then-success and multi-page sequences. The logic itself is
the production logic — executor-side, per-partition, no driver loop.

Scale notes: backoff runs INSIDE the executor task that owns the page,
so a rate-limited shard stalls only its own task slot; Spark's own task
retry remains the outer safety net for exhausted budgets. Deterministic
delays (exponential, no jitter RNG) keep replays reproducible; a real
deployment would add jitter to avoid thundering herds, which is a
one-line change callers can make via `base_delay`.
"""

from __future__ import annotations

import time
from typing import Callable, Iterator, TypeVar

T = TypeVar("T")


class RateLimited(Exception):
    """HTTP 403/429 with an optional Retry-After seconds hint."""

    def __init__(self, retry_after: float | None = None, status: int = 429):
        super().__init__(f"rate limited (HTTP {status})")
        self.retry_after = retry_after
        self.status = status


class TransientServerError(Exception):
    """HTTP 5xx — retryable without a server-provided delay hint."""

    def __init__(self, status: int = 503):
        super().__init__(f"transient server error (HTTP {status})")
        self.status = status


def fetch_with_backoff(
    fetch: Callable[[int], T],
    max_retries: int = 5,
    base_delay: float = 1.0,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Run `fetch(attempt)` with exponential backoff on retryable
    failures.

    RateLimited sleeps the server's Retry-After hint when present,
    otherwise the current exponential delay; TransientServerError always
    uses the exponential delay. Any other exception propagates
    immediately (4xx-style permanent failures must fail the task, not
    burn the retry budget). After max_retries retries the last retryable
    error re-raises — a loud task failure, never a silent empty page.
    """
    delay = base_delay
    for attempt in range(max_retries + 1):
        try:
            return fetch(attempt)
        except RateLimited as e:
            if attempt == max_retries:
                raise
            sleep(e.retry_after if e.retry_after is not None else delay)
        except TransientServerError:
            if attempt == max_retries:
                raise
            sleep(delay)
        delay *= 2
    raise AssertionError("unreachable")


def paginate(
    fetch_page: Callable[[int], tuple[T, bool]],
    start_page: int = 1,
    max_pages: int = 10_000,
) -> Iterator[T]:
    """Follow a paged list endpoint to exhaustion.

    `fetch_page(page)` returns (body, has_next) — the has_next flag is
    the connector's parse of the response's `Link: rel="next"` header.
    Yields each body in page order and stops after the last page.
    max_pages guards against a server that always advertises a next page
    (runaway pager = infinite executor task): exceeding it raises.
    """
    page = start_page
    while True:
        if page - start_page >= max_pages:
            raise RuntimeError(
                f"pagination did not exhaust within {max_pages} pages "
                f"(started at {start_page}) — runaway Link chain"
            )
        body, has_next = fetch_page(page)
        yield body
        if not has_next:
            return
        page += 1
