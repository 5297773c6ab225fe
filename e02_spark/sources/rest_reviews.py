"""A8 as a REAL connector: the reference's REST review feed as a custom
Spark data source (Spark 4 Python DataSource API).

The reference fetches PR reviews from the GitHub REST API inside its
workflow (`pr-review-flow.yml:88-98` — one `pulls/{pr}/reviews` call per
PR, paginated JSON). Rounds 1-2 modeled that surface as fixture
DataFrames; this source upgrades it to an actual pluggable connector:

- `partitions()` plans one InputPartition per PR — the unit a REST
  pager parallelizes over (at scale: thousands of PR pages fetched by
  executors concurrently, not looped on the driver).
- `read(partition)` "fetches" the page and parses its JSON body into
  typed rows. Offline here (the payload is the canonical fixture corpus
  serialized as the API's response shape — no network in this
  environment), but the parse path is the real one: executors receive
  bytes, json-decode, emit (pr, user, state, ts) tuples.

Registered under the short name `rest_reviews`:

    spark.dataSource.register(RestReviewsDataSource)
    spark.read.format("rest_reviews").load()

Oracle story: the payload is exactly `fixtures.REVIEWS`, so any query
over this source is checkable against the `reviews` VALUES CTE.
"""

from __future__ import annotations

import json
from datetime import datetime

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .. import fixtures

SCHEMA = "pr BIGINT, user STRING, state STRING, ts TIMESTAMP"


def _response_pages() -> dict[int, str]:
    """The REST responses this offline source serves: one JSON body per
    PR, shaped like the GitHub reviews endpoint's relevant fields."""
    pages: dict[int, list[dict]] = {}
    for pr, user, state, ts in fixtures.REVIEWS:
        pages.setdefault(pr, []).append(
            {"user": {"login": user}, "state": state,
             "submitted_at": ts.isoformat()}
        )
    return {pr: json.dumps(body) for pr, body in pages.items()}


class _PrPage(InputPartition):
    def __init__(
        self,
        pr: int,
        body: str,
        per_page: int = 0,
        fail_rate_limited: int = 0,
        fail_server: int = 0,
    ):
        self.pr = pr
        self.body = body
        self.per_page = per_page  # 0 = everything in one page
        # failure injection (tests): each page's first N fetch attempts
        # raise RateLimited, the next M raise TransientServerError
        self.fail_rate_limited = fail_rate_limited
        self.fail_server = fail_server


class RestReviewsReader(DataSourceReader):
    """Executor-side fetch runs through the SAME retry/pagination
    discipline a live deployment needs (sources/http_client.py):
    fetch_with_backoff around each page request (403/429 Retry-After
    honored, 5xx exponential, budget exhaustion raises) and paginate()
    following the has-next chain to exhaustion. Offline, the transport
    serves slices of the canned body; the `simulate_*` options make it
    fail first so the retry path is executed for real inside Spark
    workers (pinned in tests/test_custom_source.py)."""

    def __init__(self, options=None):
        self.options = dict(options or {})

    def partitions(self):
        per_page = int(self.options.get("per_page", 0))
        frl = int(self.options.get("simulate_rate_limited_attempts", 0))
        fsv = int(self.options.get("simulate_server_error_attempts", 0))
        return [
            _PrPage(pr, body, per_page, frl, fsv)
            for pr, body in sorted(_response_pages().items())
        ]

    def read(self, partition: _PrPage):
        from e02_spark.sources.http_client import (
            RateLimited,
            TransientServerError,
            fetch_with_backoff,
            paginate,
        )

        records = json.loads(partition.body)
        per_page = partition.per_page or max(len(records), 1)

        def fetch_page(page: int):
            lo = (page - 1) * per_page

            def fetch(attempt: int):
                if attempt < partition.fail_rate_limited:
                    raise RateLimited(retry_after=0.0, status=403)
                if attempt < partition.fail_rate_limited + partition.fail_server:
                    raise TransientServerError(status=503)
                return records[lo : lo + per_page]

            chunk = fetch_with_backoff(fetch, base_delay=0.0)
            return chunk, lo + per_page < len(records)

        for chunk in paginate(fetch_page):
            for rec in chunk:
                yield (
                    partition.pr,
                    rec["user"]["login"],
                    rec["state"],
                    datetime.fromisoformat(rec["submitted_at"]),
                )


class RestReviewsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_reviews"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return RestReviewsReader(getattr(self, "options", None))


def register(spark) -> None:
    """Idempotent registration of the short name."""
    key = spark.sparkContext.applicationId
    if key in _REGISTERED:
        return
    spark.dataSource.register(RestReviewsDataSource)
    _REGISTERED.add(key)


_REGISTERED: set[str] = set()
