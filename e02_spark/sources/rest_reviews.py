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
    def __init__(self, pr: int, body: str):
        self.pr = pr
        self.body = body


class RestReviewsReader(DataSourceReader):
    def partitions(self):
        return [_PrPage(pr, body) for pr, body in sorted(_response_pages().items())]

    def read(self, partition: _PrPage):
        for rec in json.loads(partition.body):
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
        return RestReviewsReader()


def register(spark) -> None:
    """Idempotent registration of the short name."""
    key = spark.sparkContext.applicationId
    if key in _REGISTERED:
        return
    spark.dataSource.register(RestReviewsDataSource)
    _REGISTERED.add(key)


_REGISTERED: set[str] = set()
