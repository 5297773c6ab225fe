"""A8, second feed: the reference's PR-files REST endpoint as a custom
Spark data source (Spark 4 Python DataSource API).

The reference's workflow fetches BOTH review-feed endpoints per PR —
`pulls/{pr}/reviews` AND `pulls/{pr}/files` (`pr-review-flow.yml:88-98`);
round 3 gave the reviews feed the real-connector treatment
(sources/rest_reviews.py, q90) while pr_files stayed a fixture DataFrame.
This source completes the pair with the same architecture:

- `partitions()` plans one InputPartition per PR page — executors fetch
  and parse pages concurrently; the driver only plans PR numbers. At
  scale a pager would also split a PR's file list into per-page
  partitions (the endpoint paginates at 30 files/page) — the partition
  object carries `page` for that, planned trivially here because the
  fixture corpus fits one page per PR.
- `read(partition)` json-decodes the page body executor-side and emits
  typed (pr, path, status) rows, the GitHub response's relevant fields.

Offline: the payload is the canonical fixture corpus serialized in the
API's response shape (no network in this environment), so any query over
this source is oracle-checkable against the `pr_files` VALUES CTE.
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .. import fixtures

SCHEMA = "pr BIGINT, path STRING, status STRING"


def _response_pages() -> dict[int, str]:
    """One JSON body per PR, shaped like `pulls/{pr}/files`: a list of
    file objects with `filename`/`status` (the fields the reference's
    scanner consumes)."""
    pages: dict[int, list[dict]] = {}
    for pr, path in fixtures.PR_FILES:
        pages.setdefault(pr, []).append({"filename": path, "status": "modified"})
    return {pr: json.dumps(body) for pr, body in pages.items()}


class _PrFilesPage(InputPartition):
    def __init__(self, pr: int, page: int, body: str, fail_rate_limited: int = 0):
        self.pr = pr
        self.page = page
        self.body = body
        self.fail_rate_limited = fail_rate_limited


class RestPrFilesReader(DataSourceReader):
    """Executor-side fetch goes through sources/http_client.
    fetch_with_backoff — the same 403/429-with-Retry-After discipline the
    reviews connector models (the files endpoint shares GitHub's rate
    limits); `simulate_rate_limited_attempts` injects failures for
    tests."""

    def __init__(self, options=None):
        self.options = dict(options or {})

    def partitions(self):
        frl = int(self.options.get("simulate_rate_limited_attempts", 0))
        return [
            _PrFilesPage(pr, 1, body, frl)
            for pr, body in sorted(_response_pages().items())
        ]

    def read(self, partition: _PrFilesPage):
        from e02_spark.sources.http_client import RateLimited, fetch_with_backoff

        def fetch(attempt: int):
            if attempt < partition.fail_rate_limited:
                raise RateLimited(retry_after=0.0, status=403)
            return json.loads(partition.body)

        for rec in fetch_with_backoff(fetch, base_delay=0.0):
            yield (partition.pr, rec["filename"], rec["status"])


class RestPrFilesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_pr_files"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return RestPrFilesReader(getattr(self, "options", None))


def register(spark) -> None:
    """Idempotent registration of the short name."""
    key = spark.sparkContext.applicationId
    if key in _REGISTERED:
        return
    spark.dataSource.register(RestPrFilesDataSource)
    _REGISTERED.add(key)


_REGISTERED: set[str] = set()
