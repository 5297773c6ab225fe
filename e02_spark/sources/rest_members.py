"""A8 third feed as a REAL connector: the reference's team-membership
lookups as a custom Spark data source (Spark 4 Python DataSource API).

The reference's gate asks the GitHub REST API per (team, approver)
whether the approver is an ACTIVE member
(`pr-review-flow.yml:197-199` — `teams.getMembershipForUserInOrg({org,
team_slug, username})`, membership.state === 'active'; a 404 means not
a member at all). A scalable engine inverts that per-lookup loop into a
roster feed: one InputPartition per team, each serving the team's
membership page, with the API's `state` field parsed into the boolean
the gate joins on (`active`). Pending memberships (the API's other
state) are carried as active=false — exactly the fixture's inactive-
member semantics.

Offline here like the sibling connectors (`rest_reviews`,
`rest_pr_files`): the payload is the canonical fixture corpus serialized
in the API's response shape, so any query over this source is checkable
against the `team_members` VALUES CTE — but the parse path is real:
executors receive JSON bytes and emit typed rows.

    spark.dataSource.register(RestMembersDataSource)
    spark.read.format("rest_members").load()
"""

from __future__ import annotations

import json

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .. import fixtures

SCHEMA = "team STRING, user STRING, active BOOLEAN"


def _response_pages() -> dict[str, str]:
    """One JSON body per team slug, shaped like the membership endpoint:
    a list of {login, state} objects (state: 'active' | 'pending')."""
    pages: dict[str, list[dict]] = {}
    for team, user, active in fixtures.TEAM_MEMBERS:
        pages.setdefault(team, []).append(
            {"login": user, "state": "active" if active else "pending"}
        )
    return {team: json.dumps(body) for team, body in pages.items()}


class _TeamPage(InputPartition):
    def __init__(self, team: str, body: str, fail_rate_limited: int = 0):
        self.team = team
        self.body = body
        self.fail_rate_limited = fail_rate_limited


class RestMembersReader(DataSourceReader):
    """Executor-side fetch goes through sources/http_client.
    fetch_with_backoff (GitHub team endpoints share the same rate
    limits); `simulate_rate_limited_attempts` injects failures for
    tests."""

    def __init__(self, options=None):
        self.options = dict(options or {})

    def partitions(self):
        frl = int(self.options.get("simulate_rate_limited_attempts", 0))
        return [
            _TeamPage(t, body, frl)
            for t, body in sorted(_response_pages().items())
        ]

    def read(self, partition: _TeamPage):
        from e02_spark.sources.http_client import RateLimited, fetch_with_backoff

        def fetch(attempt: int):
            if attempt < partition.fail_rate_limited:
                raise RateLimited(retry_after=0.0, status=403)
            return json.loads(partition.body)

        for rec in fetch_with_backoff(fetch, base_delay=0.0):
            yield (partition.team, rec["login"], rec["state"] == "active")


class RestMembersDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "rest_members"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema):
        return RestMembersReader(getattr(self, "options", None))


def register(spark) -> None:
    """Idempotent registration of the short name."""
    key = spark.sparkContext.applicationId
    if key in _REGISTERED:
        return
    spark.dataSource.register(RestMembersDataSource)
    _REGISTERED.add(key)


_REGISTERED: set[str] = set()
