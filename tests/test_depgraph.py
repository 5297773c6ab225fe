"""Reference-parity tests for the depgraph subsystem.

Ports the reference's three scanner tests
(/root/reference/.github/tests/test_scan_dependencies.py:31-162) onto the
DataFrame implementation, plus pins for every documented quirk:
one-hop flattening (depth-3 does NOT propagate), self-reference skip,
out-of-roots exclusion, prefix-only filename match, glob unescaped-dot,
literal-'*' match-all, JS '?' handling, keep-latest dedup, vacuous-true
empty tiers, and the generalized fixpoint (non-parity) variant.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from e02_spark import fixtures
from e02_spark.depgraph.owners import codefacilitators, match_files_js, parse_owner_lines
from e02_spark.depgraph.review_gate import gate_status, latest_reviews
from e02_spark.depgraph.scanner import (
    dependency_graph,
    flatten_fixpoint,
    flatten_one_hop,
    scan_function_defs,
)

KDIR = "deployer/patch/DWH/kimball"


def _files_df(spark, rows):
    return spark.createDataFrame(rows, schema="path STRING, content STRING")


def _graph(spark, rows):
    return {
        r["func_name"]: r
        for r in dependency_graph(_files_df(spark, rows)).collect()
    }


# --- reference test 1: direct file→function dependency (:31-64) -----------
def test_dependency_searching(spark):
    rows = [
        (f"{KDIR}/r_1.1_f_test_func.sql", "CREATE FUNCTION ${kimball}.TEST_FUNC()"),
        ("replicator/source/usage.sql", "SELECT KIMBALL.test_func(1) FROM t"),
    ]
    g = _graph(spark, rows)
    assert g["test_func"]["used_in_files"] == ["replicator/source/usage.sql"]
    assert g["test_func"]["used_in_functions"] == []


# --- reference test 2: function→function edge (:66-97) --------------------
def test_function_to_function_dependency(spark):
    rows = [
        (f"{KDIR}/r_1.1_f_inner_func.sql", "CREATE FUNCTION inner"),
        (f"{KDIR}/r_1.2_f_outer_func.sql", "RETURN KIMBALL.inner_func(1)"),
    ]
    g = _graph(spark, rows)
    assert g["inner_func"]["used_in_functions"] == ["outer_func"]
    assert g["inner_func"]["used_in_files"] == []


# --- reference test 3: depth-2 flattening (:99-162) -----------------------
def test_transitive_dependency_flattening(spark):
    rows = [
        (f"{KDIR}/r_1.1_f_base_func.sql", "CREATE FUNCTION base"),
        (f"{KDIR}/r_1.2_f_wrapper_func.sql", "RETURN KIMBALL.base_func(1)"),
        ("replicator/source/end_view.sql", "SELECT KIMBALL.wrapper_func(1)"),
    ]
    flat = {
        r["func_name"]: r["files"]
        for r in flatten_one_hop(_files_df(spark, rows)).collect()
    }
    assert flat["wrapper_func"] == ["replicator/source/end_view.sql"]
    # base_func inherits the file of its direct caller (one hop)
    assert flat["base_func"] == ["replicator/source/end_view.sql"]


# --- quirk pin: depth-3 does NOT propagate (one hop, not fixpoint) --------
def test_depth3_one_hop_parity(spark):
    rows = [
        (f"{KDIR}/r_1.1_f_base_func.sql", "CREATE FUNCTION base"),
        (f"{KDIR}/r_1.2_f_middle_func.sql", "RETURN KIMBALL.base_func(1)"),
        (f"{KDIR}/r_1.3_f_top_func.sql", "RETURN KIMBALL.middle_func(1)"),
        ("replicator/source/end_view.sql", "SELECT KIMBALL.top_func(1)"),
    ]
    df = _files_df(spark, rows)
    flat = {r["func_name"]: r["files"] for r in flatten_one_hop(df).collect()}
    assert flat["top_func"] == ["replicator/source/end_view.sql"]
    assert flat["middle_func"] == ["replicator/source/end_view.sql"]
    assert flat["base_func"] == []  # one hop only — exactly the reference
    # ...while the generalized fixpoint variant DOES propagate:
    fix = {r["func_name"]: r["files"] for r in flatten_fixpoint(df).collect()}
    assert fix["base_func"] == ["replicator/source/end_view.sql"]


def test_self_reference_and_roots_and_prefix_quirks(spark):
    g = _graph(spark, fixtures.SQL_FILES)
    # self-referencing definition file is skipped
    assert g["recursive_func"]["used_in_files"] == []
    assert g["recursive_func"]["used_in_functions"] == []
    # other/outside_scanned_roots.sql calls base_func but is ignored
    assert "other/outside_scanned_roots.sql" not in g["base_func"]["used_in_files"]
    # re.match prefix quirk: r_9.001_f_weird.sqlish.sql defines 'weird'
    defs = {
        r["func_name"]
        for r in scan_function_defs(
            _files_df(spark, fixtures.SQL_FILES)
        ).collect()
    }
    assert "weird" in defs


def test_uppercase_def_filename_matches(spark):
    # the reference's def regex is IGNORECASE on the WHOLE pattern
    # (scan_dependencies.py:32-34) but the *.sql glob extension is
    # case-sensitive: R_..._F_FOO.sql matches, ....SQL does not
    rows = [
        (f"{KDIR}/R_1.1_F_FOO.sql", "CREATE FUNCTION foo"),
        (f"{KDIR}/R_1.2_F_BAR.SQL", "CREATE FUNCTION bar"),
        ("replicator/source/u.sql", "SELECT KIMBALL.foo(1), KIMBALL.bar(1)"),
    ]
    defs = {
        r["func_name"]
        for r in scan_function_defs(_files_df(spark, rows)).collect()
    }
    assert defs == {"foo"}
    g = _graph(spark, rows)
    assert g["foo"]["used_in_files"] == ["replicator/source/u.sql"]


def test_glob_translator_quirks(spark):
    files = spark.createDataFrame(
        [
            ("deployer/patch/DWH/kimball/r_4X001_v_report.sql",),  # dot matches X
            ("README.md",),
            ("a/b/c.txt",),
        ],
        schema="path STRING",
    )
    patterns = spark.createDataFrame(
        [
            ("t", "deployer/patch/DWH/kimball/r_4.*v_*.sql", "dot-quirk"),
            ("t", "*", "match-all"),
            ("t", "R?ADME.md", "js-qmark"),
        ],
        schema="tier STRING, pattern STRING, team STRING",
    )
    got = {
        (r["path"], r["team"])
        for r in match_files_js(files, patterns).select("path", "team").collect()
    }
    # unescaped '.' matched the literal X
    assert ("deployer/patch/DWH/kimball/r_4X001_v_report.sql", "dot-quirk") in got
    # literal '*' matches everything, even paths with slashes
    assert ("a/b/c.txt", "match-all") in got
    # JS translator: '?' -> [^/]
    assert ("README.md", "js-qmark") in got


def test_owner_line_parsing_skips_comments_blanks(spark):
    parsed = parse_owner_lines(fixtures.spark_df(spark, "owner_lines"))
    pats = [r["pattern"] for r in parsed.collect()]
    assert "#" not in "".join(pats)
    assert "" not in pats


def test_keep_latest_dedup(spark):
    df = spark.createDataFrame(
        [
            (1, "alice", "APPROVED", datetime(2024, 1, 1, 10)),
            (1, "alice", "CHANGES_REQUESTED", datetime(2024, 1, 1, 12)),
            (1, "bob", "APPROVED", datetime(2024, 1, 1, 11)),
        ],
        schema="pr BIGINT, user STRING, state STRING, ts TIMESTAMP",
    )
    latest = {r["user"]: r["state"] for r in latest_reviews(df).collect()}
    assert latest == {"alice": "CHANGES_REQUESTED", "bob": "APPROVED"}


def test_gate_stages_cover_all_four(spark):
    status = gate_status(
        fixtures.spark_df(spark, "pr_files"),
        fixtures.spark_df(spark, "reviews"),
        fixtures.spark_df(spark, "team_members"),
        fixtures.spark_df(spark, "owner_lines"),
    )
    stages = {r["pr"]: r["stage"] for r in status.collect()}
    assert stages[1] == "done"
    assert stages[2] == "owners"
    assert stages[4] == "facilitators"
    assert stages[5] == "tech"


def test_kimball_deploy_version_order_and_composition(spark):
    # C10: patch files apply in lexicographic version order, so the
    # composing UDF (r_3...) resolves the earlier one (r_2...); C2/C9:
    # the deployed UDF-over-UDF works with ${} substitution applied
    from e02_spark.kimball.mart import PATCH_FILES, deploy

    names = [n for n, _ in sorted(PATCH_FILES, key=lambda t: t[0])]
    assert names == sorted(names)
    assert names[0].startswith("r_2.") and names[1].startswith("r_3.")
    deploy(spark, database="kimball_ordertest")
    got = spark.sql(
        "SELECT kimball_ordertest.utm_campaign_to_product('mfo_promo') AS p"
    ).collect()[0]["p"]
    assert got == "Микрокредиты"


def test_codefacilitators_drops_unmatched(spark):
    files = fixtures.spark_df(spark, "sql_files")
    lines = fixtures.spark_df(spark, "owner_lines")
    result = codefacilitators(flatten_one_hop(files), lines)
    funcs = {r["func_name"] for r in result.collect()}
    # 'weird' and 'recursive_func' have no dep files matching MARTOWNERS
    assert "weird" not in funcs
    assert "recursive_func" not in funcs
    assert "utm_campaign_to_product" in funcs


def test_rest_pr_files_connector(spark):
    """The pr_files custom source (Spark 4 Python DataSource): one input
    partition per PR page planned driver-side, JSON parsed executor-side,
    rows equal to the canonical fixture corpus."""
    from e02_spark import fixtures
    from e02_spark.sources.rest_pr_files import RestPrFilesReader, register

    # partition planning: one page per distinct PR
    parts = RestPrFilesReader().partitions()
    assert sorted(p.pr for p in parts) == sorted({pr for pr, _ in fixtures.PR_FILES})

    register(spark)
    df = spark.read.format("rest_pr_files").load()
    assert df.schema.simpleString() == (
        "struct<pr:bigint,path:string,status:string>"
    )
    got = sorted((r["pr"], r["path"]) for r in df.collect())
    assert got == sorted(fixtures.PR_FILES)
    assert {r["status"] for r in df.collect()} == {"modified"}


def test_rest_reviews_connector(spark):
    """Same shape pin for the reviews source: one partition per PR page,
    rows equal to the canonical fixture feed."""
    from e02_spark import fixtures
    from e02_spark.sources.rest_reviews import RestReviewsReader, register

    parts = RestReviewsReader().partitions()
    assert sorted(p.pr for p in parts) == sorted(
        {pr for pr, _, _, _ in fixtures.REVIEWS}
    )

    register(spark)
    df = spark.read.format("rest_reviews").load()
    got = sorted(
        (r["pr"], r["user"], r["state"], r["ts"]) for r in df.collect()
    )
    assert got == sorted(fixtures.REVIEWS)


def test_http_client_backoff_and_pagination_unit():
    """Fetch discipline (round-6 verdict task #5): Retry-After honored,
    5xx exponential, budget exhaustion raises the last error, pagination
    follows has-next to exhaustion and a runaway Link chain trips the
    max_pages guard."""
    import pytest as _pytest

    from e02_spark.sources.http_client import (
        RateLimited,
        TransientServerError,
        fetch_with_backoff,
        paginate,
    )

    sleeps: list[float] = []
    calls: list[int] = []

    def flaky(attempt: int):
        calls.append(attempt)
        if attempt == 0:
            raise RateLimited(retry_after=7.5, status=403)
        if attempt == 1:
            raise TransientServerError(status=502)
        return "body"

    out = fetch_with_backoff(flaky, base_delay=1.0, sleep=sleeps.append)
    assert out == "body" and calls == [0, 1, 2]
    # first sleep is the server's Retry-After hint, second the
    # exponential delay (base doubled once after attempt 0)
    assert sleeps == [7.5, 2.0]

    def always_limited(attempt: int):
        raise RateLimited(retry_after=0.0)

    with _pytest.raises(RateLimited):
        fetch_with_backoff(always_limited, max_retries=3, sleep=lambda s: None)

    pages = {1: ("a", True), 2: ("b", True), 3: ("c", False)}
    assert list(paginate(lambda p: pages[p])) == ["a", "b", "c"]
    with _pytest.raises(RuntimeError, match="runaway"):
        list(paginate(lambda p: ("x", True), max_pages=5))


def test_rest_reviews_retry_and_pagination_options(spark):
    """The reviews connector's executor-side read survives injected
    403-then-5xx-then-success sequences per page and multi-page
    pagination, returning EXACTLY the baseline rows; an injected failure
    budget beyond max_retries raises instead of yielding a silent empty
    page."""
    import pytest

    from e02_spark import fixtures
    from e02_spark.sources.http_client import RateLimited
    from e02_spark.sources.rest_reviews import RestReviewsReader, register

    register(spark)
    want = sorted(fixtures.REVIEWS)
    df = (
        spark.read.format("rest_reviews")
        .option("per_page", 1)
        .option("simulate_rate_limited_attempts", 2)
        .option("simulate_server_error_attempts", 1)
        .load()
    )
    got = sorted((r["pr"], r["user"], r["state"], r["ts"]) for r in df.collect())
    assert got == want

    # exhaustion path at the reader level (keeps Spark's own task retry
    # out of the picture): 9 failures > default 5-retry budget
    reader = RestReviewsReader({"simulate_rate_limited_attempts": "9"})
    (part, *_) = reader.partitions()
    with pytest.raises(RateLimited):
        list(reader.read(part))


def test_rest_members_connector(spark):
    """The team-membership custom source (A8's third feed,
    pr-review-flow.yml:197-199): one partition per team roster page, the
    API's state field parsed to the active boolean, rows equal to the
    canonical fixture corpus."""
    from e02_spark import fixtures
    from e02_spark.sources.rest_members import RestMembersReader, register

    parts = RestMembersReader().partitions()
    assert sorted(p.team for p in parts) == sorted(
        {t for t, _, _ in fixtures.TEAM_MEMBERS}
    )

    register(spark)
    df = spark.read.format("rest_members").load()
    assert df.schema.simpleString() == (
        "struct<team:string,user:string,active:boolean>"
    )
    got = sorted((r["team"], r["user"], r["active"]) for r in df.collect())
    assert got == sorted(fixtures.TEAM_MEMBERS)


def test_q21_gate_reads_membership_connector(spark):
    """q21's membership side must come from the rest_members connector —
    the scan appears in the physical plan — and the gate result must be
    unchanged vs the fixture join (same rows either way)."""
    from e02_spark import fixtures
    from e02_spark.depgraph.review_gate import gate_status
    from e02_spark.queries.depgraph_q import q21_team_gate

    df = q21_team_gate(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "rest_members" in plan.lower(), plan

    via_fixture = gate_status(
        fixtures.spark_df(spark, "pr_files"),
        fixtures.spark_df(spark, "reviews"),
        fixtures.spark_df(spark, "team_members"),
        fixtures.spark_df(spark, "owner_lines"),
    )
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, via_fixture.collect())
    )
