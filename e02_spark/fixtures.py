"""Reference-parity fixture tables (FIXTURES.md §B).

One source of truth: each fixture is a list of Python tuples + an explicit
schema. `spark_df()` builds the Spark DataFrame; `sql_values_cte()` renders
the identical rows as a DuckDB VALUES clause for oracle queries — so the
Spark query and its oracle run over byte-identical inputs.

Fixture content mirrors the reference's own test fixtures
(/root/reference/.github/tests/test_scan_dependencies.py:18-56) and config
files (.github/CODEOWNERS, .github/MARTOWNERS, .github/CODETECHTEAM), and
deliberately includes the documented quirk triggers:
  - a depth-3 call chain (one-hop flattening, scan_dependencies.py:163-192)
  - a self-referencing function definition (skip rule, :132-134)
  - mixed-case call sites (lowercasing, :128-130)
  - a file outside the 4 scanned roots (:71-76)
  - a filename where the def-regex prefix-matches but trailing text remains
    (re.match, not fullmatch, :56-58)
  - glob patterns with unescaped dots and a literal '*' match-all
    (generate_codefacilitators.py:28-30, pr-review-flow.yml:127-147)
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# B1. sql_files(path, content) — the scanner's file corpus
# ---------------------------------------------------------------------------
SQL_FILES = [
    # function definitions (deployer/patch/DWH/kimball, non-recursive glob)
    (
        "deployer/patch/DWH/kimball/r_3.000001_f_base_func.sql",
        "CREATE OR REPLACE FUNCTION ${KIMBALL}.BASE_FUNC(X VARCHAR)\nRETURN 'x'",
    ),
    (
        "deployer/patch/DWH/kimball/r_3.000002_f_middle_func.sql",
        "CREATE OR REPLACE FUNCTION ${kimball}.middle_func(X VARCHAR)\n"
        "RETURN ${ENV_PREFIX}DWH.KIMBALL.base_func(X)",
    ),
    (
        "deployer/patch/DWH/kimball/r_3.000003_f_top_func.sql",
        "CREATE OR REPLACE FUNCTION ${kimball}.TOP_FUNC(X VARCHAR)\n"
        "RETURN KIMBALL.Middle_Func(X)",
    ),
    (
        "deployer/patch/DWH/kimball/r_3.000140_f_utm_campaign_to_product.sql",
        "CREATE OR REPLACE FUNCTION ${kimball}.UTM_CAMPAIGN_TO_PRODUCT (CAMPAIGN VARCHAR)\n"
        "RETURN KIMBALL.utm_to_financial_channel(NULL, NULL, CAMPAIGN, NULL, NULL, NULL, NULL)",
    ),
    (
        "deployer/patch/DWH/kimball/r_6.001.001_f_utm_to_financial_channel.sql",
        "CREATE OR REPLACE FUNCTION ${KIMBALL}.UTM_TO_FINANCIAL_CHANNEL\n"
        "(SRC VARCHAR, MEDIUM VARCHAR, CAMPAIGN VARCHAR, CONTENT_NUM NUMBER,\n"
        " ARG5 VARCHAR, ARG6 VARCHAR, PRODUCT VARCHAR)\nRETURN CASE WHEN 1=1 THEN 'x' END",
    ),
    # self-reference: definition file calls itself -> must be skipped
    (
        "deployer/patch/DWH/kimball/r_5.000001_f_recursive_func.sql",
        "CREATE OR REPLACE FUNCTION ${kimball}.RECURSIVE_FUNC(N NUMBER)\n"
        "RETURN KIMBALL.recursive_func(N - 1)",
    ),
    # prefix-match quirk: re.match stops at the first '.sql'; trailing text ok
    (
        "deployer/patch/DWH/kimball/r_9.001_f_weird.sqlish.sql",
        "CREATE OR REPLACE FUNCTION ${kimball}.WEIRD() RETURN 1",
    ),
    # a versioned view (v_, not f_): not a function definition, but it CALLS one
    (
        "deployer/patch/DWH/kimball/r_4.001.045_v_marketing_paid_traffic_report_hot_view.sql",
        "CREATE OR REPLACE VIEW ${kimball}.V_MARKETING AS SELECT\n"
        "CASE WHEN ${ENV_PREFIX}DWH.KIMBALL.UTM_CAMPAIGN_TO_PRODUCT(UTM_CAMPAIGN) ="
        " 'Страхование имущества' THEN 'ИФЛ' END AS C1 FROM T",
    ),
    # plain consumer files in the other scanned roots
    (
        "replicator/source/end_view.sql",
        "SELECT ${ENV_PREFIX}DWH.KIMBALL.middle_func(c) FROM t",
    ),
    (
        "superset/datasets/kimball/kimball.msb-web-fb_req.sql",
        "select KIMBALL.UTM_CAMPAIGN_TO_PRODUCT(UTM_CAMPAIGN) AS CAMPAIGN",
    ),
    (
        "superset_objects/datasets/CPA-WEB-COSTS.sql",
        "SELECT * FROM X WHERE KIMBALL.UTM_CAMPAIGN_TO_PRODUCT(UTM_CAMPAIGN) = 'Микрокредиты'",
    ),
    (
        "superset_objects/datasets/DIM_MFO_FD_WEB_CHANNEL.sql",
        "SELECT KIMBALL.UTM_TO_FINANCIAL_CHANNEL(UTM_SOURCE, UTM_MEDIUM, UTM_CAMPAIGN,\n"
        "TRY_CAST(UTM_CONTENT AS NUMBER(38,0)), NULL, NULL, 'Микрокредиты') FROM Y",
    ),
    # calls base_func twice -> set semantics dedup to one edge
    (
        "superset/datasets/kimball/double_call.sql",
        "select KIMBALL.base_func(a), kimball.BASE_FUNC(b) from t",
    ),
    # outside the 4 scanned roots -> ignored entirely
    (
        "other/outside_scanned_roots.sql",
        "SELECT KIMBALL.base_func(1)",
    ),
    # mentions kimball.unknown_func -> dropped by known-callee filter
    (
        "replicator/source/unknown_call.sql",
        "SELECT KIMBALL.unknown_func(1), KIMBALL.top_func(2) FROM t",
    ),
]
SQL_FILES_SCHEMA = "path STRING, content STRING"

# ---------------------------------------------------------------------------
# B2. owner_lines(tier, line) — raw line-oriented owner config, comments and
# blank lines included (parse operator A4 must skip them).
# tiers: codeowners, martowners, facilitators, techteam
# ---------------------------------------------------------------------------
OWNER_LINES = [
    ("codeowners", "# code owners"),
    ("codeowners", ""),
    ("codeowners", "*.md @org/tech-team"),
    ("codeowners", "deployer/patch/DWH/kimball/r_3*f_*.sql @org/analysts-owners"),
    ("codeowners", "deployer/patch/DWH/kimball/r_5*f_*.sql @org/analysts-owners"),
    ("codeowners", "deployer/patch/DWH/kimball/r_?.001_f_weird.sqlish.sql @org/quirk-owners"),
    ("martowners", "# mart owners"),
    ("martowners", ""),
    ("martowners", "replicator/source/* @org/ab-team"),
    ("martowners", "superset/datasets/kimball/* @org/market-facilitators @org/bi-team"),
    ("martowners", "superset_objects/datasets/* @org/market-facilitators"),
    ("martowners", "deployer/patch/DWH/kimball/r_4.*v_*.sql @org/market-facilitators"),
    ("facilitators", "# auto-generated"),
    (
        "facilitators",
        "deployer/patch/DWH/kimball/r_3.000140_f_utm_campaign_to_product.sql"
        " @org/market-facilitators",
    ),
    (
        "facilitators",
        "deployer/patch/DWH/kimball/r_6.001.001_f_utm_to_financial_channel.sql"
        " @org/market-facilitators @org/bi-team",
    ),
    ("techteam", "* @org/tech-team"),
]
OWNER_LINES_SCHEMA = "tier STRING, line STRING"

# ---------------------------------------------------------------------------
# B3. reviews(pr, user, state, ts) — keep-latest-per-(pr,user) then APPROVED
# ---------------------------------------------------------------------------
_T = datetime
REVIEWS = [
    # pr 1: frank (tech) approves
    (1, "frank", "APPROVED", _T(2024, 3, 1, 10, 0, 0)),
    (1, "dave", "COMMENTED", _T(2024, 3, 1, 10, 5, 0)),
    # pr 2: alice approved then requested changes (latest wins -> NOT approver)
    (2, "alice", "APPROVED", _T(2024, 3, 2, 9, 0, 0)),
    (2, "alice", "CHANGES_REQUESTED", _T(2024, 3, 2, 11, 0, 0)),
    (2, "erin", "APPROVED", _T(2024, 3, 2, 12, 0, 0)),  # inactive member
    # pr 3: carol approved twice (stays approver)
    (3, "carol", "APPROVED", _T(2024, 3, 3, 9, 0, 0)),
    (3, "carol", "APPROVED", _T(2024, 3, 3, 10, 0, 0)),
    # pr 4: alice approves (codeowners ok), nobody from facilitators
    (4, "alice", "APPROVED", _T(2024, 3, 4, 9, 0, 0)),
    (4, "dave", "CHANGES_REQUESTED", _T(2024, 3, 4, 9, 30, 0)),
    # pr 5: alice + heidi + carol approve (owners + facilitators ok, tech
    # missing -> 'tech' stage)
    (5, "alice", "APPROVED", _T(2024, 3, 5, 9, 0, 0)),
    (5, "heidi", "APPROVED", _T(2024, 3, 5, 9, 10, 0)),
    (5, "carol", "APPROVED", _T(2024, 3, 5, 9, 15, 0)),
    (5, "bob", "COMMENTED", _T(2024, 3, 5, 9, 30, 0)),
]
REVIEWS_SCHEMA = "pr BIGINT, user STRING, state STRING, ts TIMESTAMP"

# ---------------------------------------------------------------------------
# B4. team_members(team, user, active)
# ---------------------------------------------------------------------------
TEAM_MEMBERS = [
    ("org/analysts-owners", "alice", True),
    ("org/analysts-owners", "bob", True),
    ("org/market-facilitators", "carol", True),
    ("org/market-facilitators", "erin", False),  # inactive: must not count
    ("org/tech-team", "frank", True),
    ("org/tech-team", "grace", True),
    ("org/bi-team", "bob", True),  # bob in two teams
    ("org/ab-team", "dave", True),
    ("org/quirk-owners", "heidi", True),
]
TEAM_MEMBERS_SCHEMA = "team STRING, user STRING, active BOOLEAN"

# ---------------------------------------------------------------------------
# B5. pr_files(pr, path)
# ---------------------------------------------------------------------------
PR_FILES = [
    (1, "README.md"),
    (2, "deployer/patch/DWH/kimball/r_3.000001_f_base_func.sql"),
    (2, "README.md"),
    (3, "superset/datasets/kimball/kimball.msb-web-fb_req.sql"),
    (3, "README.md"),
    (4, "deployer/patch/DWH/kimball/r_3.000140_f_utm_campaign_to_product.sql"),
    (5, "deployer/patch/DWH/kimball/r_3.000140_f_utm_campaign_to_product.sql"),
    (5, "deployer/patch/DWH/kimball/r_9.001_f_weird.sqlish.sql"),
]
PR_FILES_SCHEMA = "pr BIGINT, path STRING"

# ---------------------------------------------------------------------------
# B6. utm_rows — input for the Kimball mart surface (C1-C7)
# ---------------------------------------------------------------------------
UTM_ROWS = [
    ("google", "cpc", "mfo_spring_promo", "87"),
    ("yandex", "organic", "strah_doma_2024", "abc"),
    (None, "ppc", "micro_loans", "00012"),
    ("fb", None, "insurance_home", None),
    ("x", "email", "brand_awareness", " 7 "),
    (None, None, None, "12.5"),
    ("organic", None, "mfo_x", ""),
    ("direct", "cpc", None, "300"),
]
UTM_ROWS_SCHEMA = "utm_source STRING, utm_medium STRING, utm_campaign STRING, utm_content STRING"

# ---------------------------------------------------------------------------
# B8. media(media_id, kind, width, height, payload) — multimodal binary
# columns: opaque payloads with typed metadata (SURVEY.md §2.E E9). The
# payloads are deterministic byte patterns standing in for image/audio
# bytes; decode itself is stubbed (ops/multimodal.py) but the Spark-side
# plumbing (binary column, schema, batching) is real.
# ---------------------------------------------------------------------------
def _fake_payload(seed: int, n: int) -> bytes:
    return bytes((seed * 7 + j * 13) % 256 for j in range(n))


MEDIA = [
    (1, "image", 640, 480, _fake_payload(1, 64)),
    (2, "image", 1024, 768, _fake_payload(2, 96)),
    (3, "audio", 0, 0, _fake_payload(3, 128)),
    (4, "image", 320, 240, _fake_payload(4, 32)),
    (5, "video", 1920, 1080, _fake_payload(5, 256)),
]
MEDIA_SCHEMA = "media_id BIGINT, kind STRING, width BIGINT, height BIGINT, payload BINARY"

# ---------------------------------------------------------------------------
# B7. lexicon(token, polarity) — tokens drawn from the documents vocabulary
# ---------------------------------------------------------------------------
LEXICON = [
    ("fast", 1.0),
    ("slow", -1.0),
    ("big", 0.5),
    ("small", -0.25),
    ("merge", 0.25),
    ("filter", 0.5),
    ("scan", -0.5),
]
LEXICON_SCHEMA = "token STRING, polarity DOUBLE"

_FIXTURES: dict[str, tuple[list[tuple], str]] = {
    "sql_files": (SQL_FILES, SQL_FILES_SCHEMA),
    "owner_lines": (OWNER_LINES, OWNER_LINES_SCHEMA),
    "reviews": (REVIEWS, REVIEWS_SCHEMA),
    "team_members": (TEAM_MEMBERS, TEAM_MEMBERS_SCHEMA),
    "pr_files": (PR_FILES, PR_FILES_SCHEMA),
    "utm_rows": (UTM_ROWS, UTM_ROWS_SCHEMA),
    "lexicon": (LEXICON, LEXICON_SCHEMA),
    "media": (MEDIA, MEDIA_SCHEMA),
}


_DF_MEMO: dict[tuple[str, str], DataFrame] = {}
_STAGE_ROOT: dict[str, str] = {}


def spark_df(spark: SparkSession, name: str) -> DataFrame:
    """Fixture table as a DataFrame, staged ONCE per session as a
    single-file parquet and read back from there.

    Why staging instead of handing out the raw createDataFrame result: a
    LocalRelation executed inside a job parallelizes to
    sparkContext.defaultParallelism slices (32 here) no matter how few
    rows it holds, so every map stage over a 15-row fixture scheduled 32
    tasks — and the depgraph/gate pipelines run ~40 such stages, which the
    round-4 driver bench measured as 5.3 s of pure task dispatch for the
    q17 entry. A one-file parquet scan plans exactly 1 task per stage and
    keeps accurate size stats, so small-table auto-broadcast still fires
    (measured: q72 cold 6.3 s -> 1.5 s). The staging write is one-time per
    session; like the driver's own testdata parquet, the staged INPUT
    files survive reset_shared_state — the queries under test still
    re-scan them cold on every run.

    (An earlier experiment coalesce(1)-ing the LocalRelation itself was
    5x SLOWER: each reference re-ran the parallelize+coalesce chain. The
    parquet staging pays that once and never again.)
    """
    key = (spark.sparkContext.applicationId, name)
    df = _DF_MEMO.get(key)
    if df is None:
        import os
        import tempfile

        rows, schema = _FIXTURES[name]
        root = _STAGE_ROOT.get(key[0])
        if root is None:
            root = tempfile.mkdtemp(prefix="e02_fixtures_")
            _STAGE_ROOT[key[0]] = root
        path = os.path.join(root, name)
        spark.createDataFrame(rows, schema=schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        df = spark.read.parquet(path)
        _DF_MEMO[key] = df
    return df


def _sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        # VALUES integer literals default to INT32 in DuckDB; Spark
        # createDataFrame uses BIGINT — force the wider type.
        return f"CAST({v} AS BIGINT)"
    if isinstance(v, float):
        return f"CAST({v!r} AS DOUBLE)"
    if isinstance(v, (bytes, bytearray)):
        return "'" + "".join(f"\\x{b:02X}" for b in v) + "'::BLOB"
    if isinstance(v, datetime):
        # keep microseconds when present — spark_df() does, and the two
        # renderings must stay byte-equivalent
        fmt = "%Y-%m-%d %H:%M:%S.%f" if v.microsecond else "%Y-%m-%d %H:%M:%S"
        return f"TIMESTAMP '{v.strftime(fmt)}'"
    return "'" + str(v).replace("'", "''") + "'"


def sql_values_cte(name: str) -> str:
    """Render fixture `name` as `name(col, ...) AS (VALUES ...)` for a WITH
    clause in a DuckDB oracle query."""
    rows, schema = _FIXTURES[name]
    cols = [c.strip().split()[0] for c in schema.split(",")]
    values = ",\n    ".join(
        "(" + ", ".join(_sql_literal(v) for v in row) + ")" for row in rows
    )
    return f'{name}("' + '", "'.join(cols) + f'") AS (VALUES\n    {values})'
