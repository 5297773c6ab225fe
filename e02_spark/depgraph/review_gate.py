"""PR review-gate pipeline as Spark transforms.

Reference semantics (pr-review-flow.yml):
  - keep-latest review per (pr, user): Map overwrite in API submission
    order (:100-103) → window row_number over ts desc
  - approvers = latest state == 'APPROVED' (:107-109)
  - per tier, required teams = teams of owner-file lines whose glob (JS
    translator) matches ANY changed file, or whose pattern is literally
    '*' (:136-155)
  - a team approves iff ∃ approver whose membership is active (:190-212)
  - tier approved = every(Boolean) over its teams — VACUOUSLY TRUE for a
    tier with no matching lines (:211, Promise.all([]) → [])
  - 3-stage gate (:242-288):
      owners✓ ∧ ¬fac            → 'facilitators'  (label added)
      owners✓ ∧ fac✓ ∧ ¬tech    → 'tech'          (label swapped)
      owners✓ ∧ fac✓ ∧ tech✓    → 'done'          (labels cleared)
      otherwise                 → 'owners'        (waiting on code owners)

Scale: reviews/team_members shuffle on (pr, user)-grain keys; pattern
tables broadcast. The whole gate is a handful of semi-joins + one
bool_and aggregation per tier — recomputed per event exactly like the
reference (batch recomputation model).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .owners import match_files_js, parse_owner_lines

TIERS = ["codeowners", "facilitators", "techteam"]


def latest_reviews(reviews: DataFrame) -> DataFrame:
    """Keep-latest per (pr, user); primary order ts desc (Map overwrite
    keeps the last submission; API order is ts order). Exact-equal
    timestamps have no reference-defined order — we break the tie
    deterministically by state desc so repeated runs (and the oracle twin)
    agree."""
    w = Window.partitionBy("pr", "user").orderBy(
        F.col("ts").desc(), F.col("state").desc()
    )
    return (
        reviews.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def approvers(reviews: DataFrame) -> DataFrame:
    """(pr, user) pairs whose LATEST review is APPROVED."""
    return (
        latest_reviews(reviews)
        .where(F.col("state") == "APPROVED")
        .select("pr", "user")
    )


def tier_requirements(pr_files: DataFrame, owner_lines: DataFrame) -> DataFrame:
    """(pr, tier, team) — teams required per PR per tier (JS glob matching
    incl. the literal-'*' match-all)."""
    # the gate reads CODEOWNERS / CODEFACILITATORS / CODETECHTEAM only —
    # MARTOWNERS feeds the facilitators *generator*, not the gate
    patterns = parse_owner_lines(owner_lines).where(F.col("tier").isin(TIERS))
    matched = match_files_js(pr_files, patterns, path_col="path")
    return matched.select("pr", "tier", "team").distinct()


def team_approvals(
    requirements: DataFrame, approvals: DataFrame, team_members: DataFrame
) -> DataFrame:
    """(pr, tier, team, approved) — existential active-member approval."""
    active = team_members.where(F.col("active")).select("team", "user")
    # approvers of a PR who are active members of the required team
    hit = (
        requirements.join(approvals, "pr")
        .join(active, ["team", "user"], "left_semi")
        .select("pr", "tier", "team")
        .distinct()
        .withColumn("approved", F.lit(True))
    )
    return requirements.join(hit, ["pr", "tier", "team"], "left").select(
        "pr", "tier", "team", F.coalesce("approved", F.lit(False)).alias("approved")
    )


def gate_status(
    pr_files: DataFrame,
    reviews: DataFrame,
    team_members: DataFrame,
    owner_lines: DataFrame,
) -> DataFrame:
    """Per PR: tier approval booleans + gate stage.

    Returns (pr, codeowners_approved, facilitators_approved, tech_approved,
    stage). Tiers with no matching owner lines are vacuously approved.
    """
    return gate_from_approvals(
        pr_files, approvers(reviews), team_members, owner_lines
    )


def gate_from_approvals(
    pr_files: DataFrame,
    approvals: DataFrame,
    team_members: DataFrame,
    owner_lines: DataFrame,
) -> DataFrame:
    """`gate_status` with the keep-latest/APPROVED reduction already done:
    `approvals` is (pr, user) pairs whose latest review is APPROVED. This
    is the seam the E15 stateful stream plugs into — the stream maintains
    the per-PR approver set incrementally (streaming/jobs.py), and the
    gate evaluation downstream of it is the SAME dataflow the batch gate
    uses, so stream and batch agree by construction wherever their
    approver sets do (reference: pr-review-flow.yml:242-288)."""
    prs = pr_files.select("pr").distinct()
    reqs = tier_requirements(pr_files, owner_lines)
    per_team = team_approvals(reqs, approvals, team_members)
    per_tier = per_team.groupBy("pr", "tier").agg(
        F.bool_and("approved").alias("tier_ok")
    )
    wide = prs
    for tier, col in [
        ("codeowners", "codeowners_approved"),
        ("facilitators", "facilitators_approved"),
        ("techteam", "tech_approved"),
    ]:
        t = per_tier.where(F.col("tier") == tier).select(
            "pr", F.col("tier_ok").alias(col)
        )
        # vacuous truth: no required teams in this tier → approved
        wide = wide.join(t, "pr", "left").withColumn(col, F.coalesce(col, F.lit(True)))
    return wide.withColumn(
        "stage",
        F.when(
            F.col("codeowners_approved")
            & F.col("facilitators_approved")
            & F.col("tech_approved"),
            "done",
        )
        .when(
            F.col("codeowners_approved") & F.col("facilitators_approved"), "tech"
        )
        .when(F.col("codeowners_approved"), "facilitators")
        .otherwise("owners"),
    )
