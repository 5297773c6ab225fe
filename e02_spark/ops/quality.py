"""Data-quality expectations — declarative constraint checking in one pass.

A 100 TB training-data pipeline gates every ingest batch on expectations
(null/range/set-membership/uniqueness) before it reaches the corpus. The
cost discipline: all row-level expectations are counted in a SINGLE
aggregation pass (one scan, map-side partials), and only key-uniqueness
needs its own shuffle (a groupBy on the key).

The reference's analog is the review gate's boolean predicates
(`pr-review-flow.yml:223-227`) — per-entity boolean checks aggregated to
a verdict; here generalized to dataset-level quality verdicts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def expect(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """Count violations of each boolean expectation in ONE scan.

    rules: [(rule_name, boolean_condition)] — a row VIOLATES a rule when
    the condition is not true (false OR null, so `col > 0` also flags
    nulls unless the rule says otherwise). Returns (rule, violations)
    with one row per rule, in one aggregation pass.
    """
    aggs = [
        F.sum(
            F.when(cond, F.lit(0)).otherwise(F.lit(1))
        ).cast("bigint").alias(name)
        for name, cond in rules
    ]
    wide = df.agg(*aggs)
    stack_expr = ", ".join(f"'{name}', `{name}`" for name, _ in rules)
    return wide.selectExpr(
        f"stack({len(rules)}, {stack_expr}) as (rule, violations)"
    )


def expect_unique(df: DataFrame, key_cols: list[str], rule_name: str) -> DataFrame:
    """Count rows participating in a duplicated key (0 when the key is
    unique). Same (rule, violations) shape as expect(); one shuffle on
    the key columns."""
    dups = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > 1)
        .agg(F.coalesce(F.sum("_n"), F.lit(0)).cast("bigint").alias("violations"))
    )
    return dups.select(F.lit(rule_name).alias("rule"), "violations")


# --- PII scrubbing ---------------------------------------------------------
# Every public training-data pipeline scrubs contact-like PII before
# training (emails, phone numbers, IP addresses — the C4/Dolma-style rule
# set). Patterns are deliberately restricted to syntax valid in BOTH Java
# regex (Spark executors) and RE2 (DuckDB oracle): character classes,
# bounded repetition, \b word boundaries — no lookaround, no backrefs.
# Scale: redaction/counting is per-row regexp work inside whole-stage
# codegen — no UDF, no shuffle beyond the caller's aggregation.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # name -> (pattern, replacement token)
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    # Four NANP-ish phone shapes, ordered leftmost-first (both Java and
    # RE2 resolve alternation leftmost-first, so the engines agree):
    #   (555) 123-4567 / +1 (555) 123-4567   — parenthesized area code
    #   555-123-4567 / +1-555.123 4567        — separated 3-3-4
    #   5551234567                            — bare 10 digits
    #   555-0123                              — local 3-4 (the original)
    "phone": (
        r"(\+1[-. ]?)?\(\d{3}\)[-. ]?\d{3}[-. ]?\d{4}\b"
        r"|(\+1[-. ]?)?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"
        r"|\b\d{10}\b"
        r"|\b\d{3}-\d{4}\b",
        "[PHONE]",
    ),
    # SSN-shaped 3-2-4 (dash-separated only: the spaced/undashed forms
    # collide with phone shapes and dates far too often to scrub blind)
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    # Full-form (8-group, uncompressed) IPv6 only: the `::`-compressed
    # forms can't be matched without lookaround/backrefs, which the
    # shared Java∩RE2 dialect excludes. Requiring exactly 7 colon groups
    # also keeps clock-like text (12:30:45) out.
    "ipv6": (
        r"\b(?:[0-9A-Fa-f]{1,4}:){7}[0-9A-Fa-f]{1,4}\b",
        "[IP6]",
    ),
}

# Application order matters (email first: its pattern spans dots/digits
# that the ipv4 pattern could otherwise partially claim inside a
# user@10.0.0.1-style address; ssn before phone so a 3-2-4 run is
# claimed as SSN, not half-claimed by the local 3-4 phone form; phone
# before ipv4 so dotted 3-3-4 phone forms aren't half-claimed as
# address octets). Counting is per-pattern on the RAW text, independent
# of redaction order — deterministic either way.
_PII_ORDER = ("email", "ssn", "phone", "ipv4", "ipv6")


def redact_pii(col: Column) -> Column:
    """Replace every PII match with its bracketed token, JVM-side."""
    out = col
    for name in _PII_ORDER:
        pat, repl = PII_PATTERNS[name]
        out = F.regexp_replace(out, pat, repl.replace("$", r"\$"))
    return out


def pii_counts(col: Column) -> dict[str, Column]:
    """Per-pattern match counts over the raw text (codegen regexp_count)."""
    return {
        name: F.regexp_count(col, F.lit(PII_PATTERNS[name][0]))
        for name in _PII_ORDER
    }
