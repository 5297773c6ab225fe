"""Glob-pattern owner mapping as Spark transforms.

Two glob→regex translators exist in the reference and they differ — both
are reproduced bug-for-bug (SURVEY.md §2 B8/B9):

  - Python variant (generate_codefacilitators.py:28-30):
      '/' → '\\/', '*' → '[^/]*', anchored ^...$
      QUIRKS: '.' is NOT escaped (matches any char); '?' is NOT handled
      (left as a regex quantifier!).
  - JS variant (pr-review-flow.yml:127-132):
      same, plus '?' → '[^/]'.
      QUIRK shared: '.' still unescaped. Literal pattern '*' matches every
      file regardless of slashes (pr-review-flow.yml:147) — special-cased
      BEFORE regex matching.

The translation is done with Spark-SQL `replace` so the same expression
can be embedded verbatim in the DuckDB oracle.

Scale: pattern tables are KB-sized → broadcast; the pattern match is a
BroadcastNestedLoopJoin (rlike theta-join), linear in the file corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Spark SQL / DuckDB shared expression fragments (identical in both dialects)
GLOB_TO_REGEX_PY_SQL = (
    "'^' || replace(replace({p}, '/', chr(92) || '/'), '*', '[^/]*') || '$'"
)
GLOB_TO_REGEX_JS_SQL = (
    "'^' || replace(replace(replace({p}, '/', chr(92) || '/'),"
    " '*', '[^/]*'), '?', '[^/]') || '$'"
)


def parse_owner_lines(owner_lines: DataFrame) -> DataFrame:
    """(tier, line) → (tier, pattern, team) exploded — skip blank lines and
    '#' comments; first whitespace token is the glob, rest are teams with
    '@' stripped (generate_codefacilitators.py:21-26;
    pr-review-flow.yml:140-151).
    """
    trimmed = F.trim(F.col("line"))
    tokens = F.split(trimmed, r"\s+")
    return (
        owner_lines.where((trimmed != "") & ~trimmed.startswith("#"))
        .select(
            "tier",
            tokens.getItem(0).alias("pattern"),
            F.explode(F.slice(tokens, 2, 1000)).alias("team_raw"),
        )
        .select("tier", "pattern", F.regexp_replace("team_raw", "^@", "").alias("team"))
    )


def match_files_py(files: DataFrame, patterns: DataFrame, path_col: str = "path") -> DataFrame:
    """Python-translator pattern join: every (file, pattern-row) pair where
    the glob matches. No literal-'*' special case (the Python side has
    none). BroadcastNestedLoopJoin by construction."""
    pat = F.broadcast(
        patterns.withColumn(
            "pattern_regex", F.expr(GLOB_TO_REGEX_PY_SQL.format(p="pattern"))
        )
    )
    return files.crossJoin(pat).where(F.expr(f"`{path_col}` rlike pattern_regex"))


def match_files_js(files: DataFrame, patterns: DataFrame, path_col: str = "path") -> DataFrame:
    """JS-translator pattern join with the literal-'*' match-all special
    case (pr-review-flow.yml:147)."""
    pat = F.broadcast(
        patterns.withColumn(
            "pattern_regex", F.expr(GLOB_TO_REGEX_JS_SQL.format(p="pattern"))
        )
    )
    return files.crossJoin(pat).where(
        (F.col("pattern") == "*") | F.expr(f"`{path_col}` rlike pattern_regex")
    )


def codefacilitators(flat_deps: DataFrame, owner_lines: DataFrame) -> DataFrame:
    """MARTOWNERS ∘ flattened deps = CODEFACILITATORS
    (generate_codefacilitators.py:32-49).

    flat_deps: (func_name, def_path, files ARRAY) from scanner.flatten_one_hop.
    Returns (func_name, def_path, teams ARRAY sorted) — functions whose
    dep files match no pattern are DROPPED (:40).
    """
    mart = parse_owner_lines(owner_lines).where(F.col("tier") == "martowners")
    dep_files = flat_deps.select(
        "func_name", "def_path", F.explode("files").alias("dep_file")
    )
    matched = match_files_py(dep_files, mart, path_col="dep_file")
    return (
        matched.groupBy("func_name", "def_path")
        .agg(F.sort_array(F.collect_set("team")).alias("teams"))
    )
