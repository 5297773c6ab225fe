"""Dependency scanner as Spark DataFrame transformations.

Reference semantics (cited to /root/reference/.github/scripts/
scan_dependencies.py) reproduced exactly, including quirks:

  - function defs live ONLY directly under deployer/patch/DWH/kimball
    (non-recursive glob, :45-54)
  - def filename regex r"r_\\d+\\.\\d+(?:\\.\\d+)?_f_([a-z_]+)\\.sql"
    IGNORECASE, applied with re.match → anchored at the START of the
    basename only; trailing text after ".sql" still matches (:32-34, :56)
  - captured function name is lowercased (:57)
  - call sites: r"kimball\\.([a-z_]+)\\s*\\(" over LOWERCASED content,
    unanchored (so DWH.KIMBALL.f( matches) (:35-37, :128)
  - only calls to KNOWN functions kept (:130-131)
  - a call inside the callee's own definition file is skipped (:132-134)
  - calling file classified: function definition vs plain file (:136-149)
  - set semantics: duplicate calls collapse (:140-148)
  - flattening is exactly ONE hop: files(f) ∪ files(g) for each g that
    directly calls f — not a fixpoint (:163-192; the recursion guard is
    dead code)

At scale: the corpus is a (path, content) DataFrame (100 TB of text files
→ partitioned parquet/binaryFile). Function defs are a tiny dimension →
broadcast joins everywhere; the only shuffles are the two groupBys, both
on the low-cardinality function-name key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCAN_ROOTS = [
    "replicator/source",
    "deployer/patch",
    "superset/datasets/kimball",
    "superset_objects/datasets",
]

FUNCTIONS_DIR = "deployer/patch/DWH/kimball"

# re.match → anchor at start; no $ so trailing text after .sql is tolerated.
# (?i) mirrors the reference's re.IGNORECASE on the WHOLE pattern
# (scan_dependencies.py:32-34): 'R_1.1_F_FOO.sql' is a valid def file.
FUNC_DEF_RE = r"(?i)^r_\d+\.\d+(?:\.\d+)?_f_([a-zA-Z_]+)\.sql"
CALL_RE = r"kimball\.([a-z_]+)\s*\("


def scan_function_defs(sql_files: DataFrame) -> DataFrame:
    """(path, content) → (func_name, def_path).

    Mirrors scan_functions (scan_dependencies.py:43-67): non-recursive
    *.sql glob of the kimball patch dir + prefix regex on the basename.
    """
    basename = F.element_at(F.split(F.col("path"), "/"), -1)
    in_dir = F.col("path").startswith(FUNCTIONS_DIR + "/")
    # non-recursive glob: the path is exactly <dir>/<basename>; the glob's
    # "*.sql" extension match is case-SENSITIVE (pathlib on Linux) even
    # though the filename regex is IGNORECASE
    direct_child = (
        F.length("path")
        == F.length(F.lit(FUNCTIONS_DIR)) + 1 + F.length(basename)
    ) & F.col("path").endswith(".sql")
    name = F.lower(F.regexp_extract(basename, FUNC_DEF_RE, 1))
    return (
        sql_files.where(in_dir & direct_child)
        .select(name.alias("func_name"), F.col("path").alias("def_path"))
        .where(F.col("func_name") != "")
    )


def in_scan_roots(sql_files: DataFrame) -> DataFrame:
    """Restrict the corpus to the 4 scanned roots (scan_dependencies.py:69-89)."""
    cond = None
    for root in SCAN_ROOTS:
        c = F.col("path").startswith(root + "/")
        cond = c if cond is None else (cond | c)
    # rglob("*.sql") — case-sensitive extension, like the reference
    return sql_files.where(cond & F.col("path").endswith(".sql"))


def extract_call_edges(sql_files: DataFrame, functions: DataFrame) -> DataFrame:
    """Call-site extraction + known-callee filter + self-skip + caller
    classification (scan_dependencies.py:121-149).

    Returns distinct edges (callee, caller_path, caller_func, caller_kind)
    where caller_func is NULL for plain files and caller_kind ∈
    {'function', 'file'}.
    """
    calls = (
        in_scan_roots(sql_files)
        .select(
            F.col("path").alias("caller_path"),
            F.explode(
                F.regexp_extract_all(F.lower(F.col("content")), F.lit(CALL_RE), F.lit(1))
            ).alias("callee"),
        )
        .distinct()  # set semantics: a file calling f twice is one edge
    )
    defs = F.broadcast(functions)
    # known-callee filter + callee's own def path (for the self-skip)
    known = calls.join(
        defs.select(
            F.col("func_name").alias("callee"), F.col("def_path").alias("callee_def_path")
        ),
        "callee",
        "inner",
    ).where(F.col("caller_path") != F.col("callee_def_path"))
    # classify the caller: is the calling file itself a function definition?
    classified = known.join(
        defs.select(
            F.col("def_path").alias("caller_path"), F.col("func_name").alias("caller_func")
        ),
        "caller_path",
        "left",
    )
    return classified.select(
        "callee",
        "caller_path",
        "caller_func",
        F.when(F.col("caller_func").isNotNull(), "function")
        .otherwise("file")
        .alias("caller_kind"),
    )


def dependency_graph(sql_files: DataFrame) -> DataFrame:
    """Raw dependency nodes: one row per known function with its deduped,
    sorted usage sets (scan_dependencies.py:107-155, to_dict :18-26).

    Returns (func_name, def_path, used_in_files ARRAY, used_in_functions
    ARRAY) — every known function appears even with empty usage (the
    reference initializes all functions up front, :107-114).
    """
    functions = scan_function_defs(sql_files)
    edges = extract_call_edges(sql_files, functions)
    usage = edges.groupBy(F.col("callee").alias("func_name")).agg(
        F.sort_array(
            F.collect_set(F.when(F.col("caller_kind") == "file", F.col("caller_path")))
        ).alias("used_in_files"),
        F.sort_array(
            F.collect_set(F.when(F.col("caller_kind") == "function", F.col("caller_func")))
        ).alias("used_in_functions"),
    )
    return (
        functions.join(usage, "func_name", "left")
        .select(
            "func_name",
            "def_path",
            F.coalesce("used_in_files", F.array().cast("array<string>")).alias(
                "used_in_files"
            ),
            F.coalesce("used_in_functions", F.array().cast("array<string>")).alias(
                "used_in_functions"
            ),
        )
    )


def flatten_one_hop(sql_files: DataFrame) -> DataFrame:
    """Flattened dependencies: files(f) ∪ files(g) for each function g
    that directly calls f — exactly one hop (scan_dependencies.py:163-192).

    Returns (func_name, def_path, files ARRAY<STRING> sorted).
    """
    functions = scan_function_defs(sql_files)
    edges = extract_call_edges(sql_files, functions)
    file_edges = edges.where(F.col("caller_kind") == "file").select(
        "callee", F.col("caller_path").alias("file")
    )
    func_edges = edges.where(F.col("caller_kind") == "function").select(
        "callee", "caller_func"
    )
    # files of the direct caller functions: g calls f, file uses g ⇒ file ∈ flat(f)
    via_callers = func_edges.join(
        file_edges.withColumnRenamed("callee", "caller_func"), "caller_func"
    ).select("callee", "file")
    all_files = file_edges.unionByName(via_callers).distinct()
    agg = all_files.groupBy(F.col("callee").alias("func_name")).agg(
        F.sort_array(F.collect_set("file")).alias("files")
    )
    return functions.join(agg, "func_name", "left").select(
        "func_name",
        "def_path",
        F.coalesce("files", F.array().cast("array<string>")).alias("files"),
    )


def flatten_fixpoint(sql_files: DataFrame, max_iters: int = 50) -> DataFrame:
    """Generalized transitive closure (NOT reference parity — the reference
    is strictly one hop; this is the 'better' semantics behind a flag,
    SURVEY.md §4 item 1).

    Iterates caller→callee file propagation to a fixpoint with
    localCheckpoint() per iteration to truncate lineage. Iterations are
    bounded by graph depth; each is one self-join + distinct.
    """
    functions = scan_function_defs(sql_files)
    edges = extract_call_edges(sql_files, functions)
    file_edges = edges.where(F.col("caller_kind") == "file").select(
        "callee", F.col("caller_path").alias("file")
    )
    func_edges = edges.where(F.col("caller_kind") == "function").select(
        "callee", "caller_func"
    )
    reach = file_edges.distinct()
    for _ in range(max_iters):
        stepped = (
            func_edges.join(reach.withColumnRenamed("callee", "caller_func"), "caller_func")
            .select("callee", "file")
        )
        new_reach = reach.unionByName(stepped).distinct().localCheckpoint(eager=True)
        if new_reach.count() == reach.count():
            reach = new_reach
            break
        reach = new_reach
    agg = reach.groupBy(F.col("callee").alias("func_name")).agg(
        F.sort_array(F.collect_set("file")).alias("files")
    )
    return functions.join(agg, "func_name", "left").select(
        "func_name",
        "def_path",
        F.coalesce("files", F.array().cast("array<string>")).alias("files"),
    )
