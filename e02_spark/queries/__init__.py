"""Declared queries (SURVEY.md §7.3) and their DuckDB oracle twins.

Each submodule exposes:
  QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]
  ORACLE:  dict[str, str]   # DuckDB SQL over the same parquet views
                            # (omit a key -> driver does a rows-only check)

Aggregation of all submodules happens in `all_queries()` / `all_oracles()`,
which is what `__spark_entry__.py` re-exports to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from . import depgraph_q, kimball_q, llm_q, relational, relational2, relational3

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (relational, relational2, relational3, kimball_q, depgraph_q, llm_q):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from . import depgraph_q, kimball_q, llm_q, relational, relational2, relational3

    out: dict[str, str] = {}
    for mod in (relational, relational2, relational3, kimball_q, depgraph_q, llm_q):
        out.update(mod.ORACLE)
    return out
