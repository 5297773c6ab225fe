"""Local replica of the driver's t2 gate: every declared query must
hash-match its DuckDB oracle twin at sf0.001 (fast) — the driver runs the
same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from e02_spark.oracle_check import compare_query
from e02_spark.queries import all_oracles, all_queries

SF_SMALL = "/root/testdata/sf0.001"

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, name):
    result = compare_query(spark, name, SF_SMALL, _QUERIES[name], _ORACLES.get(name))
    assert result.ok, str(result)


def test_entry_smoke(spark):
    import __spark_entry__ as ent

    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # flagship = q77 corpus curation
    assert {"lang", "source", "n_docs", "total_tokens"} <= set(df.columns)


def test_oracle_names_subset_of_queries():
    assert set(_ORACLES) <= set(_QUERIES)
