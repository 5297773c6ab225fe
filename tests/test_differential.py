"""Differential fuzzing: the SAME ANSI-SQL text over hypothesis-generated
tables must return identical results from Spark SQL and DuckDB.

The oracle gate checks 50 fixed queries over fixed data; this harness
generalizes the correctness claim — random small relations (with NULL
keys, dangling foreign keys, empty tables, duplicate rows) through the
core relational surface (outer join + agg, window functions, NOT EXISTS,
set ops, ROLLUP). Any Spark/DuckDB divergence in null semantics, vacuous
aggregation, or frame defaults fails loudly with the generated input.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

STATUSES = ["A", "B", None]
TAGS = ["x", "y", None]


@st.composite
def _tables(draw):
    n_o = draw(st.integers(min_value=0, max_value=10))
    n_l = draw(st.integers(min_value=0, max_value=20))
    orders = [
        (
            i + 1,
            draw(st.one_of(st.none(), st.integers(min_value=1, max_value=3))),
            draw(st.sampled_from(STATUSES)),
            draw(st.integers(min_value=-5, max_value=100)),
        )
        for i in range(n_o)
    ]
    lines = [
        (
            i + 1,
            # dangling keys (> n_o) and NULL keys both possible
            draw(st.one_of(st.none(), st.integers(min_value=1, max_value=n_o + 2))),
            draw(st.integers(min_value=0, max_value=9)),
            draw(st.sampled_from(TAGS)),
        )
        for i in range(n_l)
    ]
    return orders, lines


_QUERIES = [
    # left outer join + aggregation over a nullable group key
    """
    SELECT o.status AS status, COUNT(l.l_id) AS n_lines,
           COALESCE(SUM(l.qty), 0) AS total_qty
    FROM t_orders o LEFT JOIN t_lines l ON l.o_id = o.o_id
    GROUP BY o.status
    """,
    # window functions: row_number + lag with default frames
    """
    SELECT o_id, cust,
           ROW_NUMBER() OVER (PARTITION BY cust ORDER BY o_id) AS rn,
           LAG(amount) OVER (PARTITION BY cust ORDER BY o_id) AS prev_amt,
           SUM(amount) OVER (PARTITION BY cust ORDER BY o_id) AS run_amt
    FROM t_orders
    """,
    # NOT EXISTS anti-join semantics with NULL/dangling keys
    """
    SELECT COUNT(*) AS n_unreferenced
    FROM t_orders o
    WHERE NOT EXISTS (SELECT 1 FROM t_lines l WHERE l.o_id = o.o_id)
    """,
    # set-op dedup incl. NULL equality in UNION
    """
    SELECT cust AS v FROM t_orders UNION SELECT qty AS v FROM t_lines
    """,
    # ROLLUP with NULL group values vs the rollup's own NULLs.
    # KNOWN ENGINE DIVERGENCE (found by this harness on its first run):
    # over an EMPTY input, the standard says the () grouping set emits one
    # grand-total row (COUNT(*)=0) — DuckDB does; Spark 4 returns ZERO
    # rows for ROLLUP/CUBE on empty input. The repo's rollup entries never
    # aggregate empty input, so the case is excluded below (guarded, not
    # hidden).
    """
    SELECT status, cust, COUNT(*) AS n
    FROM t_orders GROUP BY ROLLUP (status, cust)
    """,
    # scalar subquery + conditional aggregation
    """
    SELECT o.o_id,
           (SELECT COALESCE(SUM(l.qty), 0) FROM t_lines l
             WHERE l.o_id = o.o_id AND l.tag IS NOT NULL) AS tagged_qty
    FROM t_orders o
    """,
]


def _norm(df: pd.DataFrame):
    """Engine-neutral value multiset: None-normalized python tuples,
    column-name order, sorted."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if v is None or (isinstance(v, float) and pd.isna(v)) or pd.isna(v):
                vals.append(None)
            elif isinstance(v, float):
                vals.append(round(v, 9))
            else:
                vals.append(int(v) if hasattr(v, "item") or isinstance(v, int) else v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(type(x)), x) for x in t))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(tables=_tables())
def test_spark_duckdb_differential(spark, tables):
    orders, lines = tables
    o_pdf = pd.DataFrame(orders, columns=["o_id", "cust", "status", "amount"])
    l_pdf = pd.DataFrame(lines, columns=["l_id", "o_id", "qty", "tag"])

    spark.createDataFrame(
        orders, schema="o_id BIGINT, cust BIGINT, status STRING, amount BIGINT"
    ).createOrReplaceTempView("t_orders")
    spark.createDataFrame(
        lines, schema="l_id BIGINT, o_id BIGINT, qty BIGINT, tag STRING"
    ).createOrReplaceTempView("t_lines")

    con = duckdb.connect()
    con.register("t_orders", o_pdf.astype({"o_id": "Int64", "cust": "Int64", "amount": "Int64"}))
    con.register("t_lines", l_pdf.astype({"l_id": "Int64", "o_id": "Int64", "qty": "Int64"}))
    try:
        for q in _QUERIES:
            if "ROLLUP" in q and not orders:
                continue  # documented empty-input ROLLUP divergence above
            got = _norm(spark.sql(q).toPandas())
            want = _norm(con.sql(q).df())
            assert got == want, (q, got, want, orders, lines)
    finally:
        con.close()
