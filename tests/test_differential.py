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
    # three-valued NOT IN: one NULL in the subquery's result makes the
    # predicate UNKNOWN for every non-matching row (standard SQL's most
    # notorious trap) — both engines must agree row-for-row, including
    # the all-rows-vanish case when any l.o_id IS NULL
    """
    SELECT o_id FROM t_orders
    WHERE o_id NOT IN (SELECT o_id FROM t_lines)
    """,
    # IN with NULL probe values, WHERE context only. KNOWN ENGINE
    # DIVERGENCE (found by this harness): in a PROJECTION,
    # `NULL IN (subquery)` is NULL per the standard (DuckDB agrees) but
    # Spark's ExistenceJoin rewrite yields FALSE. In WHERE context
    # UNKNOWN and FALSE both drop the row, so the engines agree — the
    # repo's queries only use IN-subqueries as predicates.
    """
    SELECT o_id FROM t_orders
    WHERE cust IN (SELECT qty FROM t_lines)
    """,
    # full outer join: unmatched rows from BOTH sides, NULL keys never match
    """
    SELECT COALESCE(o.o_id, -1) AS ok, COALESCE(l.l_id, -1) AS lk,
           o.amount, l.qty
    FROM t_orders o FULL OUTER JOIN t_lines l ON l.o_id = o.o_id
    """,
    # RANGE window frames (D16): value-based peers over a NULLABLE
    # partition key — frame membership, peer-row sharing, and the NULL
    # partition group must agree across engines
    """
    SELECT o_id, cust, amount,
      COUNT(*) OVER (PARTITION BY cust ORDER BY amount
                     RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS n_near,
      SUM(amount) OVER (PARTITION BY cust ORDER BY amount
                        RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS amt_run
    FROM t_orders
    """,
    # recursive CTE (D28): generate a sequence, join it against the data
    """
    WITH RECURSIVE seq(n) AS (
      SELECT 1 UNION ALL SELECT n + 1 FROM seq WHERE n < 12
    )
    SELECT s.n, COUNT(o.o_id) AS n_orders, COALESCE(SUM(o.amount), 0) AS amt
    FROM seq s LEFT JOIN t_orders o ON o.o_id = s.n
    GROUP BY s.n
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


# --- second property: date/time + string surface (D20/D21) ----------------
# Functions restricted to the dialect intersection (date_trunc,
# EXTRACT(year/month/day/hour), interval arithmetic, upper/substr/length,
# LIKE, CASE/COALESCE, lag over time order). Deliberately EXCLUDED:
# EXTRACT(DOW) (DuckDB Sunday=0 vs Spark DAYOFWEEK Sunday=1) — a known
# numbering divergence the engine's own queries avoid by using date_format.

_TIME_QUERIES = [
    """
    SELECT date_trunc('hour', ts) AS h, kind, COUNT(*) AS n,
           COALESCE(SUM(v), 0) AS total
    FROM t_events GROUP BY date_trunc('hour', ts), kind
    """,
    """
    SELECT EXTRACT(year FROM ts) AS y, EXTRACT(month FROM ts) AS mo,
           EXTRACT(day FROM ts) AS d, EXTRACT(hour FROM ts) AS hh,
           COUNT(*) AS n
    FROM t_events GROUP BY 1, 2, 3, 4
    """,
    """
    SELECT e_id, v FROM t_events
    WHERE ts >= TIMESTAMP '2024-03-01 00:00:00' + INTERVAL '90' MINUTE
      AND ts <  TIMESTAMP '2024-03-01 00:00:00' + INTERVAL '1' DAY
    """,
    """
    SELECT e_id, UPPER(kind) AS uk, SUBSTR(kind, 1, 2) AS pre,
           LENGTH(kind) AS ln,
           CASE WHEN kind LIKE 'a%' THEN 'A' WHEN kind IS NULL THEN 'N'
                ELSE 'other' END AS cls
    FROM t_events
    """,
    """
    SELECT e_id, ts,
           LAG(v) OVER (PARTITION BY kind ORDER BY ts, e_id) AS prev_v
    FROM t_events
    """,
    # shifted-bucket day grouping + date cast + minute extraction
    # (EXTRACT(epoch) is DuckDB-only — excluded from the intersection)
    """
    SELECT e_id,
           date_trunc('day', ts + INTERVAL '6' HOUR) AS shifted_day,
           CAST(CAST(ts AS DATE) AS STRING) AS d,
           CAST(EXTRACT(minute FROM ts) AS BIGINT) AS mi
    FROM t_events
    """,
]


@st.composite
def _events(draw):
    from datetime import datetime, timedelta

    n = draw(st.integers(min_value=0, max_value=20))
    base = datetime(2024, 3, 1)
    return [
        (
            i + 1,
            base + timedelta(minutes=draw(st.integers(min_value=0, max_value=3000))),
            draw(st.integers(min_value=-3, max_value=50)),
            draw(st.sampled_from(["add", "apply", "bz", None])),
        )
        for i in range(n)
    ]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(events=_events())
def test_spark_duckdb_time_string_differential(spark, events):
    e_pdf = pd.DataFrame(events, columns=["e_id", "ts", "v", "kind"])
    spark.createDataFrame(
        events, schema="e_id BIGINT, ts TIMESTAMP, v BIGINT, kind STRING"
    ).createOrReplaceTempView("t_events")
    con = duckdb.connect()
    if events:
        con.register("t_events", e_pdf.astype({"e_id": "Int64", "v": "Int64"}))
    else:
        con.sql(
            "CREATE VIEW t_events AS SELECT CAST(NULL AS BIGINT) e_id,"
            " CAST(NULL AS TIMESTAMP) ts, CAST(NULL AS BIGINT) v,"
            " CAST(NULL AS VARCHAR) kind WHERE 1=0"
        )
    try:
        for q in _TIME_QUERIES:
            got = _norm(spark.sql(q).toPandas())
            want = _norm(con.sql(q).df())
            assert got == want, (q, got, want, events)
    finally:
        con.close()


# --- third property: aggregate surface (D10-D13) ---------------------------

_AGG_QUERIES = [
    """
    SELECT cust, COUNT(*) AS n, COUNT(amount) AS n_amt,
           COUNT(DISTINCT status) AS n_status,
           SUM(amount) AS total, MIN(amount) AS lo, MAX(amount) AS hi,
           MIN(status) AS s_lo, MAX(status) AS s_hi
    FROM t_orders GROUP BY cust
    """,
    """
    SELECT status,
           SUM(amount) FILTER (WHERE amount > 0) AS pos_total,
           COUNT(*) FILTER (WHERE cust IS NULL) AS n_nullcust
    FROM t_orders GROUP BY status
    """,
    """
    SELECT cust, SUM(amount) AS total
    FROM t_orders GROUP BY cust
    HAVING SUM(amount) > 10 OR COUNT(*) >= 3
    """,
    """
    SELECT COUNT(*) AS n, COUNT(DISTINCT cust) AS nc, SUM(amount) AS t
    FROM t_orders
    """,
]


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(tables=_tables())
def test_spark_duckdb_aggregate_differential(spark, tables):
    orders, _lines = tables
    o_pdf = pd.DataFrame(orders, columns=["o_id", "cust", "status", "amount"])
    spark.createDataFrame(
        orders, schema="o_id BIGINT, cust BIGINT, status STRING, amount BIGINT"
    ).createOrReplaceTempView("t_orders")
    con = duckdb.connect()
    con.register(
        "t_orders",
        o_pdf.astype({"o_id": "Int64", "cust": "Int64", "amount": "Int64"}),
    )
    try:
        for q in _AGG_QUERIES:
            got = _norm(spark.sql(q).toPandas())
            want = _norm(con.sql(q).df())
            assert got == want, (q, got, want, orders)
    finally:
        con.close()


# --- fourth property: DECIMAL arithmetic surface (num.py's doctrine) -------
# The engine's numeric-determinism rules (e02_spark/num.py) assert that
# decimal-accumulated aggregates, scale-explicit casts, and ROUND survive
# engine translation exactly. This property fuzzes that claim over random
# cent-valued decimals, including exact .5 rounding ties (both engines
# round decimal ties AWAY FROM ZERO — Spark HALF_UP, DuckDB's decimal
# round) and negative amounts. Deliberately EXCLUDED divergences:
# CAST(decimal AS BIGINT) (Spark truncates toward zero, DuckDB rounds) —
# the repo's queries use FLOOR/CEIL instead, which agree and are fuzzed
# here; AVG(decimal) (engine-specific internal result scales) — the
# repo's queries compute decimal SUM / COUNT explicitly.

_DEC_QUERIES = [
    # exact decimal accumulation + exact double cast
    """
    SELECT status, CAST(SUM(amt) AS DOUBLE) AS total,
           CAST(MIN(amt) AS DOUBLE) AS lo, CAST(MAX(amt) AS DOUBLE) AS hi,
           COUNT(amt) AS n
    FROM t_dec GROUP BY status
    """,
    # scale-growing multiplication pinned back to an explicit scale
    """
    SELECT d_id, CAST(CAST(amt * 3 AS DECIMAL(30,4)) AS DOUBLE) AS tripled,
           CAST(ROUND(amt * amt, 2) AS DOUBLE) AS sq2
    FROM t_dec
    """,
    # tie rounding at reduced scale (exact .x5 inputs generated below)
    """
    SELECT d_id, CAST(ROUND(amt, 1) AS DOUBLE) AS r1,
           CAST(ROUND(amt, 0) AS DOUBLE) AS r0
    FROM t_dec
    """,
    # integral bracketing: FLOOR/CEIL agree across engines (CAST-to-int
    # does not — see header)
    """
    SELECT d_id, CAST(FLOOR(amt) AS BIGINT) AS fl,
           CAST(CEIL(amt) AS BIGINT) AS ce
    FROM t_dec
    """,
    # decimal comparisons / ordering / conditional sums
    """
    SELECT COALESCE(SUM(CASE WHEN amt >= 0.5 THEN amt END), 0.0) IS NOT NULL AS has_hi,
           COUNT(*) FILTER (WHERE amt < 0) AS n_neg,
           CAST(COALESCE(SUM(CASE WHEN amt < 0 THEN amt END), 0) AS DOUBLE) AS neg_total
    FROM t_dec
    """,
]


@st.composite
def _decimals(draw):
    n = draw(st.integers(min_value=0, max_value=20))
    # cents in [-10000, 10000]; multiples of 5 are frequent so ROUND ties
    # (x.x5, x.5) actually occur
    rows = []
    for i in range(n):
        cents = draw(st.integers(min_value=-2000, max_value=2000)) * draw(
            st.sampled_from([1, 5, 5, 25])
        )
        rows.append((i + 1, cents, draw(st.sampled_from(["A", "B", None]))))
    return rows


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(rows=_decimals())
def test_spark_duckdb_decimal_differential(spark, rows):
    from decimal import Decimal

    dec_rows = [
        (i, Decimal(c) / Decimal(100), s) for i, c, s in rows
    ]
    spark.createDataFrame(
        dec_rows, schema="d_id BIGINT, amt DECIMAL(18,2), status STRING"
    ).createOrReplaceTempView("t_dec")
    con = duckdb.connect()
    con.execute("CREATE TABLE t_dec (d_id BIGINT, amt DECIMAL(18,2), status VARCHAR)")
    if dec_rows:
        con.executemany("INSERT INTO t_dec VALUES (?, ?, ?)", dec_rows)
    try:
        for q in _DEC_QUERIES:
            got = _norm(spark.sql(q).toPandas())
            want = _norm(con.sql(q).df())
            assert got == want, (q, got, want, rows)
    finally:
        con.close()


# --- fifth property: RANDOM QUERY SHAPES (join-tree fuzz) ------------------
# The fixed texts above pin known traps; this generator explores the
# shape space itself: random join type x join-condition augmentation x
# WHERE predicate x grouping keys x aggregate, over the same adversarial
# random relations (NULL keys, dangling keys, duplicates, empties). Every
# generated text is ANSI intersection by construction.


@st.composite
def _join_query(draw):
    jt = draw(st.sampled_from(["INNER", "LEFT", "RIGHT", "FULL"]))
    extra_on = draw(st.sampled_from(
        ["", " AND l.qty > 2", " AND o.amount < 50", " AND l.tag = 'x'"]
    ))
    where = draw(st.sampled_from(
        ["", "WHERE o.cust IS NULL OR o.amount > 10",
         "WHERE l.qty IS NULL OR l.qty < 7",
         "WHERE COALESCE(o.status, 'Z') <> 'A'"]
    ))
    keys = draw(st.sampled_from(
        [["o.status"], ["o.cust"], ["l.tag"], ["o.status", "l.tag"],
         ["o.cust", "l.qty"]]
    ))
    agg = draw(st.sampled_from(
        ["COALESCE(SUM(o.amount), 0)", "COUNT(l.l_id)", "COUNT(*)",
         "COALESCE(MIN(l.qty), -1)", "COALESCE(MAX(o.amount), -1)"]
    ))
    key_list = ", ".join(f"{k} AS k{i}" for i, k in enumerate(keys))
    group_list = ", ".join(keys)
    return (
        f"SELECT {key_list}, CAST({agg} AS BIGINT) AS m "
        f"FROM t_orders o {jt} JOIN t_lines l ON l.o_id = o.o_id{extra_on} "
        f"{where} GROUP BY {group_list}"
    )


@st.composite
def _exists_query(draw):
    neg = draw(st.sampled_from(["EXISTS", "NOT EXISTS"]))
    corr = draw(st.sampled_from(
        ["l.o_id = o.o_id", "l.o_id = o.o_id AND l.qty > o.amount",
         "l.qty = o.cust"]
    ))
    proj = draw(st.sampled_from(["o.o_id", "o.o_id, o.status"]))
    return (
        f"SELECT {proj} FROM t_orders o "
        f"WHERE {neg} (SELECT 1 FROM t_lines l WHERE {corr})"
    )


@settings(
    max_examples=14,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(tables=_tables(), jq=_join_query(), eq=_exists_query())
def test_spark_duckdb_join_shape_differential(spark, tables, jq, eq):
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
    con.register("t_orders", o_pdf.astype(
        {"o_id": "Int64", "cust": "Int64", "amount": "Int64"}))
    con.register("t_lines", l_pdf.astype(
        {"l_id": "Int64", "o_id": "Int64", "qty": "Int64"}))
    try:
        for q in (jq, eq):
            got = _norm(spark.sql(q).toPandas())
            want = _norm(con.sql(q).df())
            assert got == want, (q, got, want, orders, lines)
    finally:
        con.close()
