"""Coverage-extension declared queries (SURVEY.md §2.D rows not yet
exercised by relational.py): subqueries (D27), CTE + UNPIVOT (D28/D29),
math/rank/null-ordering functions (D14/D17/D22), pandas UDF (D31),
generator/UDTF-style explode (D32), map + from_json functions (D24/D25),
TF-IDF (E7), full outer join (D5).

Determinism notes: transcendental functions (ln) are NOT bit-identical
across libm implementations — every ln here is round(...,6)ed, which was
measured to agree 400/400 across engines (raw doubles disagreed 378/400).
sqrt IS IEEE-correctly-rounded everywhere, so it stays raw.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..io import load_table, register_views


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q43 — subqueries: uncorrelated scalar, IN, correlated EXISTS (D27).
# Catalyst decorrelates the EXISTS into a left-semi join.
# --------------------------------------------------------------------------
_Q43_BODY = """
SELECT c_mktsegment, COUNT(*) AS n_customers,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                          / COUNT(*) FROM customer)
  AND c_nationkey IN (SELECT n_nationkey FROM nation WHERE n_regionkey >= 0)
  AND EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY c_mktsegment
"""


def q43_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q43_BODY)


# --------------------------------------------------------------------------
# q44 — CTE chain + UNPIVOT (pivot inverse); NULL cells dropped on both
# sides (Spark UNPIVOT default EXCLUDE NULLS mirrored by the oracle's
# WHERE revenue IS NOT NULL).
# --------------------------------------------------------------------------
_Q44_SPARK = """
WITH seg AS (
  SELECT c_mktsegment, o_orderstatus, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
),
agg AS (
  SELECT c_mktsegment,
    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_open,
    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_finished,
    CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_pending
  FROM seg GROUP BY c_mktsegment
)
SELECT c_mktsegment, status, revenue
FROM agg UNPIVOT (revenue FOR status IN (rev_open AS `O`, rev_finished AS `F`, rev_pending AS `P`))
"""

_Q44_SQL = """
WITH seg AS (
  SELECT c_mktsegment, o_orderstatus, o_totalprice
  FROM orders JOIN customer ON o_custkey = c_custkey
),
agg AS (
  SELECT c_mktsegment,
    CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_open,
    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_finished,
    CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS rev_pending
  FROM seg GROUP BY c_mktsegment
),
unp AS (
  SELECT c_mktsegment, 'O' AS status, rev_open AS revenue FROM agg
  UNION ALL SELECT c_mktsegment, 'F', rev_finished FROM agg
  UNION ALL SELECT c_mktsegment, 'P', rev_pending FROM agg
)
SELECT * FROM unp WHERE revenue IS NOT NULL
"""


def q44_cte_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q44_SPARK)


# --------------------------------------------------------------------------
# q45 — math functions + dense_rank/ntile + nulls-last ordering.
# --------------------------------------------------------------------------
_Q45_BODY = """
SELECT p_partkey,
  sqrt(p_retailprice) AS sqrt_price,
  round(ln(p_retailprice), 6) AS ln_price,
  CAST(abs(p_size - 25) AS BIGINT) AS size_dist,
  CAST(ceil(p_retailprice / 100.0) AS BIGINT) AS price_bucket,
  CAST(floor(p_retailprice / 100.0) AS BIGINT) AS price_floor,
  CAST(greatest(p_size, 10) AS BIGINT) AS size_hi,
  CAST(least(p_size, 40) AS BIGINT) AS size_lo,
  CAST(dense_rank() OVER (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS price_rank,
  CAST(ntile(4) OVER (PARTITION BY p_type ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS quartile,
  CAST(row_number() OVER (PARTITION BY p_type
       ORDER BY nullif(p_size, 25) ASC NULLS LAST, p_partkey) AS BIGINT) AS nn_rank
FROM part
"""


def q45_math_rank_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q45_BODY)


# --------------------------------------------------------------------------
# q46 — vectorized pandas UDF (D31, Arrow batches): per-row net price.
# The UDF does plain float64 arithmetic, so the oracle's DOUBLE expression
# is bit-identical.
# --------------------------------------------------------------------------
def _net_price_udf():
    # created lazily: the decorator parses the DDL return type, which
    # needs an active SparkContext (breaks plain module import otherwise)
    @pandas_udf("double")
    def _net_price(price: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1.0 - discount) * (1.0 + tax)

    return _net_price


def q46_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    _net_price = _net_price_udf()
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            _net_price("l_extendedprice", "l_discount", "l_tax").alias("net_price"),
        )
    )


_Q46_SQL = """
SELECT l_orderkey, l_linenumber,
  l_extendedprice * (CAST(1.0 AS DOUBLE) - l_discount)
                  * (CAST(1.0 AS DOUBLE) + l_tax) AS net_price
FROM lineitem WHERE l_orderkey < 100
"""


# --------------------------------------------------------------------------
# q89 — pandas GROUPED_AGG UDAF (the D31 surface q46's scalar UDF doesn't
# cover): a vectorized aggregate receiving the whole group as a Series.
# Deterministic despite Spark feeding partition-ordered Series because the
# arithmetic is exact: DECIMAL(18,2) inputs arrive as Python Decimals,
# cents are integers, and integer addition is order-independent.
# --------------------------------------------------------------------------
def q89_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def revenue_cents(price: pd.Series) -> int:
        from decimal import Decimal

        total = Decimal(0)
        for v in price:
            total += v
        return int(total * 100)

    l = _t(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .agg(
            revenue_cents(
                F.col("l_extendedprice").cast("decimal(18,2)")
            ).alias("revenue_cents")
        )
    )


_Q89_SQL = """
SELECT l_returnflag,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)
    AS revenue_cents
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# q91 — cogrouped applyInPandas (the last D31 shape): per-user as-of join
# of clicks to the latest view at-or-before each click, via
# groupBy.cogroup(...).applyInPandas with pd.merge_asof per group. Ties
# pinned: among equal view timestamps the max view_id wins (merge_asof
# takes the last row among equal keys; the secondary sort makes that the
# max view_id — the oracle mirrors it with MAX(view_id) at MAX(v_us)).
# Scale: cogroup shuffles both sides once on user_id; per-group work is
# the two-pointer merge, O(n log n) in the group.
# --------------------------------------------------------------------------
def q91_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    # user_id % 10 = 0: a deterministic 10% cohort — the cogroup API is
    # exercised identically, but the per-group Python invocation overhead
    # (the dominant cost at test scale, where groups are tiny) drops 10x.
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") % 10 == 0)
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("c_us"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.unix_micros("ts").alias("v_us"),
    )

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "click_id", "view_id", "gap_us"]
        if left.empty or right.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        l2 = left.sort_values(["c_us", "click_id"])
        r2 = right.sort_values(["v_us", "view_id"])
        m = pd.merge_asof(
            l2, r2.drop(columns=["user_id"]),
            left_on="c_us", right_on="v_us", direction="backward",
        )
        m = m.dropna(subset=["view_id"])
        return pd.DataFrame(
            {
                "user_id": m["user_id"].astype("int64"),
                "click_id": m["click_id"].astype("int64"),
                "view_id": m["view_id"].astype("int64"),
                "gap_us": (m["c_us"] - m["v_us"]).astype("int64"),
            }
        )

    return (
        clicks.groupBy("user_id")
        .cogroup(views.groupBy("user_id"))
        .applyInPandas(
            asof,
            schema="user_id bigint, click_id bigint, view_id bigint, gap_us bigint",
        )
    )


_Q91_SQL = """
WITH v AS (
  SELECT user_id, event_id AS view_id, epoch_us(ts) AS v_us
  FROM events WHERE event_type = 'view' AND user_id % 10 = 0
),
c AS (
  SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
  FROM events WHERE event_type = 'click' AND user_id % 10 = 0
),
best AS (
  SELECT c.user_id, c.click_id, c.c_us,
    (SELECT MAX(v_us) FROM v
     WHERE v.user_id = c.user_id AND v.v_us <= c.c_us) AS v_us
  FROM c
)
SELECT b.user_id, b.click_id,
  (SELECT MAX(view_id) FROM v
   WHERE v.user_id = b.user_id AND v.v_us = b.v_us) AS view_id,
  CAST(b.c_us - b.v_us AS BIGINT) AS gap_us
FROM best b WHERE b.v_us IS NOT NULL
"""


# --------------------------------------------------------------------------
# q47 — generator / UDTF-style table function (D32): each order explodes
# into the 3 month-buckets it is "active" in.
# --------------------------------------------------------------------------
def q47_month_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    months = F.expr(
        "sequence(date_trunc('month', o_orderdate),"
        " date_trunc('month', o_orderdate) + interval 2 month, interval 1 month)"
    )
    return (
        o.select(F.explode(months).alias("month"))
        .groupBy(F.col("month").cast("date").cast("string").alias("month"))
        .agg(F.count(F.lit(1)).alias("n_active_orders"))
    )


_Q47_SQL = """
SELECT CAST(CAST(m AS DATE) AS VARCHAR) AS month, COUNT(*) AS n_active_orders
FROM (
  SELECT unnest(generate_series(date_trunc('month', o_orderdate),
                                date_trunc('month', o_orderdate) + INTERVAL 2 MONTH,
                                INTERVAL 1 MONTH)) AS m
  FROM orders
)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q48 — from_json into a MAP + map functions (D24/D25).
# --------------------------------------------------------------------------
def q48_json_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        e.select(
            "event_type",
            m.alias("m"),
        )
        .select(
            "event_type",
            F.element_at(F.col("m"), "k").alias("k_val"),
            F.size(F.map_keys(F.col("m"))).cast("bigint").alias("n_keys"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k_val").alias("sum_k"),
            F.max("n_keys").alias("max_keys"),
            F.count(F.lit(1)).alias("n"),
        )
    )


_Q48_SQL = """
SELECT event_type,
  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(MAX(len(json_keys(props))) AS BIGINT) AS max_keys,
  COUNT(*) AS n
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# q49 — TF-IDF top terms (E7): tf exact int, idf = round(ln((N+1)/(df+1)),6).
# --------------------------------------------------------------------------
def q49_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ops.text import tokens

    d = _t(spark, sf_dir, "documents")
    t = tokens(d)
    n_docs = d.count()  # tiny scalar; deterministic
    tf = t.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = t.select("doc_id", "token").distinct().groupBy("token").agg(
        F.count(F.lit(1)).alias("df")
    )
    idf = F.round(
        F.log((F.lit(float(n_docs)) + 1.0) / (F.col("df").cast("double") + 1.0)), 6
    )
    scored = tf.join(F.broadcast(df_), "token").select(
        "doc_id", "token", (F.col("tf") * idf).alias("tfidf")
    )
    return scored.orderBy(
        F.col("tfidf").desc(), F.col("doc_id").asc(), F.col("token").asc()
    ).limit(20)


_Q49_SQL = """
WITH doc_tokens AS (
  SELECT doc_id, unnest(string_split(text, chr(32))) AS token FROM documents
),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM doc_tokens GROUP BY doc_id, token),
df AS (
  SELECT token, COUNT(*) AS df
  FROM (SELECT DISTINCT doc_id, token FROM doc_tokens) GROUP BY token
),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.token,
  tf.tf * round(ln((CAST(n.n_docs AS DOUBLE) + 1.0) / (CAST(df.df AS DOUBLE) + 1.0)), 6) AS tfidf
FROM tf JOIN df USING (token) CROSS JOIN n
ORDER BY tfidf DESC, doc_id ASC, token ASC LIMIT 20
"""


# --------------------------------------------------------------------------
# q50 — full outer join (D5): event users vs customers.
# --------------------------------------------------------------------------
def q50_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    users = e.select(F.col("user_id").alias("uid")).distinct()
    custs = c.select(F.col("c_custkey").alias("ck"))
    j = users.join(custs, users.uid == custs.ck, "full_outer")
    return (
        j.select(
            F.when(F.col("uid").isNull(), "customer_only")
            .when(F.col("ck").isNull(), "events_only")
            .otherwise("both")
            .alias("side")
        )
        .groupBy("side")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_Q50_SQL = """
WITH users AS (SELECT DISTINCT user_id AS uid FROM events),
custs AS (SELECT c_custkey AS ck FROM customer)
SELECT CASE WHEN uid IS NULL THEN 'customer_only'
            WHEN ck IS NULL THEN 'events_only'
            ELSE 'both' END AS side, COUNT(*) AS n
FROM users FULL OUTER JOIN custs ON uid = ck
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q103 — fuzz-promoted FULL OUTER with planted NULL keys + mostly-dangling
# keys on BOTH sides: the deterministic twin of the differential-fuzzing
# shape (tests/test_differential.py, the harness whose first run surfaced
# Spark's empty-input ROLLUP divergence). Sparse co-divisibility (37 vs
# 41) makes almost every row unmatched, planted NULLs exercise the
# NULL-keys-never-match rule, and the row-level output (keys -1-coalesced,
# measures exact integer cents/units) is hash-checked by the driver every
# round instead of only when the hypothesis suite runs.
# Scale: a full outer join shuffles both sides on the key — unavoidable
# and fine; both inputs are pre-filtered at the scan (predicate pushdown).
# --------------------------------------------------------------------------
def q103_fuzz_full_outer_nullkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 37 == 0)
        .select(
            F.when(F.col("o_orderkey") % 5 == 0, F.lit(None).cast("bigint"))
            .otherwise(F.col("o_orderkey"))
            .alias("ok"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").alias("price_c"),
        )
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 41 == 0)
        .select(
            F.when(F.col("l_linenumber") == 3, F.lit(None).cast("bigint"))
            .otherwise(F.col("l_orderkey"))
            .alias("lk"),
            F.col("l_quantity").cast("decimal(18,2)").cast("bigint").alias("qty"),
        )
    )
    j = o.join(li, o.ok == li.lk, "full_outer")
    return j.select(
        F.coalesce(F.col("ok"), F.lit(-1)).alias("ok"),
        F.coalesce(F.col("lk"), F.lit(-1)).alias("lk"),
        F.coalesce(F.col("price_c"), F.lit(-1)).alias("price_c"),
        F.coalesce(F.col("qty"), F.lit(-1)).alias("qty"),
    )


# --------------------------------------------------------------------------
# q104 — approximate percentile SKETCH as a PROPERTY check (the D10-approx
# twin of q32's HLL boolean): Spark's approx_percentile (Greenwald-Khanna
# quantile summaries, mergeable — the distributed-sketch shape a 100 TB
# percentile job actually runs) vs DuckDB's approx_quantile (t-digest).
# The raw sketch outputs can never hash-match across engines, but the
# defining property can: the approx median's RANK within its group sits
# within ±2% of the true 0.5 — ~20x the sketches' worst-case rank error
# (GK at accuracy 10000 guarantees ±0.01%; t-digest's median error is
# ~0.1%), so the boolean cannot flip on a testdata regeneration. Groups
# under 500 rows are vacuously true (q33's small-group rule).
# Scale: one partial-aggregated sketch pass + a broadcast join of the
# 3-row percentile table back for the rank count — two scans, no sort.
# --------------------------------------------------------------------------
def q104_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    ap = o.groupBy("o_orderstatus").agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 10000)").alias("ap50")
    )
    return (
        o.join(F.broadcast(ap), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("o_totalprice") <= F.col("ap50"), 1).otherwise(0)
            ).alias("n_le"),
        )
        .select(
            "o_orderstatus",
            "n_rows",
            (
                (F.col("n_rows") < 500)
                | (
                    F.abs(
                        F.col("n_le").cast("double") / F.col("n_rows") - 0.5
                    )
                    <= 0.02
                )
            ).alias("approx_median_ok"),
        )
    )


_Q104_SQL = """
WITH ap AS (
  SELECT o_orderstatus, approx_quantile(o_totalprice, 0.5) AS ap50
  FROM orders GROUP BY o_orderstatus
)
SELECT o.o_orderstatus, COUNT(*) AS n_rows,
  (COUNT(*) < 500 OR
   ABS(CAST(SUM(CASE WHEN o.o_totalprice <= ap.ap50 THEN 1 ELSE 0 END) AS DOUBLE)
       / COUNT(*) - 0.5) <= 0.02) AS approx_median_ok
FROM orders o JOIN ap ON o.o_orderstatus = ap.o_orderstatus
GROUP BY o.o_orderstatus
"""


_Q103_SQL = """
WITH o AS (
  SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderkey END AS ok,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
  FROM orders WHERE o_orderkey % 37 = 0
), li AS (
  SELECT CASE WHEN l_linenumber = 3 THEN NULL ELSE l_orderkey END AS lk,
         CAST(CAST(l_quantity AS DECIMAL(18,2)) AS BIGINT) AS qty
  FROM lineitem WHERE l_orderkey % 41 = 0
)
SELECT COALESCE(o.ok, -1) AS ok, COALESCE(li.lk, -1) AS lk,
       COALESCE(o.price_c, -1) AS price_c, COALESCE(li.qty, -1) AS qty
FROM o FULL OUTER JOIN li ON o.ok = li.lk
"""


# --------------------------------------------------------------------------
# q115 — fuzz-promoted NOT-IN / IN over NULLABLE keys (the ExistenceJoin
# shape from tests/test_differential.py, now deterministic and
# driver-hash-checked every round instead of only when the hypothesis
# suite runs). Four branches over the same planted-NULL probe/sub pair,
# each a standard-SQL three-valued-logic edge:
#   notin_clean   — NOT IN over a NULL-free subquery: NULL probes drop
#                   (UNKNOWN in WHERE), non-matching non-NULLs survive.
#   notin_nullsub — the notorious trap: ONE NULL in the subquery makes
#                   NOT IN UNKNOWN for every non-matching row, so ZERO
#                   rows survive — but the 0 comes from each engine's
#                   own rewrite (Spark: null-aware anti join), not a
#                   literal.
#   in_sub        — IN with NULL probe values in WHERE context (UNKNOWN
#                   and FALSE both drop; the engines' one agreed-on IN
#                   context — the projection-context divergence is
#                   documented in test_differential.py).
#   notin_empty   — NOT IN (empty set) is TRUE for EVERY probe row,
#                   including NULL probes (zero comparisons happen).
# id_sum makes the hash row-identity-sensitive, not just count-level.
# Both engines run the IDENTICAL ANSI text — the parity claim is that
# their independent subquery rewrites agree, not that the text matches.
# Scale: each branch is one semi/anti join shuffled on the key; the
# planted-NULL CASE keys are scan-level projections (pushdown intact).
# --------------------------------------------------------------------------
_Q115_BODY = """
WITH probe AS (
  SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_custkey END AS k,
         o_orderkey AS id
  FROM orders WHERE o_orderkey % 7 = 0
),
sub AS (
  SELECT CASE WHEN l_linenumber = 3 THEN NULL ELSE l_suppkey END AS k
  FROM lineitem WHERE l_orderkey % 11 = 0
)
SELECT 'notin_clean' AS branch, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(id), 0) AS BIGINT) AS id_sum
FROM probe WHERE k NOT IN (SELECT k FROM sub WHERE k IS NOT NULL)
UNION ALL
SELECT 'notin_nullsub', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(id), 0) AS BIGINT)
FROM probe WHERE k NOT IN (SELECT k FROM sub)
UNION ALL
SELECT 'in_sub', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(id), 0) AS BIGINT)
FROM probe WHERE k IN (SELECT k FROM sub)
UNION ALL
SELECT 'notin_empty', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(id), 0) AS BIGINT)
FROM probe WHERE k NOT IN (SELECT k FROM sub WHERE 1 = 0)
"""


def q115_fuzz_null_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q115_BODY)


_Q115_SQL = _Q115_BODY


# --------------------------------------------------------------------------
# q51 — HAVING (D13) + lead/first_value window analytics (D15): monthly
# revenue kept only above a threshold, with next-month lookahead and the
# year's first month value.
# --------------------------------------------------------------------------
_Q51_BODY = """
WITH monthly AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS mo,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
         COUNT(*) AS n_orders
  FROM orders
  GROUP BY 1, 2
  HAVING COUNT(*) >= 10
)
SELECT yr, mo, revenue, n_orders,
  LEAD(revenue) OVER (PARTITION BY yr ORDER BY mo) AS next_month_revenue,
  FIRST_VALUE(revenue) OVER (PARTITION BY yr ORDER BY mo) AS first_month_revenue
FROM monthly
"""


def q51_having_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q51_BODY)


# --------------------------------------------------------------------------
# q54 — sliding-window aggregation batch twin (E11): 1-hour windows every
# 15 minutes; each event lands in exactly 4 windows. The streaming form is
# streaming/jobs.sliding_quarter_hour; the oracle expands the 4 window
# starts per event explicitly.
# --------------------------------------------------------------------------
def q54_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..num import dsum

    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "total_value"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


_Q54_SQL = """
SELECT CAST(ws AS VARCHAR) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM (
  SELECT event_type, value,
         time_bucket(INTERVAL '15 minutes', ts)
           - to_minutes(CAST(k.k * 15 AS BIGINT)) AS ws
  FROM events, (SELECT unnest(generate_series(0, 3)) AS k) k
)
GROUP BY ws, event_type
"""


# --------------------------------------------------------------------------
# q55 — exact percentiles (continuous interpolation): Spark `percentile`
# and DuckDB `quantile_cont` both use the type-7 (n-1)*p linear
# interpolation on the sorted values, so results are bit-identical.
# --------------------------------------------------------------------------
def q55_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("median_price"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
    )


_Q55_SQL = """
SELECT o_orderstatus,
  quantile_cont(o_totalprice, 0.5) AS median_price,
  quantile_cont(o_totalprice, 0.9) AS p90_price,
  MIN(o_totalprice) AS min_price,
  MAX(o_totalprice) AS max_price
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# q56 — moment statistics (variance/stddev/correlation) computed from
# EXACT decimal power sums: the built-in stddev/corr are single-pass
# co-moment updates whose partial-aggregation order varies run-to-run, so
# they can never hash-match across engines; the textbook power-sum
# formulas over exact sums are bit-deterministic.
# --------------------------------------------------------------------------
def q56_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # floor-quantized integer units (tie-free, like ops/similarity): power
    # sums accumulate as DECIMAL(38,0) — scale 0 means the decimal→double
    # cast is a SINGLE correctly-rounded int→double conversion on both
    # engines even when the sum exceeds 2^53. Units rescale in double.
    l = _t(spark, sf_dir, "lineitem")
    xq = F.expr("cast(floor(cast(l_quantity as double) * 10000d) as decimal(19,0))")
    yq = F.expr("cast(floor(cast(l_extendedprice as double) * 100d) as decimal(19,0))")
    agg = l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xq).cast("double").alias("sx"),
        F.sum(yq).cast("double").alias("sy"),
        F.sum(xq * xq).cast("double").alias("sxx"),
        F.sum(yq * yq).cast("double").alias("syy"),
        F.sum(xq * yq).cast("double").alias("sxy"),
    )
    n = F.col("n").cast("double")
    var_x = (n * F.col("sxx") - F.col("sx") * F.col("sx")) / (n * (n - 1))
    var_y = (n * F.col("syy") - F.col("sy") * F.col("sy")) / (n * (n - 1))
    cov = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (n * (n - 1))
    return agg.select(
        "l_returnflag",
        "n",
        (F.col("sx") / n / F.lit(10000.0)).alias("mean_qty"),
        (F.sqrt(var_x) / F.lit(10000.0)).alias("stddev_qty"),
        (F.sqrt(var_y) / F.lit(100.0)).alias("stddev_price"),
        (cov / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr_qty_price"),
    )


_Q56_SQL = """
WITH q AS (
  SELECT l_returnflag,
    CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 10000) AS DECIMAL(19,0)) AS xq,
    CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100) AS DECIMAL(19,0)) AS yq
  FROM lineitem
), s AS (
  SELECT l_returnflag, COUNT(*) AS n,
    CAST(SUM(xq) AS DOUBLE) AS sx,
    CAST(SUM(yq) AS DOUBLE) AS sy,
    CAST(SUM(xq * xq) AS DOUBLE) AS sxx,
    CAST(SUM(yq * yq) AS DOUBLE) AS syy,
    CAST(SUM(xq * yq) AS DOUBLE) AS sxy
  FROM q GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  sx / CAST(n AS DOUBLE) / 10000.0 AS mean_qty,
  sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) / 10000.0 AS stddev_qty,
  sqrt((CAST(n AS DOUBLE) * syy - sy * sy) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) / 100.0 AS stddev_price,
  ((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
    / (sqrt((CAST(n AS DOUBLE) * sxx - sx * sx) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
       * sqrt((CAST(n AS DOUBLE) * syy - sy * sy) / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))) AS corr_qty_price
FROM s
"""


QUERIES = {
    "q43_subqueries": q43_subqueries,
    "q51_having_lead": q51_having_lead,
    "q54_sliding_window": q54_sliding_window,
    "q55_percentiles": q55_percentiles,
    "q56_moment_stats": q56_moment_stats,
    "q44_cte_unpivot": q44_cte_unpivot,
    "q45_math_rank_funcs": q45_math_rank_funcs,
    "q46_pandas_udf": q46_pandas_udf,
    "q89_pandas_udaf": q89_pandas_udaf,
    "q91_cogroup_asof": q91_cogroup_asof,
    "q47_month_generator": q47_month_generator,
    "q48_json_map_funcs": q48_json_map_funcs,
    "q49_tfidf_top_terms": q49_tfidf_top_terms,
    "q50_full_outer": q50_full_outer,
    "q103_fuzz_full_outer_nullkeys": q103_fuzz_full_outer_nullkeys,
    "q115_fuzz_null_in_subquery": q115_fuzz_null_in_subquery,
    "q104_approx_percentile": q104_approx_percentile,
}

ORACLE = {
    "q43_subqueries": _Q43_BODY,
    "q51_having_lead": _Q51_BODY,
    "q54_sliding_window": _Q54_SQL,
    "q55_percentiles": _Q55_SQL,
    "q56_moment_stats": _Q56_SQL,
    "q44_cte_unpivot": _Q44_SQL,
    "q45_math_rank_funcs": _Q45_BODY,
    "q46_pandas_udf": _Q46_SQL,
    "q89_pandas_udaf": _Q89_SQL,
    "q91_cogroup_asof": _Q91_SQL,
    "q47_month_generator": _Q47_SQL,
    "q48_json_map_funcs": _Q48_SQL,
    "q49_tfidf_top_terms": _Q49_SQL,
    "q50_full_outer": _Q50_SQL,
    "q103_fuzz_full_outer_nullkeys": _Q103_SQL,
    "q115_fuzz_null_in_subquery": _Q115_SQL,
    "q104_approx_percentile": _Q104_SQL,
}
