"""Kimball SQL-mart declared queries (q02-q04; SURVEY.md §2.C).

Spark side: real SQL UDFs deployed into a `kimball` database (CREATE OR
REPLACE FUNCTION, C1-C3) and queried through spark.sql — exercising the
actual UDF machinery, not inlined expressions. Oracle side: the same body
templates textually inlined over the identical VALUES fixture (DuckDB has
no compatible UDF DDL), which is semantically equivalent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import fixtures
from ..kimball.mart import (
    deploy,
    deploy_views,
    utm_campaign_to_product_sql,
    utm_to_financial_channel_sql,
)


def _setup(spark: SparkSession) -> None:
    deploy(spark)
    fixtures.spark_df(spark, "utm_rows").createOrReplaceTempView("utm_rows")


_PRODUCT = utm_campaign_to_product_sql("utm_campaign")


# --------------------------------------------------------------------------
# q02 — CASE mapping over UDF-of-UDF results (C2, C4, C5) — the hot-view
# projection with Cyrillic literals.
# --------------------------------------------------------------------------
def q02_case_channel_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    _setup(spark)
    deploy_views(spark)
    return spark.sql(
        "SELECT utm_campaign, product, segment"
        " FROM v_marketing_paid_traffic_report_hot_view"
    )


_Q02_SQL = f"""
WITH {{utm_rows}}
SELECT utm_campaign,
  {_PRODUCT} AS product,
  CASE WHEN {_PRODUCT} = 'Страхование имущества' THEN 'ИФЛ'
       WHEN {_PRODUCT} = 'Микрокредиты' THEN 'МФО'
       ELSE 'Прочее' END AS segment
FROM utm_rows
"""


# --------------------------------------------------------------------------
# q03 — TRY_CAST to NUMBER(38,0) (C7) feeding the 7-arg UDF with NULL
# literal args (C3) — mirrors DIM_MFO_FD_WEB_CHANNEL.sql.
# --------------------------------------------------------------------------
def q03_try_cast_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    _setup(spark)
    return spark.sql(
        """SELECT utm_source, utm_content,
             CAST(TRY_CAST(utm_content AS DECIMAL(38,0)) AS BIGINT) AS content_num,
             kimball.utm_to_financial_channel(
               utm_source, utm_medium, utm_campaign,
               TRY_CAST(utm_content AS DECIMAL(38,0)),
               NULL, NULL, 'Микрокредиты') AS channel
           FROM utm_rows"""
    )


_CHANNEL = utm_to_financial_channel_sql(
    "utm_source",
    "utm_medium",
    "utm_campaign",
    "TRY_CAST(utm_content AS DECIMAL(38,0))",
    "NULL",
    "NULL",
    "'Микрокредиты'",
)

_Q03_SQL = f"""
WITH {{utm_rows}}
SELECT utm_source, utm_content,
  CAST(TRY_CAST(utm_content AS DECIMAL(38,0)) AS BIGINT) AS content_num,
  {_CHANNEL} AS channel
FROM utm_rows
"""


# --------------------------------------------------------------------------
# q04 — equality filter on UDF result with a non-ASCII literal (C6) —
# mirrors CPA-WEB-COSTS.sql.
# --------------------------------------------------------------------------
def q04_filter_nonascii_literal(spark: SparkSession, sf_dir: str) -> DataFrame:
    _setup(spark)
    return spark.sql(
        """SELECT utm_campaign, utm_source
           FROM utm_rows
           WHERE kimball.utm_campaign_to_product(utm_campaign) = 'Микрокредиты'"""
    )


_Q04_SQL = f"""
WITH {{utm_rows}}
SELECT utm_campaign, utm_source
FROM utm_rows
WHERE {_PRODUCT} = 'Микрокредиты'
"""


def _render(sql: str) -> str:
    return sql.format(utm_rows=fixtures.sql_values_cte("utm_rows"))


QUERIES = {
    "q02_case_channel_mapping": q02_case_channel_mapping,
    "q03_try_cast_decimal": q03_try_cast_decimal,
    "q04_filter_nonascii_literal": q04_filter_nonascii_literal,
}

ORACLE = {
    "q02_case_channel_mapping": _render(_Q02_SQL),
    "q03_try_cast_decimal": _render(_Q03_SQL),
    "q04_filter_nonascii_literal": _render(_Q04_SQL),
}
