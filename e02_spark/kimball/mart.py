"""SQL-mart deploy layer.

Reference surface (/root/reference/deployer/patch/DWH/kimball/*.sql +
superset datasets): scalar SQL UDFs (C1), UDF composing UDF (C2), 7-arg
UDF with NULL literal args (C3), CASE mapping with Cyrillic literals (C4),
projection/filter over UDF results (C5/C6), TRY_CAST to NUMBER(38,0) (C7),
views (C8), ${kimball}-style env templating (C9), versioned filename
ordering (C10).

The reference files are truncated demo stubs (r_3.000140_...sql:1-2 shows
only the signature + the inner call), so the complete function semantics
here are this engine's own — defined ONCE as SQL body templates and used
both for the Spark `CREATE FUNCTION` DDL and, textually inlined, for the
DuckDB oracle twins. That guarantees cross-engine semantic identity.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# --- function body templates (placeholders are argument expressions) -------

UTM_TO_FINANCIAL_CHANNEL_BODY = """CASE
  WHEN lower(coalesce({medium}, '')) IN ('cpc', 'ppc', 'paid')
    THEN coalesce({product}, 'Платный трафик')
  WHEN lower(coalesce({src}, '')) IN ('organic', 'seo')
    THEN 'Органический трафик'
  WHEN {content_num} IS NOT NULL THEN coalesce({product}, 'Прочее')
  WHEN {campaign} IS NOT NULL THEN (CASE
      WHEN lower({campaign}) LIKE '%mfo%' OR lower({campaign}) LIKE '%micro%'
        THEN 'Микрокредиты'
      WHEN lower({campaign}) LIKE '%strah%' OR lower({campaign}) LIKE '%insur%'
        THEN 'Страхование имущества'
      ELSE coalesce({arg5}, {arg6}, {product}, 'Прочее') END)
  ELSE coalesce({arg5}, {arg6}, {product}, 'Прочее')
END"""


def utm_to_financial_channel_sql(
    src: str, medium: str, campaign: str, content_num: str, arg5: str, arg6: str, product: str
) -> str:
    """Inline expansion of the UDF body over the given argument SQL
    expressions (used verbatim in both Spark SQL and DuckDB oracles)."""
    return UTM_TO_FINANCIAL_CHANNEL_BODY.format(
        src=src, medium=medium, campaign=campaign, content_num=content_num,
        arg5=arg5, arg6=arg6, product=product,
    )


def utm_campaign_to_product_sql(campaign: str) -> str:
    """utm_campaign_to_product(c) == utm_to_financial_channel(NULL, NULL, c,
    NULL, NULL, NULL, NULL) — UDF-over-UDF composition (C2), reference
    r_3.000140_f_utm_campaign_to_product.sql:2."""
    return utm_to_financial_channel_sql(
        "NULL", "NULL", campaign, "CAST(NULL AS DECIMAL(38,0))", "NULL", "NULL", "NULL"
    )


# --- versioned patch files (C10: applied in lexicographic filename order) ---
# ${kimball} / ${KIMBALL} placeholders are substituted at deploy time (C9).

PATCH_FILES: list[tuple[str, str]] = [
    (
        "r_2.000001_f_utm_to_financial_channel.sql",
        # pre-declared at an earlier version so the composing UDF (r_3...)
        # resolves at creation time; the reference's own deploy relies on the
        # external deployer tolerating forward refs
        "CREATE OR REPLACE FUNCTION ${kimball}.utm_to_financial_channel(\n"
        "  src STRING, medium STRING, campaign STRING, content_num DECIMAL(38,0),\n"
        "  arg5 STRING, arg6 STRING, product STRING) RETURNS STRING RETURN "
        + utm_to_financial_channel_sql(
            "src", "medium", "campaign", "content_num", "arg5", "arg6", "product"
        ),
    ),
    (
        "r_3.000140_f_utm_campaign_to_product.sql",
        "CREATE OR REPLACE FUNCTION ${kimball}.utm_campaign_to_product(campaign STRING)\n"
        "RETURNS STRING RETURN ${kimball}.utm_to_financial_channel("
        "NULL, NULL, campaign, CAST(NULL AS DECIMAL(38,0)), NULL, NULL, NULL)",
    ),
]


_DEPLOYED: set[str] = set()


def deploy(spark: SparkSession, database: str = "kimball") -> None:
    """Apply the patch files in version order with ${} substitution.
    Idempotent (CREATE OR REPLACE) and cached per session so repeated
    query invocations skip the DDL round-trips."""
    key = f"{spark.sparkContext.applicationId}:{database}"
    if key in _DEPLOYED:
        return
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for _name, template in sorted(PATCH_FILES, key=lambda t: t[0]):
        sql = template.replace("${kimball}", database).replace("${KIMBALL}", database)
        spark.sql(sql)
    _DEPLOYED.add(key)


def deploy_views(spark: SparkSession, database: str = "kimball") -> None:
    """C8: the hot view over UDF results
    (r_4.001.045_v_marketing_paid_traffic_report_hot_view.sql). Requires a
    `utm_rows` temp view to exist."""
    spark.sql(
        f"""CREATE OR REPLACE TEMPORARY VIEW v_marketing_paid_traffic_report_hot_view AS
        SELECT utm_campaign,
               {database}.utm_campaign_to_product(utm_campaign) AS product,
               CASE WHEN {database}.utm_campaign_to_product(utm_campaign)
                         = 'Страхование имущества' THEN 'ИФЛ'
                    WHEN {database}.utm_campaign_to_product(utm_campaign)
                         = 'Микрокредиты' THEN 'МФО'
                    ELSE 'Прочее' END AS segment
        FROM utm_rows"""
    )
