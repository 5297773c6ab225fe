"""Driver-table IO.

The ten driver tables (TESTDATA.md) live as one parquet file per table under
/root/testdata/sf{0.001,0.01,0.1}/. At 100 TB each table would be a
partitioned parquet dataset; `spark.read.parquet` takes either shape
unchanged, and every query in this repo goes through here so the swap is a
one-line config change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Small dimensions we always broadcast in joins (KB-scale even at 100 TB
# fact scale — TPC-H region/nation are constant-size).
BROADCAST_DIMS = {"region", "nation"}


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


# events.ts is written as parquet TIMESTAMP(NANOS), which Spark cannot read
# natively (timestamps are micro-precision). We read nanos as LONG and
# floor-convert to microseconds; the DuckDB oracle mirrors the flooring via
# epoch_us(). Truncation, not rounding, on both sides.
_NANO_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for col in _NANO_TS_COLS.get(name, []):
        field = next((f for f in df.schema.fields if f.name == col), None)
        if field is not None and isinstance(field.dataType, LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register each driver table as a temp view (for spark.sql queries)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
