"""Pin all three events.ts parquet encodings (round-2 regression guard).

The driver's testdata generator has shipped events.ts as INT64 nanos, as
TIMESTAMP(MICROS, isAdjustedToUTC=false) (-> Spark TIMESTAMP_NTZ), and could
ship TIMESTAMP(MICROS, adjusted) (-> TIMESTAMP_LTZ). io.normalize_ts must
yield the identical instant for all three so a testdata regeneration can
never silently flip query results again.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from e02_spark.io import normalize_ts

# micros since epoch, including a value whose nanos form exercises flooring
MICROS = [1_700_000_000_000_000, 1_700_000_123_456_789, 0]


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("ts_enc")
    ids = pa.array([1, 2, 3], type=pa.int64())

    nanos_dir = base / "nanos"
    # nanos beyond micro precision: floor-truncate, never round
    nanos = pa.array([m * 1000 + 999 for m in MICROS], type=pa.timestamp("ns"))
    pq.write_table(pa.table({"event_id": ids, "ts": nanos}), nanos_dir.with_suffix(".parquet"))

    ntz_dir = base / "ntz"
    ntz = pa.array(MICROS, type=pa.timestamp("us"))
    pq.write_table(pa.table({"event_id": ids, "ts": ntz}), ntz_dir.with_suffix(".parquet"))

    ltz_dir = base / "ltz"
    ltz = pa.array(MICROS, type=pa.timestamp("us", tz="UTC"))
    pq.write_table(pa.table({"event_id": ids, "ts": ltz}), ltz_dir.with_suffix(".parquet"))

    return {
        "nanos": str(nanos_dir.with_suffix(".parquet")),
        "ntz": str(ntz_dir.with_suffix(".parquet")),
        "ltz": str(ltz_dir.with_suffix(".parquet")),
    }


def _load_micros(spark, path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = normalize_ts(spark.read.parquet(path), ["ts"])
    assert dict(df.dtypes)["ts"] == "timestamp", "normalize_ts must yield LTZ"
    rows = (
        df.select("event_id", F.unix_micros("ts").alias("us"))
        .orderBy("event_id")
        .collect()
    )
    return [r.us for r in rows]


def test_all_three_encodings_agree(spark, encoded_dirs):
    results = {k: _load_micros(spark, p) for k, p in encoded_dirs.items()}
    assert results["ntz"] == MICROS
    assert results["ltz"] == MICROS
    # nanos branch floors (truncates) the +999ns overhang
    assert results["nanos"] == MICROS
    assert results["nanos"] == results["ntz"] == results["ltz"]


def test_live_testdata_loads_as_timestamp(spark):
    """Whatever encoding /root/testdata currently uses, load_table must
    deliver a plain TIMESTAMP column usable by unix_micros."""
    from e02_spark.io import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"
    n = ev.select(F.unix_micros("ts")).limit(1).count()
    assert n == 1


def test_nanos_long_pre_epoch_floors(spark):
    """Negative (pre-1970) nanos must FLOOR to micros, not truncate
    toward zero: -1500 ns -> -2 µs (matching epoch_us flooring)."""
    from pyspark.sql import functions as F

    from e02_spark.io import normalize_ts

    df = spark.createDataFrame([(-1500,), (-1000,), (1500,)], "ts BIGINT")
    out = normalize_ts(df, ["ts"]).select(F.unix_micros("ts").alias("us"))
    assert sorted(r["us"] for r in out.collect()) == [-2, -1, 1]
