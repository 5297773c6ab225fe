"""Multimodal binary-column plumbing (SURVEY.md §2.E E9).

Images/audio/video are opaque BINARY columns with typed metadata, the shape
a 100 TB training-data pipeline stores them in (parquet binary + metadata
struct, or binaryFile datasets). The Spark-side plumbing — schema, Arrow
batch shape, mapInPandas signatures, partition sizing — is real and tested;
the actual codec decode is stubbed behind NotImplementedError (image/audio
libraries are not in this container) with a deterministic fake path used by
tests and queries.

Scale: decode/feature-extract runs as mapInPandas over Arrow batches —
one Python worker per partition, vectorized transfer, no per-row pickling.
Payload bytes never shuffle unless a downstream op needs them (metadata
projections prune the binary column at the parquet scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "media_id BIGINT, kind STRING, n_bytes BIGINT, feat_mean DOUBLE, feat_max BIGINT"
)


def media_summary(media: DataFrame) -> DataFrame:
    """Metadata + content-identity projection (no decode): byte length,
    base64 digest prefix, aspect ratio. All JVM-side."""
    return media.select(
        "media_id",
        "kind",
        F.length("payload").cast("bigint").alias("n_bytes"),
        F.substring(F.base64("payload"), 1, 24).alias("b64_prefix"),
        F.when(F.col("height") > 0, F.col("width").cast("double") / F.col("height"))
        .otherwise(F.lit(None))
        .alias("aspect"),
    )


def decode_features(media: DataFrame, real_decode: bool = False) -> DataFrame:
    """Arrow-batched decode / feature-extraction over binary payloads.

    real_decode=True is the production path: it would decode image/audio
    codecs — STUBBED here (no codec libs in this container). The default
    fake path extracts deterministic byte-statistics features through the
    SAME mapInPandas plumbing, so schema/batching/partitioning are fully
    exercised.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode:
                raise NotImplementedError(
                    "codec decode requires image/audio libraries not present "
                    "in this environment; use the deterministic fake path"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "feat_mean": payloads.map(
                        lambda b: float(sum(b)) / len(b) if len(b) else 0.0
                    ),
                    "feat_max": payloads.map(lambda b: max(b) if len(b) else 0).astype(
                        "int64"
                    ),
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)
