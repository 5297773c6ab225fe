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


RESIZED_SCHEMA = (
    "media_id BIGINT, kind STRING, width BIGINT, height BIGINT, payload BINARY"
)


def resize_images(
    media: DataFrame, target_w: int, target_h: int, real_decode: bool = False
) -> DataFrame:
    """Arrow-batched image resize: 1 row in → 1 row out with updated
    (width, height) metadata and a re-encoded payload. Production path
    (real_decode=True) would decode → resample → re-encode — STUBBED (no
    codec libs); the fake path stride-samples the payload bytes down to a
    deterministic target_w*target_h/64-byte thumbnail so the batch shape,
    binary round-trip, and metadata rewrite are fully exercised.
    Non-image rows pass through untouched (kind-gated inside the batch,
    exactly as a real codec dispatcher would)."""

    out_len = max(1, (target_w * target_h) // 64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode:
                raise NotImplementedError(
                    "image resample requires codec libraries not present "
                    "in this environment; use the deterministic fake path"
                )

            def shrink(b: bytes) -> bytes:
                if not b:
                    return b
                step = max(1, len(b) // out_len)
                return bytes(b[::step][:out_len])

            is_img = pdf["kind"] == "image"
            pdf = pdf.copy()
            pdf.loc[is_img, "payload"] = pdf.loc[is_img, "payload"].map(shrink)
            pdf.loc[is_img, "width"] = target_w
            pdf.loc[is_img, "height"] = target_h
            yield pdf[["media_id", "kind", "width", "height", "payload"]]

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = (
    "media_id BIGINT, frame_idx BIGINT, frame_bytes BINARY, n_frame_bytes BIGINT"
)


def sample_frames(
    media: DataFrame, every_n: int = 4, frame_size: int = 16,
    real_decode: bool = False,
) -> DataFrame:
    """Arrow-batched video frame sampling: 1 video row in → one row per
    SAMPLED frame out (the exploding shape a real frame extractor has —
    output cardinality is data-dependent, which is why this is mapInPandas
    and not a scalar pandas UDF). Production path would demux the
    container and decode every every_n-th frame — STUBBED; the fake path
    treats the payload as fixed-size frame_size-byte frames and keeps
    every every_n-th, preserving the index arithmetic (frame_idx is the
    SOURCE frame number, not the output row number)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode:
                raise NotImplementedError(
                    "video demux/decode requires codec libraries not "
                    "present in this environment; use the fake path"
                )
            # Vectorized 1->N explosion: per-row sampled-frame counts, then
            # numpy repeat/cumsum builds the (row, frame_idx) pairs — no
            # itertuples. Only the byte slice itself stays per-frame (a
            # real decoder is per-frame there too).
            import numpy as np

            vids = pdf[pdf["kind"] == "video"]
            payloads = vids["payload"].map(lambda b: b or b"")
            n_frames = payloads.map(len).to_numpy(dtype=np.int64) // frame_size
            n_sampled = -(-n_frames // every_n)  # ceil
            total = int(n_sampled.sum())
            row_pos = np.repeat(np.arange(len(vids), dtype=np.int64), n_sampled)
            group_start = np.repeat(np.cumsum(n_sampled) - n_sampled, n_sampled)
            frame_idx = (np.arange(total, dtype=np.int64) - group_start) * every_n
            pay = payloads.to_numpy(dtype=object)
            frame_bytes = [
                pay[r][i * frame_size : (i + 1) * frame_size]
                for r, i in zip(row_pos, frame_idx)
            ]
            yield pd.DataFrame(
                {
                    "media_id": vids["media_id"].to_numpy()[row_pos],
                    "frame_idx": frame_idx,
                    "frame_bytes": frame_bytes,
                    "n_frame_bytes": [len(fr) for fr in frame_bytes],
                }
            )

    return media.mapInPandas(batches, schema=FRAMES_SCHEMA)
