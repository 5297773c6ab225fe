"""Multimodal binary-column plumbing (SURVEY.md §2.E E9).

Images/audio/video are opaque BINARY columns with typed metadata, the shape
a 100 TB training-data pipeline stores them in (parquet binary + metadata
struct, or binaryFile datasets). The Spark-side plumbing — schema, Arrow
batch shape, mapInPandas signatures, partition sizing — is real and tested;
the actual image codec decode/resize runs through Pillow when it is
installed (real_decode=True) and raises NotImplementedError only when the
library is genuinely absent; audio decode is REAL for WAV containers
(stdlib `wave` — sample-accurate chunking, always executable); video
demux stays stubbed (no PyAV/ffmpeg). A deterministic fake path used by
tests and queries always exercises the same plumbing.

Scale: decode/feature-extract runs as mapInPandas over Arrow batches —
one Python worker per partition, vectorized transfer, no per-row pickling.
Payload bytes never shuffle unless a downstream op needs them (metadata
projections prune the binary column at the parquet scan).
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Optional codec libraries: the real_decode paths activate per-library.
# Pillow covers the image codecs; video demux would need PyAV/ffmpeg.
# When a library is absent the corresponding real path raises
# NotImplementedError; the deterministic fake path (the oracle path) is
# always available and exercises identical Spark plumbing.
try:  # pragma: no cover - environment-dependent
    from PIL import Image as _PILImage

    HAS_PIL = True
except ImportError:  # pragma: no cover
    _PILImage = None
    HAS_PIL = False

try:  # pragma: no cover - environment-dependent
    import av as _av  # noqa: F401

    HAS_AV = True
except ImportError:  # pragma: no cover
    _av = None
    HAS_AV = False

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

    real_decode=True is the production path: image rows are decoded with
    Pillow when it is installed (feat_mean/feat_max become PIXEL
    statistics over the grayscale-converted image); audio/video rows —
    and image rows when Pillow is absent — raise NotImplementedError
    (those codec libraries are not importable). The default fake path
    extracts deterministic byte-statistics features through the SAME
    mapInPandas plumbing, so schema/batching/partitioning are fully
    exercised either way.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def pixel_stats(b: bytes) -> tuple[float, int]:
            arr = np.asarray(_PILImage.open(io.BytesIO(b)).convert("L"))
            return float(arr.mean()), int(arr.max())

        for pdf in it:
            payloads = pdf["payload"]
            if real_decode:
                if (pdf["kind"] != "image").any():
                    raise NotImplementedError(
                        "audio/video codec decode requires libraries not "
                        "present in this environment; filter kind='image' "
                        "or use the deterministic fake path"
                    )
                if not HAS_PIL:
                    raise NotImplementedError(
                        "image codec decode requires Pillow, which is not "
                        "installed; use the deterministic fake path"
                    )
                stats = payloads.map(pixel_stats)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "kind": pdf["kind"],
                        "n_bytes": payloads.map(len).astype("int64"),
                        "feat_mean": stats.map(lambda s: s[0]),
                        "feat_max": stats.map(lambda s: s[1]).astype("int64"),
                    }
                )
                continue
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
    (real_decode=True) decodes → resamples → re-encodes as PNG via Pillow
    when installed, raising NotImplementedError when it is genuinely
    absent; the fake path stride-samples the payload bytes down to a
    deterministic target_w*target_h/64-byte thumbnail so the batch shape,
    binary round-trip, and metadata rewrite are fully exercised.
    Non-image rows pass through untouched (kind-gated inside the batch,
    exactly as a real codec dispatcher would)."""

    out_len = max(1, (target_w * target_h) // 64)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def resample(b: bytes) -> bytes:
            img = _PILImage.open(io.BytesIO(b)).resize((target_w, target_h))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()

        for pdf in it:
            if real_decode:
                if not HAS_PIL:
                    raise NotImplementedError(
                        "image resample requires Pillow, which is not "
                        "installed; use the deterministic fake path"
                    )
                is_img = pdf["kind"] == "image"
                pdf = pdf.copy()
                pdf.loc[is_img, "payload"] = pdf.loc[is_img, "payload"].map(resample)
                pdf.loc[is_img, "width"] = target_w
                pdf.loc[is_img, "height"] = target_h
                yield pdf[["media_id", "kind", "width", "height", "payload"]]
                continue

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
    container with PyAV and decode every every_n-th frame — it raises
    only because PyAV/ffmpeg is genuinely absent here; the fake path
    treats the payload as fixed-size frame_size-byte frames and keeps
    every every_n-th, preserving the index arithmetic (frame_idx is the
    SOURCE frame number, not the output row number)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode and not HAS_AV:
                raise NotImplementedError(
                    "video demux/decode requires PyAV/ffmpeg, which is not "
                    "installed; use the deterministic fake path"
                )
            if real_decode:  # pragma: no cover - PyAV absent in this env
                raise NotImplementedError(
                    "PyAV demux path not implemented yet; the fake path "
                    "preserves the frame-index arithmetic contract"
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


CHUNKS_SCHEMA = (
    "media_id BIGINT, chunk_idx BIGINT, start_ms BIGINT, end_ms BIGINT,"
    " chunk_bytes BINARY, n_chunk_bytes BIGINT"
)


def chunk_audio(
    media: DataFrame,
    chunk_ms: int = 1000,
    bytes_per_ms: int = 2,
    real_decode: bool = False,
) -> DataFrame:
    """Arrow-batched audio chunking — the audio analog of sample_frames:
    one audio row in, one row per fixed-duration chunk out (the shape an
    ASR/feature pipeline feeds its encoder).

    real_decode=True is a REAL container decode (round 8): payloads are
    parsed as WAV with the stdlib `wave` module — sample rate, channel
    count, and sample width come from the header, and the PCM stream is
    sliced at SAMPLE-ACCURATE chunk boundaries: chunk i covers source
    frames [i*chunk_ms*rate//1000, (i+1)*chunk_ms*rate//1000) — per-chunk
    integer arithmetic, so a non-divisible rate*chunk_ms accumulates no
    drift — and end_ms is derived back from the END FRAME position
    (end_frame*1000//rate), not from byte length. chunk_bytes is the raw
    PCM for those frames (byte-exact: frame = nchannels*sampwidth bytes),
    a short final chunk is kept, and bytes_per_ms is ignored (the header
    is authoritative). A payload that is not a RIFF/WAV container raises
    wave.Error loudly — compressed containers (mp3/ogg/flac) would need
    soundfile/ffmpeg and are out of scope in this environment.

    The deterministic fake path (default) treats the payload as
    bytes_per_ms bytes per millisecond of audio and slices it with the
    SAME timestamp arithmetic (start_ms/end_ms are the chunk's position
    in the source timeline).

    Scale: mapInPandas over BINARY payloads — vectorized 1->N explosion
    per Arrow batch, no per-row Python UDF; chunk rows shuffle nowhere
    until the caller aggregates them. The real path decodes each payload
    ONCE per row and slices frames by offset (no per-chunk re-decode).
    """

    def _wav_chunks(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import wave

        for pdf in it:
            auds = pdf[pdf["kind"] == "audio"]
            out: dict[str, list] = {
                "media_id": [], "chunk_idx": [], "start_ms": [],
                "end_ms": [], "chunk_bytes": [], "n_chunk_bytes": [],
            }
            for mid, payload in zip(auds["media_id"], auds["payload"]):
                with wave.open(io.BytesIO(bytes(payload))) as w:
                    rate = w.getframerate()
                    fw = w.getnchannels() * w.getsampwidth()
                    n_frames = w.getnframes()
                    pcm = w.readframes(n_frames)
                i = 0
                while True:
                    start_f = i * chunk_ms * rate // 1000
                    if start_f >= n_frames:
                        break
                    end_f = min((i + 1) * chunk_ms * rate // 1000, n_frames)
                    if end_f == start_f:  # sub-frame chunk_ms at a low
                        i += 1            # rate: no frame lands here
                        continue
                    chunk = pcm[start_f * fw : end_f * fw]
                    out["media_id"].append(mid)
                    out["chunk_idx"].append(i)
                    out["start_ms"].append(i * chunk_ms)
                    out["end_ms"].append(end_f * 1000 // rate)
                    out["chunk_bytes"].append(chunk)
                    out["n_chunk_bytes"].append(len(chunk))
                    i += 1
            yield pd.DataFrame(out)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunk_bytes_len = chunk_ms * bytes_per_ms
        for pdf in it:
            import numpy as np

            auds = pdf[pdf["kind"] == "audio"]
            payloads = auds["payload"].map(lambda b: b or b"")
            sizes = payloads.map(len).to_numpy(dtype=np.int64)
            n_chunks = -(-sizes // chunk_bytes_len)  # ceil; empty -> 0
            total = int(n_chunks.sum())
            row_pos = np.repeat(np.arange(len(auds), dtype=np.int64), n_chunks)
            group_start = np.repeat(np.cumsum(n_chunks) - n_chunks, n_chunks)
            chunk_idx = np.arange(total, dtype=np.int64) - group_start
            pay = payloads.to_numpy(dtype=object)
            chunks = [
                pay[r][i * chunk_bytes_len : (i + 1) * chunk_bytes_len]
                for r, i in zip(row_pos, chunk_idx)
            ]
            yield pd.DataFrame(
                {
                    "media_id": auds["media_id"].to_numpy()[row_pos],
                    "chunk_idx": chunk_idx,
                    "start_ms": chunk_idx * chunk_ms,
                    "end_ms": [
                        int(i * chunk_ms + len(c) // bytes_per_ms)
                        for i, c in zip(chunk_idx, chunks)
                    ],
                    "chunk_bytes": chunks,
                    "n_chunk_bytes": [len(c) for c in chunks],
                }
            )

    return media.mapInPandas(
        _wav_chunks if real_decode else batches, schema=CHUNKS_SCHEMA
    )
