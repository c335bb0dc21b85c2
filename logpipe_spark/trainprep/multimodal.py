"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The container has no image/audio codecs, so the actual decode is stubbed:
:func:`decode_image_stub` raises ``NotImplementedError`` exactly where
PIL/ffmpeg would plug in, and :func:`fake_decode_meta` is the deterministic
stand-in (header-byte parse) used by tests and the oracle. Everything
Spark-side — binary schema, Arrow batch shapes, ``mapInPandas`` signature,
partition-preserving narrow execution — is real and exercised.

At 100 TB the binary payloads dominate I/O: the plumbing keeps them in one
columnar scan (no shuffle before decode), pushes the metadata projection
into the scan, and the decode UDF streams record batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds executor memory
per batch — size it to payload_size × batch ≤ heap headroom).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType)

IMAGE_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("n_bytes", IntegerType()),
])


def with_fake_payload(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic 16-byte binary 'image' payload: unhex(md5(text)).

    Stands in for a real image column; the bytes are a pure function of the
    row so the DuckDB oracle can reproduce the decoded metadata.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.unhex(F.md5(F.col(text_col))).alias("payload"),
    )


def decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """Real-codec seam. Replace with PIL.Image.open(io.BytesIO(payload))."""
    raise NotImplementedError(
        "image codec not available in this container; "
        "wire PIL/turbojpeg here in production"
    )


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: parse fake header fields out of the binary payload.

    width  = 1 + (bytes[0]<<8 | bytes[1]) % 2048
    height = 1 + (bytes[2]<<8 | bytes[3]) % 2048
    channels = 1 + bytes[4] % 4
    """
    for pdf in it:
        raw = pdf["payload"]
        # corrupt-tolerant: NULL or <5-byte payloads decode to NULL metadata
        # instead of crashing the task (real corpora have missing blobs)
        valid = raw.notna() & (raw.str.len() >= 5)
        bs = [raw.str[i].where(valid).astype("Int64") for i in range(5)]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": (1 + ((bs[0] * 256 + bs[1]) % 2048)).astype("Int32"),
            "height": (1 + ((bs[2] * 256 + bs[3]) % 2048)).astype("Int32"),
            "channels": (1 + (bs[4] % 4)).astype("Int32"),
            "n_bytes": raw.str.len().astype("Int32"),
        })


def image_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Decode image metadata from the binary column via Arrow-batched mapInPandas.

    Narrow (partition-preserving) — no shuffle; the binary column never
    leaves the executor except as the decoded metadata.
    """
    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        _decode_batches, schema=IMAGE_META_SCHEMA)


def frame_sample_stub(docs_with_payload: DataFrame, every_n: int = 10,
                      ) -> DataFrame:
    """Video frame-sampling seam: plumbing returns the sampling plan
    (doc_id, frame_idx) without decoding; a real build would mapInPandas
    an ffmpeg extraction over `payload` per sampled index."""
    n_frames = (F.coalesce(F.length("payload"), F.lit(0)).cast("int") * 2
                ).alias("n_frames")
    plan = docs_with_payload.select("doc_id", n_frames)
    return plan.select(
        "doc_id",
        F.explode(F.expr(
            f"CASE WHEN n_frames > 0 "
            f"THEN sequence(0, n_frames - 1, {every_n}) "
            f"ELSE array() END")).alias("frame_idx"),
    )


def resize_image_stub(payload: bytes, tw: int, th: int) -> bytes:
    """Real-resample seam. Replace with PIL's Image.resize((tw, th))."""
    raise NotImplementedError(
        "image codec not available in this container; "
        "wire PIL/opencv resampling here in production"
    )


def resize_plan(meta: DataFrame, max_side: int = 256) -> DataFrame:
    """Aspect-preserving resize targets from decoded metadata — the
    planning half of an image-resize stage (the pixel resample itself is
    the :func:`resize_image_stub` seam, a mapInPandas over payload +
    target dims exactly like :func:`image_meta`).

    Pure integer arithmetic (floor division), so the DuckDB oracle
    reproduces targets exactly. Narrow pass, fuses with the decode stage.
    Emits (doc_id, width, height, target_w, target_h, out_bytes); images
    already inside the box keep their dimensions.
    """
    w, h, c = F.col("width"), F.col("height"), F.col("channels")
    needs = (F.greatest(w, h) > max_side)
    landscape = w >= h
    tw = F.when(~needs, w).otherwise(
        F.when(landscape, F.lit(max_side))
        .otherwise(F.greatest(F.expr(f"width * {max_side} div height"),
                              F.lit(1))))
    th = F.when(~needs, h).otherwise(
        F.when(landscape, F.greatest(F.expr(f"height * {max_side} div width"),
                                     F.lit(1)))
        .otherwise(F.lit(max_side)))
    return meta.select(
        "doc_id", "width", "height", "channels",
        tw.cast("int").alias("target_w"),
        th.cast("int").alias("target_h"),
    ).withColumn(
        "out_bytes",
        F.expr("cast(target_w AS bigint) * target_h * channels"),
    )


AUDIO_META_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("sample_rate", IntegerType()),
    StructField("n_channels", IntegerType()),
    StructField("duration_ms", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("n_chunks", IntegerType()),
])

SAMPLE_RATES = {0: 16000, 1: 22050, 2: 44100, 3: 48000}
CHUNK_MS = 30000


def decode_audio_stub(payload: bytes) -> tuple[int, int, int]:
    """Real-codec seam. Replace with soundfile/ffprobe header parse."""
    raise NotImplementedError(
        "audio codec not available in this container; "
        "wire soundfile/ffmpeg here in production"
    )


def _audio_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: fake audio header from payload bytes 5..9.

    sample_rate = {16000,22050,44100,48000}[bytes[5] % 4]
    n_channels  = 1 + bytes[6] % 2
    duration_ms = 500 + (bytes[7]<<16 | bytes[8]<<8 | bytes[9]) % 600000
    n_samples   = duration_ms * sample_rate // 1000
    n_chunks    = ceil(duration_ms / 30000)   (integer arithmetic)
    """
    for pdf in it:
        raw = pdf["payload"]
        valid = raw.notna() & (raw.str.len() >= 10)
        b = [raw.str[i].where(valid).astype("Int64") for i in range(5, 10)]
        rate = (b[0] % 4).map(SAMPLE_RATES).astype("Int64")
        dur = (500 + ((b[2] * 65536 + b[3] * 256 + b[4]) % 600000)).astype("Int64")
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "sample_rate": rate.astype("Int32"),
            "n_channels": (1 + (b[1] % 2)).astype("Int32"),
            "duration_ms": dur.astype("Int32"),
            "n_samples": (dur * rate) // 1000,
            "n_chunks": ((dur + (CHUNK_MS - 1)) // CHUNK_MS).astype("Int32"),
        })


def audio_meta(docs_with_payload: DataFrame) -> DataFrame:
    """Decode audio metadata via Arrow-batched mapInPandas — same narrow,
    shuffle-free plumbing as :func:`image_meta`; the codec seam is
    :func:`decode_audio_stub`."""
    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        _audio_batches, schema=AUDIO_META_SCHEMA)


def audio_chunk_plan(meta: DataFrame, chunk_ms: int = CHUNK_MS) -> DataFrame:
    """Fixed-window chunking plan (doc_id, chunk_idx, start_ms, end_ms) —
    the resample/transcribe stage consumes one chunk per row; planning is
    pure integer sequence arithmetic, no decode."""
    # n chunks derives from the chunk_ms actually requested — the stored
    # n_chunks column was computed at decode time with the DEFAULT window,
    # so any other chunk_ms would silently under/over-cover the audio
    n = F.ceil(F.col("duration_ms") / F.lit(int(chunk_ms))).cast("int")
    return meta.select(
        "doc_id",
        "duration_ms",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
        ).alias("chunk_idx"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx") * chunk_ms).cast("int").alias("start_ms"),
        F.least(
            (F.col("chunk_idx") + 1) * chunk_ms, F.col("duration_ms")
        ).cast("int").alias("end_ms"),
    )
