"""Multimodal (image/audio/video) column plumbing — extension beyond
reference parity (the reference is numeric-only), built for the
training-data-pipeline use case: media travel as opaque ``binary``
columns with typed metadata; decode / feature-extract / frame-sample
run as Arrow-batched pandas iterators over ``mapInPandas``.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so
the decode step is a **clearly-marked deterministic stub**
(`_fake_decode_bytes`): every Spark-side piece — schema, binary
handling, batch shape, partitioning — is real and tested; swapping
the stub for a real codec changes one function.

Scale notes: payloads never hit the driver; ``mapInPandas`` streams
Arrow batches per partition, so memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` × mean payload size
— for real media (MBs/row) set that conf low (e.g. 64) and partition
by size via ``maxPartitionBytes``. Metadata-only queries (inventory,
frame counts) are pure column expressions — Catalyst prunes the
binary column out of the scan entirely.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ("image", "audio", "video")

#: bytes per fake video "frame" (frame-sampling arithmetic unit)
FRAME_BYTES = 256
#: dimension of the fake feature vector (byte-histogram bins)
N_FEATURE_BINS = 16


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media-shaped table from the ``documents`` fixture:
    payload = utf-8 bytes of ``text`` (an opaque blob as far as every
    operator here is concerned), media_type round-robins by doc_id,
    and typed metadata is derived arithmetically from the payload size
    so an SQL oracle can re-derive it. Pure column expressions."""
    payload = F.encode(F.col("text"), "UTF-8")
    n_bytes = F.octet_length(payload)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.lit(list(MEDIA_TYPES)), (F.col("doc_id") % 3 + 1).cast("int")).alias(
            "media_type"
        ),
        payload.alias("payload"),
        n_bytes.alias("n_bytes"),
        F.struct(
            (F.lit(16) + n_bytes % 624).alias("width"),
            (F.lit(16) + n_bytes % 464).alias("height"),
            (n_bytes / F.lit(1000.0)).alias("duration_s"),
            F.floor(n_bytes / FRAME_BYTES).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


# --- decode (stubbed codec, real plumbing) ------------------------------

def _fake_decode_bytes(payload: bytes) -> dict:
    """DETERMINISTIC FAKE of a codec decode: summarises raw bytes.
    Replace with PIL/ffmpeg in an environment that has them."""
    if payload is None:
        payload = b""
    n = len(payload)
    checksum = 0
    hist = [0] * N_FEATURE_BINS
    for b in payload:
        checksum = (checksum * 31 + b) % 2147483647
        hist[b % N_FEATURE_BINS] += 1
    total = float(n) or 1.0
    return {
        "n_bytes": n,
        "checksum": checksum,
        "features": [c / total for c in hist],
    }


def real_decode(payload: bytes, media_type: str):  # pragma: no cover - stub
    """Placeholder for the real codec path. The container has no
    image/audio libraries; see module docstring."""
    raise NotImplementedError(
        "real media decoding requires PIL/ffmpeg/librosa — not available "
        "in this environment; use the deterministic stub pipeline"
    )


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("checksum", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode + feature-extract every payload via ``mapInPandas``:
    one Arrow batch in, one batch of (metadata, feature-vector) out.
    The binary column is consumed inside the executor and never
    shuffled onward — the output is ~100× smaller than the input."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode_bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": [d["n_bytes"] for d in decoded],
                    "checksum": [d["checksum"] for d in decoded],
                    "features": [d["features"] for d in decoded],
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize metadata transform: the stub rewrites the typed metadata
    (real path would re-encode payload via codec). Keeps the payload
    untouched — a pure projection, no Python."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_s").alias("duration_s"),
            F.col("meta.n_frames").alias("n_frames"),
        ),
    )


def sample_frames(media: DataFrame, every: int = 10) -> DataFrame:
    """Frame sampling for video rows: payload is segmented into
    ``FRAME_BYTES`` frames; emit every ``every``-th frame's offset and
    bytes. Column-expression explode (sequence) + ``substring`` on the
    binary — no Python in the plan."""
    vids = media.filter(F.col("media_type") == "video").filter(
        F.col("meta.n_frames") > 0
    )
    return (
        vids.select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every))
            ).alias("frame_idx"),
            "payload",
        )
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * FRAME_BYTES).alias("byte_offset"),
            F.expr(f"substring(payload, frame_idx * {FRAME_BYTES} + 1, {FRAME_BYTES})").alias(
                "frame_bytes"
            ),
        )
    )


AUDIO_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_windows", T.IntegerType(), True),
        T.StructField("n_loud", T.IntegerType(), True),
        T.StructField("peak_rms", T.DoubleType(), True),
        T.StructField("doc_rms", T.DoubleType(), True),
    ]
)


def audio_window_energy(
    media: DataFrame, window: int = 256, loud_rms: float = 45.0
) -> DataFrame:
    """Windowed RMS energy over audio payloads — the
    voice-activity / silence-trim primitive of an audio training
    pipeline, with the decode step stubbed as 8-bit PCM (payload
    byte − 128; the sandbox has no codecs, the Arrow plumbing is the
    real part): per clip, window count, loud-window count
    (RMS ≥ ``loud_rms``), peak window RMS and whole-clip RMS.

    Every statistic is a ratio/√ of INTEGER sums (numpy int64
    accumulation), so the DuckDB oracle reproduces the doubles
    bit-for-bit; the binary column is consumed inside the executor
    and never shuffled (output is 5 scalars per clip)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"].values,
                "n_windows": [],
                "n_loud": [],
                "peak_rms": [],
                "doc_rms": [],
            }
            for p in pdf["payload"]:
                arr = np.frombuffer(p, dtype=np.uint8).astype(np.int64) - 128
                nb = len(arr)
                sq = arr * arr
                n_w = (nb + window - 1) // window
                rms = [
                    float(
                        np.sqrt(
                            sq[w * window : min((w + 1) * window, nb)].sum()
                            / (min((w + 1) * window, nb) - w * window)
                        )
                    )
                    for w in range(n_w)
                ]
                out["n_windows"].append(n_w)
                out["n_loud"].append(sum(1 for r in rms if r >= loud_rms))
                out["peak_rms"].append(max(rms) if rms else None)
                out["doc_rms"].append(
                    float(np.sqrt(sq.sum() / nb)) if nb else None
                )
            yield pd.DataFrame(out)

    return (
        media.filter(F.col("media_type") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, schema=AUDIO_ENERGY_SCHEMA)
    )
