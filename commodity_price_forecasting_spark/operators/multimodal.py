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


def real_decode(payload: bytes, media_type: str):
    """Real codec dispatch. Audio WAV (RIFF/PCM) is a header+raw
    format decodable in pure numpy — ``decode_wav`` below handles it
    with no codec library. Compressed image/video containers
    (JPEG/PNG/H.264) genuinely need PIL/ffmpeg, which this container
    lacks, so those still raise."""
    if media_type == "audio" and payload is not None and payload[:4] == b"RIFF":
        return decode_wav(payload)
    raise NotImplementedError(
        "compressed image/video decoding requires PIL/ffmpeg — not "
        "available in this environment; use the deterministic stub "
        "pipeline (WAV audio decodes for real via decode_wav)"
    )


# --- real WAV (RIFF/PCM) codec — pure numpy, no library ------------------

def wav_encode(
    samples, bits: int = 8, sample_rate: int = 8000, channels: int = 1
) -> bytes:
    """Serialize integer PCM samples into a canonical RIFF/WAVE
    container (the 44-byte header + raw little-endian data the format
    spec defines). 8-bit WAV is UNSIGNED (0..255, midpoint 128);
    16-bit is SIGNED little-endian — both per the spec. Used by tests
    and fixtures; the decoder below is the production path."""
    import struct

    import numpy as np

    if bits == 8:
        data = np.asarray(samples, dtype=np.uint8).tobytes()
    elif bits == 16:
        data = np.asarray(samples, dtype="<i2").tobytes()
    else:
        raise ValueError(f"bits must be 8 or 16: {bits}")
    block_align = channels * (bits // 8)
    byte_rate = sample_rate * block_align
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, channels, sample_rate, byte_rate,
            block_align, bits,
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE PCM container in pure numpy: walk the chunk
    list (chunks other than fmt/data — LIST, fact, cue — are skipped
    per the RIFF spec, so files from real recorders parse too), read
    the fmt chunk (PCM only: audio_format == 1), and view the data
    chunk as samples. Returns centred integer samples (8-bit unsigned
    → value − 128; 16-bit signed → value), so downstream energy math
    is codec-independent.

    Returns ``{sample_rate, channels, bits, n_samples, samples}``
    where ``samples`` is a 1-D int64 numpy array (channel-interleaved
    as stored; frame count = n_samples // channels)."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF":
        raise ValueError("not a RIFF container")
    if payload[8:12] != b"WAVE":
        raise ValueError("RIFF but not WAVE")
    pos, end = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos : pos + 4]
        (csize,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + csize + (csize & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    audio_format, channels, sample_rate, _byte_rate, _block, bits = fmt
    if audio_format != 1:
        raise ValueError(f"only PCM (format 1) supported: {audio_format}")
    if bits == 8:
        samples = np.frombuffer(data, dtype=np.uint8).astype(np.int64) - 128
    elif bits == 16:
        samples = np.frombuffer(
            data[: len(data) - (len(data) % 2)], dtype="<i2"
        ).astype(np.int64)
    else:
        raise ValueError(f"only 8/16-bit PCM supported: {bits}")
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits": bits,
        "n_samples": int(samples.size),
        "samples": samples,
    }


#: constant middle of a canonical 8-bit mono 8 kHz PCM WAV header:
#: "WAVE" + "fmt " + le32(16) + le16(fmt=1) + le16(ch=1) + le32(8000)
#: + le32(byte_rate=8000) + le16(block=1) + le16(bits=8) + "data"
_WAV_MID_HEX = (
    "57415645666D74201000000001000100401F0000401F00000100080064617461"
)


def _le_hex(col: F.Column, nbytes: int) -> F.Column:
    """Little-endian hex string of an integer column, ``nbytes`` wide
    — the byte-serialization primitive Spark lacks, built from
    shiftright/AND/hex/lpad (all codegen'd)."""
    return F.concat(
        *[
            F.lpad(
                F.hex(
                    F.shiftright(col.cast("long"), 8 * i).bitwiseAND(
                        F.lit(255)
                    )
                ),
                2,
                "0",
            )
            for i in range(nbytes)
        ]
    )


def wav_wrap(data_col: F.Column) -> F.Column:
    """Wrap a binary column of raw 8-bit PCM samples in a REAL
    RIFF/WAVE container (canonical 44-byte header, 8 kHz mono
    unsigned 8-bit) — entirely in column expressions: the two
    length-dependent header fields (RIFF chunk size = n+36, data
    size = n) serialize via ``_le_hex`` + ``unhex``, everything else
    is a hex literal. Byte-identical to ``wav_encode(samples, 8)``
    (asserted in tests), so ``decode_wav`` round-trips it."""
    n = F.octet_length(data_col)
    header = F.unhex(
        F.concat(
            F.lit("52494646"),  # "RIFF"
            _le_hex(n + 36, 4),
            F.lit(_WAV_MID_HEX),
            _le_hex(n, 4),
        )
    )
    return F.concat(header, data_col)


def wav_media_from_documents(docs: DataFrame) -> DataFrame:
    """Audio slice of the media fixture with REAL WAV payloads: the
    utf-8 text bytes become the 8-bit PCM data chunk of a canonical
    RIFF container (``wav_wrap`` — pure column expressions, no
    Python). Sample values are therefore byte − 128 of the text —
    identical numbers to the headerless stub, so energy oracles keep
    working while the decode path exercises a real parser."""
    return docs.filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("media_type"),
        wav_wrap(F.encode(F.col("text"), "UTF-8")).alias("payload"),
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
    media: DataFrame,
    window: int = 256,
    loud_rms: float = 45.0,
    codec: str = "pcm8",
) -> DataFrame:
    """Windowed RMS energy over audio payloads — the
    voice-activity / silence-trim primitive of an audio training
    pipeline: per clip, window count, loud-window count
    (RMS ≥ ``loud_rms``), peak window RMS and whole-clip RMS.

    ``codec="pcm8"`` treats the payload as raw headerless 8-bit PCM
    (byte − 128); ``codec="wav"`` runs the REAL RIFF/WAVE parser
    (``decode_wav`` — pure numpy, 8/16-bit PCM, chunk-walking) on
    each payload. Both yield centred int64 samples, so the energy
    math and the DuckDB oracle are codec-independent.

    Zero-length clips are DROPPED (no row), matching the oracle's
    semantics (its window CTE generates no rows and its doc-RMS CTE
    filters nb > 0 — emitting an n_windows=0 row here would be a
    latent row-set mismatch).

    Every statistic is a ratio/√ of INTEGER sums (numpy int64
    accumulation), so the DuckDB oracle reproduces the doubles
    bit-for-bit; the binary column is consumed inside the executor
    and never shuffled (output is 5 scalars per clip)."""
    import numpy as np

    if codec not in ("pcm8", "wav"):
        raise ValueError(f"codec must be pcm8|wav: {codec}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterable[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "n_windows": [],
                "n_loud": [],
                "peak_rms": [],
                "doc_rms": [],
            }
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if codec == "wav":
                    arr = decode_wav(p)["samples"]
                else:
                    arr = (
                        np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                        - 128
                    )
                nb = len(arr)
                if nb == 0:
                    continue
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
                out["media_id"].append(mid)
                out["n_windows"].append(n_w)
                out["n_loud"].append(sum(1 for r in rms if r >= loud_rms))
                out["peak_rms"].append(max(rms))
                out["doc_rms"].append(float(np.sqrt(sq.sum() / nb)))
            yield pd.DataFrame(out).astype(
                {"media_id": "int64", "n_windows": "int32", "n_loud": "int32"}
            )

    return (
        media.filter(F.col("media_type") == "audio")
        .select("media_id", "payload")
        .mapInPandas(run, schema=AUDIO_ENERGY_SCHEMA)
    )
