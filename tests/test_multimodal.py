"""Multimodal plumbing tests: binary payload round-trip, stub decode
determinism vs a local reimplementation, frame-sampling byte
arithmetic, metadata-only pruning.
"""

from __future__ import annotations

import pytest

from commodity_price_forecasting_spark.operators.multimodal import (
    FRAME_BYTES,
    N_FEATURE_BINS,
    _fake_decode_bytes,
    decode_media,
    media_from_documents,
    real_decode,
    resize_stub,
    sample_frames,
)
from commodity_price_forecasting_spark.sources.readers import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    return media_from_documents(load_table(spark, SF_DIR, "documents")).cache()


def test_payload_is_text_bytes(media, spark):
    docs = load_table(spark, SF_DIR, "documents")
    joined = media.join(docs, media.media_id == docs.doc_id).select(
        "payload", "text", "n_bytes"
    )
    for r in joined.limit(20).collect():
        assert bytes(r["payload"]) == r["text"].encode("utf-8")
        assert r["n_bytes"] == len(r["text"].encode("utf-8"))


def test_decode_matches_local_stub(media):
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    assert set(out) == set(src)
    for mid, payload in list(src.items())[:50]:
        want = _fake_decode_bytes(payload)
        got = out[mid]
        assert got["n_bytes"] == want["n_bytes"]
        assert got["checksum"] == want["checksum"]
        assert len(got["features"]) == N_FEATURE_BINS
        assert got["features"] == pytest.approx(want["features"])
        assert abs(sum(got["features"]) - 1.0) < 1e-9


def test_frame_sample_bytes(media):
    frames = sample_frames(media, every=10)
    rows = frames.limit(40).collect()
    assert rows
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in rows:
        payload = src[r["media_id"]]
        off = r["byte_offset"]
        assert r["frame_idx"] % 10 == 0
        assert off == r["frame_idx"] * FRAME_BYTES
        assert bytes(r["frame_bytes"]) == payload[off : off + FRAME_BYTES]
        assert len(r["frame_bytes"]) == FRAME_BYTES  # n_frames floor ⇒ full frames


def test_resize_rewrites_meta_only(media):
    resized = resize_stub(media, 224, 224)
    r = resized.first()
    assert r["meta"]["width"] == 224 and r["meta"]["height"] == 224
    assert resized.count() == media.count()


def test_metadata_query_prunes_payload(media, spark):
    """Inventory-style aggregation must not read the binary column:
    the optimized plan's ReadSchema should exclude ``payload``."""
    from commodity_price_forecasting_spark.plans.queries_multimodal import (
        mm_media_inventory,
    )

    # use a different sf_dir than the cached ``media`` fixture so the
    # cache manager can't substitute the payload-bearing cached plan
    plan = (
        mm_media_inventory(spark, "/root/testdata/sf0.01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # The scan feeds from documents; binary encode() must only appear
    # in projected arithmetic on n_bytes, never a payload materialize.
    assert "payload" not in plan


def test_real_decode_is_explicit_stub_for_images():
    with pytest.raises(NotImplementedError):
        real_decode(b"x", "image")


# --- real WAV codec (pure numpy RIFF/PCM parser) --------------------------


def test_wav_roundtrip_8bit():
    import numpy as np

    from commodity_price_forecasting_spark.operators.multimodal import (
        decode_wav,
        wav_encode,
    )

    samples = np.arange(256, dtype=np.uint8)
    blob = wav_encode(samples, bits=8, sample_rate=8000)
    d = decode_wav(blob)
    assert d["bits"] == 8 and d["sample_rate"] == 8000 and d["channels"] == 1
    assert d["n_samples"] == 256
    # 8-bit WAV is unsigned; decoder centres at 128
    assert (d["samples"] == samples.astype(np.int64) - 128).all()


def test_wav_roundtrip_16bit_sine():
    import numpy as np

    from commodity_price_forecasting_spark.operators.multimodal import (
        decode_wav,
        wav_encode,
    )

    t = np.arange(1000)
    sine = (np.sin(2 * np.pi * 440 * t / 44100) * 12000).astype("<i2")
    blob = wav_encode(sine, bits=16, sample_rate=44100, channels=1)
    d = decode_wav(blob)
    assert d["bits"] == 16 and d["sample_rate"] == 44100
    assert d["n_samples"] == 1000
    assert (d["samples"] == sine.astype(np.int64)).all()


def test_wav_skips_foreign_chunks():
    """Files from real recorders carry LIST/fact chunks between fmt
    and data — the chunk walk must skip them (with odd-size pad)."""
    import struct

    import numpy as np

    from commodity_price_forecasting_spark.operators.multimodal import (
        decode_wav,
        wav_encode,
    )

    base = wav_encode(np.array([1, 2, 3, 250], dtype=np.uint8), bits=8)
    # splice a 5-byte (odd → padded) LIST chunk before "data"
    di = base.index(b"data")
    foreign = b"LIST" + struct.pack("<I", 5) + b"INFOX" + b"\x00"
    spliced = base[:di] + foreign + base[di:]
    # patch RIFF size
    spliced = (
        spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    )
    d = decode_wav(spliced)
    assert d["n_samples"] == 4
    assert list(d["samples"]) == [1 - 128, 2 - 128, 3 - 128, 250 - 128]


def test_wav_rejects_non_riff_and_non_pcm():
    import struct

    import numpy as np

    from commodity_price_forecasting_spark.operators.multimodal import (
        decode_wav,
        wav_encode,
    )

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav at all")
    blob = bytearray(wav_encode(np.array([1, 2], dtype=np.uint8), bits=8))
    blob[20:22] = struct.pack("<H", 3)  # IEEE-float format tag
    with pytest.raises(ValueError, match="PCM"):
        decode_wav(bytes(blob))


def test_real_decode_dispatches_wav():
    import numpy as np

    from commodity_price_forecasting_spark.operators.multimodal import (
        wav_encode,
    )

    blob = wav_encode(np.array([128, 130], dtype=np.uint8), bits=8)
    d = real_decode(blob, "audio")
    assert list(d["samples"]) == [0, 2]


def test_wav_wrap_expr_matches_wav_encode(spark):
    """The pure-column-expression WAV wrapper must be byte-identical
    to the Python struct-pack encoder for the same sample bytes."""
    from pyspark.sql import functions as F

    from commodity_price_forecasting_spark.operators.multimodal import (
        wav_encode,
        wav_wrap,
    )

    texts = ["hello wav", "", "x" * 300, "tab\tand spaces"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    rows = {
        r["i"]: bytes(r["blob"])
        for r in df.select(
            "i", wav_wrap(F.encode(F.col("text"), "UTF-8")).alias("blob")
        ).collect()
    }
    import numpy as np

    for i, t in enumerate(texts):
        raw = np.frombuffer(t.encode("utf-8"), dtype=np.uint8)
        assert rows[i] == wav_encode(raw, bits=8, sample_rate=8000)


def test_wav_media_energy_matches_stub_numbers(spark):
    """decode_wav(wav_wrap(text)) must yield the SAME energy numbers
    as the headerless pcm8 stub on the same text — the invariant that
    keeps mm_audio_energy's ascii-code oracle valid."""
    from commodity_price_forecasting_spark.operators.multimodal import (
        audio_window_energy,
        media_from_documents,
        wav_media_from_documents,
    )

    docs = load_table(spark, SF_DIR, "documents")
    stub = audio_window_energy(media_from_documents(docs), codec="pcm8")
    wav = audio_window_energy(wav_media_from_documents(docs), codec="wav")
    s = {r["media_id"]: r.asDict() for r in stub.collect()}
    w = {r["media_id"]: r.asDict() for r in wav.collect()}
    assert s == w and len(s) > 0


def test_audio_energy_drops_empty_clips(spark):
    """Zero-length payloads produce NO row (oracle drop semantics)."""
    from pyspark.sql import functions as F

    from commodity_price_forecasting_spark.operators.multimodal import (
        audio_window_energy,
        wav_wrap,
    )

    df = spark.createDataFrame(
        [(1, "loud"), (2, "")], "media_id long, text string"
    ).select(
        "media_id",
        F.lit("audio").alias("media_type"),
        wav_wrap(F.encode(F.col("text"), "UTF-8")).alias("payload"),
    )
    out = audio_window_energy(df, codec="wav").collect()
    assert [r["media_id"] for r in out] == [1]
