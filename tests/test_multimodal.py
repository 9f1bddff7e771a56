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


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        real_decode(b"x", "image")
