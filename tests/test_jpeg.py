"""Baseline JPEG codec (operators/jpeg_codec — r10 VERDICT ask #8):
round-trip fidelity across qualities/sampling, exactness anchors,
restart intervals, variant rejection, and the Spark mapInPandas lanes
(channel stats + format-preserving resize) over real JPEG payloads.
"""

from __future__ import annotations

import numpy as np
import pytest

from commodity_price_forecasting_spark.operators.jpeg_codec import (
    ZIGZAG,
    _build_huffman_codes,
    _build_huffman_decoder,
    _fdct_blocks,
    _idct_blocks,
    _scaled_qt,
    QT_LUMA,
    decode_jpeg,
    jpeg_encode,
)


def _smooth(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return (
        np.stack(
            [128 + 100 * np.sin(xx / 9.0), 255 * yy / h, 255 * xx / w], axis=-1
        )
        .clip(0, 255)
        .astype(np.uint8)
    )


# --- transform/table internals -------------------------------------------

def test_dct_pair_is_inverse():
    rng = np.random.default_rng(0)
    b = rng.normal(scale=100, size=(5, 8, 8))
    assert np.abs(_idct_blocks(_fdct_blocks(b)) - b).max() < 1e-9


def test_dct_dc_matches_spec():
    """T.81 A.3.3: for a constant block of value v the DC coefficient
    is 8v and every AC is 0 (the r11 einsum-transpose bug was caught
    by exactly this property failing on decode)."""
    f = _fdct_blocks(np.full((1, 8, 8), -51.0))
    assert abs(f[0, 0, 0] - 8 * -51.0) < 1e-9
    assert np.abs(f[0].reshape(64)[1:]).max() < 1e-9


def test_zigzag_is_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec anchors: positions 0..5 are 0,1,8,16,9,2
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]


def test_quality_scaling_monotone():
    q50 = _scaled_qt(QT_LUMA, 50)
    q90 = _scaled_qt(QT_LUMA, 90)
    assert (q90 <= q50).all() and (q50 >= 1).all() and (q90 <= 255).all()
    assert np.array_equal(q50, QT_LUMA.clip(1, 255))  # IJG: q=50 is identity


def test_huffman_tables_roundtrip():
    from commodity_price_forecasting_spark.operators.jpeg_codec import (
        AC_LUMA_BITS,
        AC_LUMA_VALS,
    )

    enc = _build_huffman_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dec = _build_huffman_decoder(AC_LUMA_BITS, AC_LUMA_VALS)
    assert len(enc) == 162
    for val, (code, length) in enc.items():
        assert dec[(length, code)] == val


# --- codec round trips -----------------------------------------------------

def test_uniform_image_roundtrips_exactly():
    uni = np.full((16, 16, 3), 77, np.uint8)
    d = decode_jpeg(jpeg_encode(uni, quality=90))
    assert np.array_equal(d["pixels"], uni)
    assert (d["width"], d["height"], d["channels"], d["maxval"]) == (16, 16, 3, 255)


@pytest.mark.parametrize("quality,subsample,tol_mean,tol_max", [
    (95, False, 1.0, 5),
    (85, False, 2.0, 10),
    (50, False, 4.0, 16),
    (95, True, 4.0, 16),
    (85, True, 4.0, 20),
])
def test_smooth_image_roundtrip_error_bounded(quality, subsample, tol_mean, tol_max):
    img = _smooth()
    d = decode_jpeg(jpeg_encode(img, quality=quality, subsample=subsample))
    err = np.abs(d["pixels"].astype(float) - img.astype(float))
    assert err.mean() < tol_mean
    assert err.max() <= tol_max
    assert d["pixels"].shape == img.shape


def test_noise_image_decodes_and_stuffs_ff():
    """Random noise exercises long Huffman codes and the FF->FF00
    byte-stuffing path on both sides."""
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    enc = jpeg_encode(noise, quality=75)
    assert enc.count(b"\xff\x00") >= 1
    d = decode_jpeg(enc)
    assert d["pixels"].shape == (24, 24, 3)


def test_odd_dimensions_pad_and_crop():
    rng = np.random.default_rng(3)
    odd = rng.integers(0, 256, (13, 21, 3), dtype=np.uint8)
    for sub in (False, True):
        d = decode_jpeg(jpeg_encode(odd, quality=85, subsample=sub))
        assert (d["height"], d["width"]) == (13, 21)
        assert d["pixels"].shape == (13, 21, 3)


def test_restart_interval_equals_plain():
    img = _smooth()
    plain = decode_jpeg(jpeg_encode(img, quality=85))
    with_rst = decode_jpeg(jpeg_encode(img, quality=85, restart_interval=3))
    assert np.array_equal(plain["pixels"], with_rst["pixels"])
    assert b"\xff\xdd" in jpeg_encode(img, quality=85, restart_interval=3)


def test_grayscale_single_component():
    yy, xx = np.mgrid[0:24, 0:32]
    gray = (128 + 60 * np.sin(xx / 7.0)).clip(0, 255).astype(np.uint8)
    d = decode_jpeg(jpeg_encode(gray, quality=92))
    assert d["pixels"].shape == (24, 32, 3)
    # Y replicated across channels
    assert np.array_equal(d["pixels"][..., 0], d["pixels"][..., 1])
    err = np.abs(d["pixels"][..., 0].astype(float) - gray.astype(float))
    assert err.mean() < 2.0


def test_quality_controls_size_and_error():
    img = _smooth()
    e95 = jpeg_encode(img, quality=95)
    e30 = jpeg_encode(img, quality=30)
    assert len(e30) < len(e95)
    err95 = np.abs(decode_jpeg(e95)["pixels"].astype(float) - img).mean()
    err30 = np.abs(decode_jpeg(e30)["pixels"].astype(float) - img).mean()
    assert err95 < err30


# --- rejection contract ----------------------------------------------------

def test_progressive_rejected_by_name():
    """A SOF2 header must raise a NAMED NotImplementedError, not decode
    garbage. Build one by rewriting a baseline file's SOF0 marker."""
    enc = bytearray(jpeg_encode(_smooth(16, 16), quality=85))
    i = enc.find(b"\xff\xc0")
    assert i > 0
    enc[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(enc))


def test_arithmetic_and_16bit_rejected():
    enc = bytearray(jpeg_encode(_smooth(16, 16), quality=85))
    i = enc.find(b"\xff\xc0")
    enc[i + 1] = 0xCC
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(enc))
    enc2 = bytearray(jpeg_encode(_smooth(16, 16), quality=85))
    j = enc2.find(b"\xff\xdb")
    enc2[j + 4] = 0x10  # Pq=1 (16-bit quant table)
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_jpeg(bytes(enc2))


def test_cmyk_and_two_component_rejected_by_name():
    """SOF0 is legal for 4-component Adobe CMYK/YCCK — without the
    ncomp guard it decoded 'cleanly' as YCbCr + a dropped plane
    (garbage RGB), and a 2-component scan crashed with a bare
    IndexError (r11 ADVICE #1). Both must raise the NAMED error."""
    for ncomp in (4, 2):
        sof = bytes([8]) + (32).to_bytes(2, "big") + (32).to_bytes(2, "big")
        sof += bytes([ncomp])
        for cid in range(ncomp):
            sof += bytes([cid + 1, 0x11, 0])
        seg = b"\xff\xc0" + (2 + len(sof)).to_bytes(2, "big") + sof
        with pytest.raises(NotImplementedError, match="component"):
            decode_jpeg(b"\xff\xd8" + seg + b"\xff\xd9")


def test_ff_fill_bytes_before_marker_are_skipped():
    """T.81 B.1.1.2 allows any number of 0xFF pad bytes before a
    marker code; previously such a (valid) file read 0xFF as the code
    and a bogus segment length, then failed with a misleading
    'truncated' error (r11 ADVICE #2)."""
    img = _smooth(16, 16)
    enc = jpeg_encode(img, quality=85)
    padded = enc[:2] + b"\xff\xff\xff" + enc[2:]
    assert np.array_equal(decode_jpeg(padded)["pixels"], decode_jpeg(enc)["pixels"])
    # fill bytes running off the end stay a LOUD failure
    with pytest.raises(ValueError, match="fill bytes"):
        decode_jpeg(enc[:2] + b"\xff\xff\xff")


def test_truncated_and_garbage_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    enc = jpeg_encode(_smooth(16, 16), quality=85)
    with pytest.raises(ValueError):
        decode_jpeg(enc[: len(enc) // 2])


# --- Spark lanes over real JPEG payloads -----------------------------------

def test_spark_channel_stats_over_jpeg(spark):
    """image_channel_stats (Arrow-batched mapInPandas) consumes real
    JPEG containers via the magic dispatch; means must match the
    decoded pixels computed locally."""
    from commodity_price_forecasting_spark.operators.multimodal import (
        image_channel_stats,
    )

    imgs = {1: _smooth(16, 24), 2: np.full((8, 8, 3), 200, np.uint8)}
    rows = [
        (mid, "image", bytearray(jpeg_encode(px, quality=90)))
        for mid, px in imgs.items()
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    got = {r["media_id"]: r for r in image_channel_stats(media).collect()}
    assert set(got) == {1, 2}
    for mid, px in imgs.items():
        dec = decode_jpeg(jpeg_encode(px, quality=90))["pixels"]
        assert got[mid]["width"] == px.shape[1]
        assert got[mid]["height"] == px.shape[0]
        assert abs(got[mid]["mean_r"] - dec[..., 0].mean()) < 1e-6


def test_spark_resize_keeps_jpeg_format(spark):
    """resize_media_real re-encodes JPEG as JPEG (lossy re-quantize,
    format preserved) and the resized payload decodes to the target
    geometry."""
    from commodity_price_forecasting_spark.operators.multimodal import (
        resize_media_real,
    )

    media = spark.createDataFrame(
        [(1, "image", bytearray(jpeg_encode(_smooth(32, 32), quality=90)))],
        "media_id long, media_type string, payload binary",
    )
    out = resize_media_real(media, 16, 16).collect()
    payload = bytes(out[0]["payload"])
    assert payload[:2] == b"\xff\xd8"
    d = decode_jpeg(payload)
    assert (d["width"], d["height"]) == (16, 16)
