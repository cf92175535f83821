"""Multimodal-column catalog entries.  The oracle-checkable part is the
binary payload metadata (byte length, checksum); the mapInPandas decode /
feature-extract paths are rows-only checks (no SQL equivalent) and are
additionally asserted in tests/test_multimodal.py."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pimdb_spark.catalog import load, register
from pimdb_spark.operators import multimodal as M


@register(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text) AS checksum
    FROM documents
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload metadata (operators/multimodal.payload_meta): the
    text column is materialized as an opaque binary payload and measured.
    Scale: one projection; payloads stay columnar."""
    return M.payload_meta(load(spark, sf_dir, "documents"), "doc_id", "text")


@register(
    "q_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CAST(16 + (doc_id * 7) % 48 AS INTEGER) AS width,
           CAST(16 + (doc_id * 13) % 48 AS INTEGER) AS height,
           CASE WHEN doc_id % 3 = 1 THEN 'P' ELSE 'RGB' END AS mode
    FROM documents WHERE doc_id < 200
    """,
)
def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode over binary payloads, hash-checked end to end:
    synth_image_payload emits fully valid PNG / GIF / BMP files (CRC'd
    chunks, LZW-coded GIF data, padded BMP rows) whose dimensions are pure
    functions of doc_id, and decode_images(strict=True) recovers them by
    parsing the actual file headers (operators/multimodal.
    parse_image_header — no stub fallback permitted under strict).  The
    oracle predicts the same dimensions from doc_id, so a hash match
    proves the decoder read the real bytes.

    Scale: payloads stream through Arrow batches, one task holds
    batch_size payloads, zero shuffle."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    payloads = M.synth_image_payload(docs, "doc_id")
    decoded = M.decode_images(payloads, "doc_id", "payload", strict=True)
    return decoded.select("doc_id", "width", "height", "mode")


@register(
    "q_multimodal_decode_pinned",
    oracle="""
    SELECT doc_id,
           64 + ('0x' || substring(md5(text), 1, 2))::INT % 192 AS width,
           64 + ('0x' || substring(md5(text), 3, 2))::INT % 192 AS height,
           CASE ('0x' || substring(md5(text), 5, 2))::INT % 3
             WHEN 0 THEN 'RGB' WHEN 1 THEN 'RGBA' ELSE 'L' END AS mode,
           CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents WHERE doc_id < 200
    """,
)
def q_multimodal_decode_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode plumbing, hash-checked: an EXPLICITLY injected
    deterministic decoder (md5-header derivation — the same function the
    stub uses, but pinned via the decoder= plug point so the contract
    holds whether or not PIL is installed) runs through the identical
    Arrow-batched mapInPandas path, and DuckDB reproduces the md5-derived
    metadata byte-for-byte.  q_multimodal_decode stays rows-only: ITS
    contract is real decoding, honestly stubbed.

    Scale: same as q_multimodal_decode — payloads stream through Arrow
    batches, one task holds batch_size payloads, zero shuffle."""
    from pimdb_spark.operators.multimodal import _fake_decode

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    with_payload = M.with_binary_payload(docs, "text")
    return M.decode_images(
        with_payload, "doc_id", "payload", decoder=_fake_decode, strict=True
    )


@register(
    "q_image_channel_stats",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             16 + (doc_id * 7) % 48 AS w,
             16 + (doc_id * 13) % 48 AS h,
             doc_id % 3 AS fmt
      FROM documents WHERE doc_id < 120
    ), px1 AS (
      SELECT doc_id, w, h, fmt, unnest(range(0, w)) AS x FROM d
    ), px AS (
      SELECT doc_id, w, h, fmt, x, unnest(range(0, h)) AS y FROM px1
    )
    SELECT doc_id,
           CAST(w AS INTEGER) AS width,
           CAST(h AS INTEGER) AS height,
           CAST(sum(CASE WHEN fmt = 0 THEN (doc_id + x + y) % 256
                         WHEN fmt = 1 THEN ((x + y) % 2) * 255
                         ELSE (x + y) % 256 END) AS DOUBLE) / count(*) AS mean_r,
           CAST(sum(CASE WHEN fmt = 0 THEN (doc_id * 3 + x) % 256
                         WHEN fmt = 1 THEN ((x + y) % 2) * 255
                         ELSE (doc_id + y) % 256 END) AS DOUBLE) / count(*) AS mean_g,
           CAST(sum(CASE WHEN fmt = 0 THEN (doc_id * 7 + y) % 256
                         WHEN fmt = 1 THEN ((x + y) % 2) * 255
                         ELSE (doc_id + x) % 256 END) AS DOUBLE) / count(*) AS mean_b
    FROM px GROUP BY doc_id, w, h, fmt
    """,
)
def q_image_channel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel-level decode, hash-checked end to end: synth payloads
    (valid PNG, GIF, and BMP files) are decoded to actual pixels in pure
    Python — PNG via zlib inflate + scanline filter reconstruction, GIF
    via general variable-width LZW + palette lookup, BMP via padded
    bottom-up row parsing (operators/multimodal.{png,gif,bmp}_decode_
    pixels) — and per-channel means are emitted.  The oracle recomputes
    the means from the encoders' generative pixel formulas over an (x, y)
    grid (GIF fixtures are a black/white checkerboard, mean per channel
    = 255 x odd-cell fraction), so a hash match
    proves the decoder recovered every pixel byte, not just the header.

    Scale: Arrow-batched mapInPandas over payload bytes; zero shuffle."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    payloads = M.synth_image_payload(docs, "doc_id")
    return M.image_channel_stats(payloads, "doc_id", "payload")
