"""Multimodal-column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched Pandas functions
(mapInPandas) — the Spark-side architecture is real and tested; the actual
media decoding is STUBBED because the image/audio libraries are not in this
container (clearly marked below; the import-try picks the real decoder up
automatically when Pillow is installed).

Scale notes: binary payloads stay columnar (parquet BINARY) end to end;
mapInPandas streams Arrow batches so one task holds batch_size payloads,
not a partition's worth of decoded frames.  Partition by content size
upstream if payloads are heavily skewed.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # real decoder if available (not in this container)
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False


def with_binary_payload(df: DataFrame, text_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Attach an opaque binary payload column + typed metadata struct.
    (In production the payload comes from the source — images, audio —
    here we derive one from text so the plumbing is exercised end to end.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).alias("n_bytes"),
            F.md5(F.col(text_col)).alias("checksum"),
        ),
    )


DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """STUB: deterministic fake image header derived from the payload hash.
    Replace with PIL decoding when available — the Spark-side schema,
    batching, and partitioning are identical either way."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    mode = ["RGB", "RGBA", "L"][h[2] % 3]
    return width, height, mode


def decode_images(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decoder=None,
    strict: bool = False,
) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (id, payload) yielding typed
    image metadata.

    Decoder resolution, in order: an injected ``decoder`` callable
    (``bytes -> (width, height, mode)`` — how a production format handler
    plugs in, and how tests exercise the real-decoder code path without
    Pillow in the container), else PIL when installed, else the
    deterministic stub.  ``strict=True`` refuses the stub: it raises
    NotImplementedError at plan-build time rather than silently producing
    fake metadata in a pipeline that expects real decoding."""
    if strict and decoder is None and not _HAVE_PIL:
        raise NotImplementedError(
            "decode_images(strict=True): no real decoder available — install "
            "Pillow or inject decoder=...; refusing to emit stub metadata"
        )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if decoder is not None:
                    width, height, mode = decoder(data)
                elif _HAVE_PIL:  # pragma: no cover - not in this container
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(data))
                    width, height, mode = img.width, img.height, img.mode
                else:
                    width, height, mode = _fake_decode(data)
                rows.append((int(doc_id), int(width), int(height), mode, len(data)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "mode", "n_bytes"]
            )

    return df.select(id_col, payload_col).mapInPandas(decode, DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb", BinaryType()),
    ]
)


def resize_images(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    max_side: int = 32,
) -> DataFrame:
    """Arrow-batched resize: decode → scale longest side to ``max_side`` →
    re-encode.  Uses PIL when installed; the stub derives deterministic
    scaled dimensions from the fake decode and truncates the payload as the
    'thumbnail' so schema, batching, and output size behavior are real."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                if _HAVE_PIL:  # pragma: no cover - not in this container
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(data))
                    img.thumbnail((max_side, max_side))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    rows.append((int(doc_id), img.width, img.height, buf.getvalue()))
                else:
                    w, h, _mode = _fake_decode(data)
                    scale = max_side / max(w, h)
                    rows.append(
                        (int(doc_id), max(1, int(w * scale)), max(1, int(h * scale)),
                         data[: max_side * max_side // 8])
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "width", "height", "thumb"])

    return df.select(id_col, payload_col).mapInPandas(resize, RESIZED_SCHEMA)


def frame_sample(df: DataFrame, id_col: str, payload_col: str, n_frames: int = 4) -> DataFrame:
    """'Video' frame sampling stub: split the payload into n_frames equal
    byte ranges (the real implementation seeks keyframes).  Pure column
    expressions — the explode pattern is the part that matters at scale."""
    total = F.length(F.col(payload_col))
    # substring works on BINARY natively — no string cast, which would
    # corrupt non-UTF-8 payloads; frame_head stays bytes
    frames = F.transform(
        F.sequence(F.lit(0), F.lit(n_frames - 1)),
        lambda i: F.substring(
            F.col(payload_col), (i * (total / n_frames)).cast("int") + 1, 8
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(frames).alias("frame_no", "frame_head"),
    )


def feature_extract(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload", dim: int = 8) -> DataFrame:
    """STUB feature extractor: deterministic pseudo-embedding from the
    payload hash via a Pandas UDF-style mapInPandas (stands in for a real
    vision/audio model; batch shape and Arrow transfer are the real thing)."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("feature", ArrayType(FloatType())),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                h = hashlib.md5(bytes(payload)).digest()
                vec = [round((h[i] - 128) / 128.0, 6) for i in range(dim)]
                out.append((int(doc_id), vec))
            yield pd.DataFrame(out, columns=["doc_id", "feature"])

    return df.select(id_col, payload_col).mapInPandas(extract, schema)


def payload_meta(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Oracle-checkable metadata over the binary payload (byte length +
    checksum) — the part of the multimodal path DuckDB can verify."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        F.length(payload).alias("n_bytes"),
        F.md5(F.col(text_col)).alias("checksum"),
    )
