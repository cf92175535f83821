"""Multimodal plumbing: binary payload columns, Arrow-batched stub decode,
frame sampling, feature extraction — schema and determinism checks."""

from __future__ import annotations


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)


def test_with_binary_payload_schema(spark):
    from pimdb_spark.operators.multimodal import with_binary_payload

    df = with_binary_payload(_docs(spark), "text")
    assert dict(df.dtypes)["payload"] == "binary"
    row = df.select("media_meta.*").first()
    assert row.mime == "application/octet-stream"
    assert row.n_bytes > 0
    assert len(row.checksum) == 32


def test_decode_images_stub_deterministic(spark):
    from pimdb_spark.operators.multimodal import decode_images, with_binary_payload

    df = with_binary_payload(_docs(spark), "text")
    out1 = {r.doc_id: (r.width, r.height, r.mode, r.n_bytes) for r in decode_images(df).collect()}
    out2 = {r.doc_id: (r.width, r.height, r.mode, r.n_bytes) for r in decode_images(df).collect()}
    assert out1 == out2
    assert len(out1) == 50
    for w, h, mode, n in out1.values():
        assert 64 <= w < 256 and 64 <= h < 256
        assert mode in ("RGB", "RGBA", "L")
        assert n > 0


def test_frame_sample(spark):
    from pimdb_spark.operators.multimodal import frame_sample, with_binary_payload

    df = with_binary_payload(_docs(spark), "text")
    frames = frame_sample(df, "doc_id", "payload", n_frames=4)
    assert frames.count() == 200  # 50 docs x 4 frames
    assert frames.select("frame_no").distinct().count() == 4


def test_feature_extract_shape(spark):
    from pimdb_spark.operators.multimodal import feature_extract, with_binary_payload

    df = with_binary_payload(_docs(spark), "text")
    fe = feature_extract(df, dim=8)
    assert dict(fe.dtypes)["feature"] == "array<float>"
    out = fe.collect()
    assert len(out) == 50
    for r in out:
        assert len(r.feature) == 8
        assert all(-1.0 <= v <= 1.0 for v in r.feature)


def test_resize_images_stub(spark):
    from pimdb_spark.operators.multimodal import resize_images, with_binary_payload

    df = with_binary_payload(_docs(spark), "text")
    out = resize_images(df, max_side=32).collect()
    assert len(out) == 50
    for r in out:
        assert 1 <= max(r.width, r.height) <= 32
        assert isinstance(r.thumb, (bytes, bytearray))


def test_decode_images_injected_decoder(spark):
    """The injectable decoder is the real-format plug point: payloads are
    parsed (not hashed) and the parsed metadata lands in the typed schema
    through the same Arrow-batched mapInPandas plumbing.  Defined inline
    so cloudpickle ships it by VALUE — a module-level function in tests/
    would be pickled by reference and die on workers (the same
    foreign-CWD failure mode ensure_worker_code guards for package code)."""
    from pimdb_spark.operators.multimodal import decode_images

    def _header_decoder(data: bytes):
        # 9-byte header: 'IMG' + width(u16be) + height(u16be) + 2-ascii mode
        assert data[:3] == b"IMG"
        width = int.from_bytes(data[3:5], "big")
        height = int.from_bytes(data[5:7], "big")
        mode = data[7:9].decode("ascii").strip()
        return width, height, mode

    payloads = [
        (1, b"IMG" + (640).to_bytes(2, "big") + (480).to_bytes(2, "big") + b"L "),
        (2, b"IMG" + (32).to_bytes(2, "big") + (64).to_bytes(2, "big") + b"RG"),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.width, r.height, r.mode, r.n_bytes)
        for r in decode_images(df, decoder=_header_decoder).collect()
    }
    assert got == {1: (640, 480, "L", 9), 2: (32, 64, "RG", 9)}


def test_decode_images_strict_refuses_stub(spark):
    """strict=True must raise at plan-build time when only the stub is
    available — a real pipeline must never silently get fake metadata."""
    import pytest as _pytest

    from pimdb_spark.operators import multimodal as M

    df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
    if M._HAVE_PIL:  # pragma: no cover - not in this container
        _pytest.skip("real decoder present")
    with _pytest.raises(NotImplementedError, match="strict"):
        M.decode_images(df, strict=True)
    # strict + injected decoder is fine — strictness is about the STUB
    out = M.decode_images(df, decoder=lambda b: (1, 1, "L"), strict=True)
    assert out.count() == 1
