"""JSONL source/sink: permissive parse with corrupt-record quarantine,
keep-first dedup parity with the TSV path, and round-trip."""

from __future__ import annotations

import json


def test_read_documents_jsonl_clean_corrupt_dedup(spark, tmp_path):
    from pimdb_spark.sources.jsonl import read_documents_jsonl

    p = tmp_path / "docs.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "alpha beta", "lang": "en", "source": "web"}),
        json.dumps({"doc_id": 2, "text": "gamma", "lang": "de", "source": "web"}),
        '{"doc_id": 3, "text": "broken',  # malformed -> corrupt
        json.dumps({"doc_id": 1, "text": "DUPLICATE", "lang": "en", "source": "web"}),
        "not json at all",  # malformed -> corrupt
        json.dumps({"doc_id": 4, "text": None, "lang": None, "source": "pdf"}),
    ]
    p.write_text("\n".join(lines) + "\n")

    clean, corrupt = read_documents_jsonl(spark, str(p))
    got = {r.doc_id: (r.text, r.lang, r.source, r.n_chars) for r in clean.collect()}
    assert set(got) == {1, 2, 4}
    assert got[1] == ("alpha beta", "en", "web", 10)  # keep-FIRST, not DUPLICATE
    assert got[4] == (None, None, "pdf", None)
    bad = [r[0] for r in corrupt.collect()]
    assert len(bad) == 2
    assert "not json at all" in bad


def test_jsonl_roundtrip(spark, tmp_path):
    from pimdb_spark.sources.jsonl import DOCUMENTS_JSONL_SCHEMA, read_jsonl, write_jsonl

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    out = tmp_path / "rt"
    write_jsonl(docs.select("doc_id", "text", "lang", "source"), str(out))
    back = read_jsonl(spark, str(out), DOCUMENTS_JSONL_SCHEMA).drop("_corrupt_record")
    want = sorted(
        map(tuple, docs.select("doc_id", "text", "lang", "source").collect())
    )
    assert sorted(map(tuple, back.collect())) == want
