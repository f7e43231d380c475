"""JSONL source/sink: parquet->jsonl->parquet round trip, corrupt-line
policies, schema pinning."""

from __future__ import annotations

import pytest

from geedim_spark.sources import jsonl


def test_jsonl_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [(0, "hello world", "en", "web", 11),
         (1, 'quote " and \\ backslash', "en", "web", 23),
         (2, "", "de", None, 0)],
        "doc_id long, text string, lang string, source string, n_chars long")
    p = str(tmp_path / "docs_jsonl")
    jsonl.write_jsonl(docs.coalesce(1), p)
    back = jsonl.read_jsonl(spark, p).drop("_corrupt_record")
    got = {r["doc_id"]: r for r in back.collect()}
    assert len(got) == 3
    assert got[1]["text"] == 'quote " and \\ backslash'
    assert got[2]["source"] is None  # omitted null round-trips as null
    assert [f.name for f in back.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars"]


def test_jsonl_corrupt_policies(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "a", "n_chars": 2}\n'
        'not json at all\n'
        '{"doc_id": 2, "text": "fine", "lang": "de", "source": "b", "n_chars": 4}\n')
    perm = jsonl.read_jsonl(spark, str(p))
    stats = jsonl.corrupt_stats(perm).collect()[0]
    assert (stats["n_lines"], stats["n_parsed"], stats["n_corrupt"]) == (3, 2, 1)
    dropped = jsonl.read_jsonl(spark, str(p), mode="DROPMALFORMED")
    assert dropped.count() == 2
    with pytest.raises(Exception):
        jsonl.read_jsonl(spark, str(p), mode="FAILFAST").collect()
    with pytest.raises(ValueError, match="unknown mode"):
        jsonl.read_jsonl(spark, str(p), mode="LENIENT")
    with pytest.raises(ValueError, match="PERMISSIVE"):
        jsonl.corrupt_stats(dropped)
