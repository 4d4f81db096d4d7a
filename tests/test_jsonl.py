"""JSONL document source: schema-pinned parse, corrupt lines and
missing-required-field rows quarantined, gzip handled."""

import gzip
import json

from semantic_similarity_system_using_aws_mapreduce_spark.sources.jsonl import read_jsonl_documents

GOOD = [
    {"doc_id": 1, "text": "hello world", "lang": "en", "source": "web",
     "meta": {"url": "x"}},
    {"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "web", "meta": None},
]
BAD_JSON = '{"doc_id": 3, "text": "trunca'          # unparseable
MISSING_TEXT = {"doc_id": 4, "lang": "de", "source": "web", "meta": None}


def _write(path, lines, compress=False):
    opener = gzip.open if compress else open
    with opener(path, "wt") as f:
        for line in lines:
            f.write((line if isinstance(line, str) else json.dumps(line)) + "\n")


def test_jsonl_parse_and_quarantine(spark, tmp_path):
    p = str(tmp_path / "docs.jsonl")
    _write(p, [GOOD[0], BAD_JSON, GOOD[1], MISSING_TEXT])
    docs, rejects = read_jsonl_documents(spark, p)
    got = {r.doc_id: (r.text, r.lang) for r in docs.collect()}
    assert got == {1: ("hello world", "en"), 2: ("bonjour", "fr")}
    assert "meta" in docs.columns and "_corrupt_record" not in docs.columns
    raws = [r.raw for r in rejects.collect()]
    assert len(raws) == 2
    assert any("trunca" in r for r in raws)          # the corrupt line verbatim
    assert any('"doc_id":4' in r.replace(" ", "") for r in raws)  # missing text


def test_jsonl_gzip_glob(spark, tmp_path):
    _write(str(tmp_path / "part-0.jsonl.gz"), [GOOD[0]], compress=True)
    _write(str(tmp_path / "part-1.jsonl.gz"), [GOOD[1]], compress=True)
    docs, rejects = read_jsonl_documents(spark, str(tmp_path / "part-*.jsonl.gz"))
    assert docs.count() == 2 and rejects.count() == 0
