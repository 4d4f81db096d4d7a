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


# --- CSV ----------------------------------------------------------------

from semantic_similarity_system_using_aws_mapreduce_spark.sources.jsonl import read_csv_documents  # noqa: E402


def test_csv_parse_quoting_and_quarantine(spark, tmp_path):
    p = str(tmp_path / "docs.csv")
    with open(p, "w") as f:
        f.write("doc_id,text,lang,source\n")
        f.write('1,"hello, ""quoted"" world",en,web\n')   # comma + escaped quote
        f.write("2,plain text,fr,web\n")
        f.write("notanint,oops,de,web\n")                  # un-castable doc_id
        f.write("4,,de,web\n")                             # missing required text
    docs, rejects = read_csv_documents(spark, p)
    got = {r.doc_id: r.text for r in docs.collect()}
    assert got == {1: 'hello, "quoted" world', 2: "plain text"}
    assert rejects.count() == 2


def test_csv_gzip_glob_headerless(spark, tmp_path):
    import gzip

    for i in range(2):
        with gzip.open(str(tmp_path / f"part-{i}.csv.gz"), "wt") as f:
            f.write(f"{i},doc number {i},en,web\n")
    docs, rejects = read_csv_documents(
        spark, str(tmp_path / "part-*.csv.gz"), header=False
    )
    assert sorted(r.doc_id for r in docs.collect()) == [0, 1]
    assert rejects.count() == 0


def test_csv_round_trips_the_documents_table(spark, tmp_path):
    """documents.parquet -> CSV -> read_csv_documents reproduces every
    row (the fixture text is single-line, space-tokenized — exactly the
    corpus shape the module docstring prescribes for splittable CSV)."""
    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text", "lang", "source"
    )
    out = str(tmp_path / "csv")
    src.coalesce(1).write.option("header", "true").csv(out)
    docs, rejects = read_csv_documents(spark, out + "/*.csv")
    assert rejects.count() == 0
    want = {tuple(r) for r in src.collect()}
    got = {tuple(r) for r in docs.collect()}
    assert got == want
