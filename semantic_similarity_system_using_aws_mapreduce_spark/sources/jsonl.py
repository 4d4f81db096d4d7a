"""Text-interchange document sources: JSONL and CSV — the formats LLM
corpora actually ship in (one record per line, usually gzipped).

Both readers mirror the biarcs reader's malformed-input discipline
(SURVEY §2.2 P9/P10: drop, never throw): PERMISSIVE parsing with an
explicit corrupt-record column, so bad lines are counted and
quarantined instead of failing the job — at 100 TB there is ALWAYS a
bad line.  Both return the same ``(docs, rejects)`` pair, so ingest
code is format-agnostic past the reader call.

Scale notes: an explicit schema skips Spark's whole-corpus schema
inference pre-pass on either format; gzip files are splittable only
per-file, so throughput scales with file count — shard corpora into
many ~100 MB-1 GB compressed files upstream.  CSV multiLine mode
(quoted embedded newlines) makes files non-splittable even
uncompressed — keep it off (the default here) and strip newlines at
corpus build time instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)

_CORRUPT = "_corrupt_record"


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENT_SCHEMA,
    require: tuple[str, ...] = ("doc_id", "text"),
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus (plain or .gz; glob patterns work).

    Returns ``(docs, rejects)``:
      * ``docs`` — rows parsing to the schema with every ``require``d
        field non-null, corrupt column dropped;
      * ``rejects`` — the raw text of unparseable lines plus rows
        missing required fields (for quarantine sinks / ingest audits).

    Both are lazy views over ONE scan definition; counting rejects
    while writing docs costs nothing extra if the caller uses an
    Observation or writes both.
    """
    # StructType.add mutates in place — build a fresh copy so repeated
    # calls don't accumulate corrupt columns on the caller's schema
    full = T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])
    df = spark.read.schema(full).option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", _CORRUPT
    ).json(path)
    ok = F.col(_CORRUPT).isNull()
    for c in require:
        ok = ok & F.col(c).isNotNull()
    docs = df.filter(ok).drop(_CORRUPT)
    rejects = df.filter(~ok).select(
        F.coalesce(F.col(_CORRUPT), F.to_json(F.struct(*schema.names))).alias("raw")
    )
    return docs, rejects


CSV_DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def read_csv_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType = CSV_DOCUMENT_SCHEMA,
    require: tuple[str, ...] = ("doc_id", "text"),
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read a CSV corpus (plain or .gz; glob patterns work) with the
    same ``(docs, rejects)`` quarantine contract as
    :func:`read_jsonl_documents`.

    Rejects are lines that fail to parse to the schema (wrong column
    count, un-castable doc_id, unbalanced quotes) or parse with a
    ``require``d field null.  RFC-4180 quoting ('"' quote + '""'
    escape) is on; multiLine stays off — see the module docstring for
    why that matters at scale."""
    full = T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("quote", '"')
        .option("escape", '"')
        .csv(path)
    )
    ok = F.col(_CORRUPT).isNull()
    for c in require:
        ok = ok & F.col(c).isNotNull()
    docs = df.filter(ok).drop(_CORRUPT)
    rejects = df.filter(~ok).select(
        F.coalesce(F.col(_CORRUPT), F.to_json(F.struct(*schema.names))).alias("raw")
    )
    return docs, rejects
