"""JSONL document source — the interchange format LLM corpora actually
ship in (one JSON object per line, usually gzipped).

Mirrors the biarcs reader's malformed-input discipline (SURVEY §2.2
P9/P10: drop, never throw) on the modern format: PERMISSIVE parsing
with an explicit corrupt-record column, so bad lines are counted and
quarantined instead of failing the job — at 100 TB there is ALWAYS a
bad line.

Scale notes: `.json()` with an explicit schema skips Spark's
whole-file schema inference pass (which would read the entire corpus
twice); gzip files are splittable only per-file, so throughput scales
with file count — shard corpora into many ~100 MB-1 GB .jsonl.gz
files upstream.
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
