"""Syntactic n-gram ("biarcs") corpus reader.

Input format (reference Step1.java:19-20; FIXTURES.md §A1)::

    head_word<TAB>ngram<TAB>total_count<TAB>year,count<TAB>year,count...

where ``ngram`` is a space-separated list of ``word/POS/dep/head_idx``
quads.  Parsing is PERMISSIVE (the reference silently drops malformed
rows/tokens — Step1.java:32-34, :52-59, :76-78): wrong tab arity drops
the row, non-numeric counts drop the row, a quad with != 4 parts or an
unparsable/0 head pointer drops that token only.

Design for scale: stemming — the engine's only Python function in the
hot path — happens in ONE Arrow-batched pandas UDF per corpus row,
rewriting the token strings in place exactly like the reference
(Stemmer.stemWord + String.replace, Step1.java:41-47, including the
replace-ALL-occurrences quirk).  All structural work (tab/slash splits,
casts, explode, head-pointer dereference) stays in JVM expressions, so
the plan around the UDF remains whole-stage-codegen'd.  Apply once,
persist, and every downstream stage is fully native.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from semantic_similarity_system_using_aws_mapreduce_spark.functions.stemming import porter_stem


# Worker-lifetime memo tables for the stem rewrite (guide §4.5 shape:
# module-level state in an importable module survives across batches
# AND tasks under spark.python.worker.reuse, the default — per-batch
# dicts re-stemmed the same Zipfian vocabulary once per 10k-row Arrow
# batch).  Pure-function memo only: keys are token/word strings,
# values their deterministic rewrites, so reuse can never change a
# result.  The cap bounds worker RSS on unbounded-vocabulary corpora;
# clearing (rare: vocabularies are Zipfian) just costs re-stemming.
_TOK_CACHE: dict[str, str] = {}
_STEM_CACHE: dict[str, str] = {}
_CACHE_MAX = 1 << 20

#: bytes of raw corpus text per spread partition (r13, VERDICT r12
#: #3: "repartition to data, not to cores").  The stem UDF is the
#: per-byte cost the spread exists to parallelize; below ~2 MB of
#: lines a partition's stem work no longer amortizes its Python
#: worker spin-up + Arrow channel setup, so a tiny corpus fans out
#: to ceil(bytes / this) partitions instead of unconditionally to
#: the core count (a 200k-line ~17 MB bench corpus gets 9-way spread
#: where a 1M-line ~80 MB one still saturates 32 cores — measured
#: quiet A/B in OPTIMIZATION_r13.md; at production line counts the
#: cap is always the core count, unchanged).
SPREAD_SPLIT_BYTES = 2 << 20


@F.pandas_udf(T.ArrayType(T.StringType()))
def _stem_rewrite_tokens(ngrams: pd.Series) -> pd.Series:
    """Split the n-gram on spaces and rewrite each token by replacing
    every occurrence of its surface word (the part before the first
    ``/``) with its Porter stem — byte-compatible with reference
    Step1.java:41-47.  Tokens without a ``/`` are kept as-is (the
    reference would crash on them; permissive here).

    Memoized at both the token level and the word level in the
    worker-lifetime tables above: corpus token quads and words are
    heavily repeated (Zipfian).
    """
    if len(_TOK_CACHE) > _CACHE_MAX:
        _TOK_CACHE.clear()
    if len(_STEM_CACHE) > _CACHE_MAX:
        _STEM_CACHE.clear()
    tok_cache = _TOK_CACHE
    stem_cache = _STEM_CACHE

    def _rewrite(tok: str) -> str:
        hit = tok_cache.get(tok)
        if hit is not None:
            return hit
        slash = tok.find("/")
        if slash < 0:
            out = tok
        else:
            word = tok[:slash]
            stem = stem_cache.get(word)
            if stem is None:
                stem = stem_cache[word] = porter_stem(word)
            # String.replace replaces ALL occurrences (quirk P4).
            out = tok.replace(word, stem) if word else tok
        tok_cache[tok] = out
        return out

    def _row(ngram: str) -> list[str]:
        if ngram is None:
            return []
        return [_rewrite(tok) for tok in ngram.split(" ")]

    return ngrams.map(_row)


# Optimizer contract (guide §4.4): the explode in token_emissions makes
# Catalyst infer `size(tokens) > 0 AND isnotnull(tokens)` and push it
# below this projection — which, for a deterministic UDF column, CLONES
# the UDF: the physical plan carried TWO ArrowEvalPython nodes and every
# corpus row was stemmed twice (r12 plan audit,
# plans/r12/pipeline_emissions_*.txt).  Non-deterministic marking
# forbids the optimizer from duplicating/reordering the expression, so
# exactly one evaluation survives.  The function itself is pure; the
# marking is purely an optimizer fence.
_stem_rewrite_tokens = _stem_rewrite_tokens.asNondeterministic()


def read_biarcs(
    spark: SparkSession,
    path: str,
    stem: bool = True,
    keep_years: bool = False,
    spread_to: int | None = None,
) -> DataFrame:
    """Read raw biarcs text into the typed R0 ``corpus`` relation:
    ``(head_word, tokens: array<string>, total_count: long)``.

    ``tokens`` holds the (optionally stem-rewritten) quad strings;
    structural quad parsing happens in :func:`token_emissions` so the
    head-pointer dereference can index the full array.

    ``spread_to``: when the text source yields fewer splits than this
    (file-split heuristics gave a 1M-line corpus 19 skewed splits),
    round-robin the RAW LINES BEFORE the parse + stem projections, so
    the expensive work runs at full parallelism and the shuffle
    carries the narrow unparsed text (the guide's
    repartition-after-unsplittable-read pattern; previously the
    pipeline repartitioned the parsed relation ABOVE the stem UDF,
    which left stemming at scan parallelism).  The fan-out is sized to
    the DATA (ceil(bytes / SPREAD_SPLIT_BYTES)) and only capped by
    ``spread_to`` (r13): a tiny corpus must not pay ``spread_to``
    Python-worker spin-ups for sub-MB slices of stem work.  No-op when
    the source already has enough splits — at production scale no
    shuffle is added.
    """
    raw = spark.read.text(path)
    if spread_to is not None:
        parts = raw.rdd.getNumPartitions()
        if parts < spread_to:
            # spread sized to the DATA, capped at the caller's core
            # count (guide §2.5): ceil(input_bytes / SPREAD_SPLIT_BYTES)
            # partitions, never fewer than the scan already has.  The
            # byte count comes from Catalyst's file-index statistics —
            # driver-side metadata, no job.
            import math

            try:
                size_b = int(
                    str(
                        raw._jdf.queryExecution()
                        .optimizedPlan()
                        .stats()
                        .sizeInBytes()
                    )
                )
                target = min(
                    spread_to,
                    max(parts, math.ceil(size_b / SPREAD_SPLIT_BYTES)),
                )
            except Exception:  # noqa: BLE001 — stats unavailable: old rule
                target = spread_to
            if target > parts:
                raw = raw.repartition(target)
    # Java's String.split drops TRAILING empty fields (Step1.java:30
    # operates on that arity); strip trailing tabs so a line like
    # "a<TAB>b<TAB>c<TAB>" counts 3 fields here too.
    fields = F.split(F.regexp_replace(F.col("value"), "\t+$", ""), "\t")
    df = (
        raw
        .select(
            fields.getItem(0).alias("head_word"),
            fields.getItem(1).alias("ngram"),
            fields.getItem(2).try_cast(T.LongType()).alias("total_count"),
            F.when(
                F.size(fields) >= 4, F.slice(fields, 4, F.size(fields) - 3)
            ).alias("year_fields"),
            F.size(fields).alias("_arity"),
        )
        # P9: rows with < 4 tab fields are dropped (Step1.java:32-34);
        # non-numeric counts likewise (the reference would crash in the
        # reducer's Integer.parseInt — we drop instead).
        .filter((F.col("_arity") >= 4) & F.col("total_count").isNotNull())
    )
    tokens = _stem_rewrite_tokens(F.col("ngram")) if stem else F.split(F.col("ngram"), " ")
    cols = [
        F.col("head_word"),
        tokens.alias("tokens"),
        F.col("total_count"),
    ]
    if keep_years:
        # year,count pairs -> map<int,long>; the reference parses these
        # away entirely (only fields[2] is read, Step1.java:36).
        pair = F.filter(
            F.col("year_fields"), lambda s: F.size(F.split(s, ",")) == 2
        )
        cols.append(
            F.map_from_arrays(
                F.transform(pair, lambda s: F.split(s, ",")[0].try_cast(T.IntegerType())),
                F.transform(pair, lambda s: F.split(s, ",")[1].try_cast(T.LongType())),
            ).alias("counts_by_year")
        )
    return df.select(*cols)


def _quad(tok: Column) -> Column:
    return F.split(tok, "/")


def token_emissions(corpus: DataFrame) -> DataFrame:
    """Per-token (lexeme, feature, count) emission relation — the
    logical output of the reference's Step1 mapper (Step1.java:49-79)
    before aggregation.

    Per token with quad ``word/pos/dep/head_idx``:
      * tokens whose quad does not have exactly 4 parts are dropped
        (Step1.java:52-54);
      * ``head_idx`` must parse as an int and be nonzero
        (root filter P6, Step1.java:56-59);
      * ``lexeme`` = surface word of ``tokens[head_idx - 1]``
        (head-pointer dereference P7, Step1.java:62) — out-of-bounds
        pointers drop the token (the reference catches the
        ArrayIndexOutOfBounds per token, Step1.java:76-78);
      * ``feature`` = ``word + '-' + dep`` (P8, Step1.java:66).

    Everything here is JVM whole-stage-codegen: explode + splits +
    try_cast + F.get.
    """
    tok = F.col("token")
    parts = _quad(tok)
    head_idx = parts.getItem(3).try_cast(T.IntegerType())
    return (
        corpus.select(
            F.col("total_count").alias("count"),
            F.col("tokens"),
            F.explode(F.col("tokens")).alias("token"),
        )
        .withColumn("head_idx", F.when(F.size(parts) == 4, head_idx))
        .filter(F.col("head_idx").isNotNull() & (F.col("head_idx") != 0))
        # F.get returns NULL when head_idx-1 is out of bounds (vs the
        # reference's caught per-token exception, Step1.java:76-78).
        .withColumn("head_token", F.get(F.col("tokens"), F.col("head_idx") - 1))
        .filter(F.col("head_token").isNotNull())
        .select(
            F.substring_index(F.col("head_token"), "/", 1).alias("lexeme"),
            F.concat_ws("-", parts.getItem(0), parts.getItem(2)).alias("feature"),
            F.col("count"),
        )
    )
