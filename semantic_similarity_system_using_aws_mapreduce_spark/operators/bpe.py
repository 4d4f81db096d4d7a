"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") — the
operator a training-data pipeline runs BEFORE token counting, sequence
packing, and token-budget sharding make sense: the tokenizer itself is
learned from the corpus.

Scale shape — the whole point of the design: the corpus is touched
EXACTLY ONCE (one combiner-friendly ``groupBy(word)`` producing the
weighted vocabulary, ~1e6-1e7 rows for a 100 TB crawl — model-sized,
like the k-means centroid or PQ codebook relations).  Every one of the
``n_merges`` rounds then runs entirely on that vocabulary relation:

  * pair counting: one explode + sum over vocab rows (kilobyte
    shuffles — pairs of adjacent symbols, weighted by word count);
  * argmax: a 1-row driver collect with a deterministic tie-break
    (count DESC, then lexicographic pair) — the documented legitimate
    model-sized control-flow base (kmeans_lloyd collects k rows);
  * merge application: a JVM ``regexp_replace`` over the symbol
    string (``\\Q..\\E``-quoted, whitespace-anchored) — no Python
    touches the data, ever.

The naive alternative (re-scan the corpus per merge, as a literal
reading of the algorithm implies) costs n_merges full passes; this
form is how every production BPE trainer works and is why it belongs
in the engine rather than a driver script.

Reference analog: none — the reference pipeline consumes pre-tokenized
biarcs (Step1.java:30); tokenizer training is north-star surface for
the LLM-data mission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: end-of-word sentinel appended to every word's symbol sequence so
#: merges can learn word-final subwords (the classic ``</w>`` marker)
EOW = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n): the weighted vocabulary — the ONE corpus-wide pass.
    Whitespace tokenization, matching the engine's token convention
    (workload/text._tokens_col)."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _init_symbols(words: DataFrame) -> DataFrame:
    """(word, syms, n) with ``syms`` the space-joined character
    sequence plus the end-of-word marker: ``low`` -> ``l o w </w>``."""
    chars = F.expr("array_join(filter(split(word, ''), c -> c <> ''), ' ')")
    return words.select(
        "word", F.concat(chars, F.lit(" " + EOW)).alias("syms"), "n"
    )


def pair_counts(syms_df: DataFrame) -> DataFrame:
    """(left, right, weight): adjacent-symbol pair frequencies over the
    vocabulary relation, weighted by word count.  One explode + one
    sum — the per-round cost of the training loop."""
    pairs = F.expr(
        """
        transform(
            sequence(1, size(split(syms, ' ')) - 1),
            i -> struct(element_at(split(syms, ' '), i) AS left,
                        element_at(split(syms, ' '), i + 1) AS right)
        )
        """
    )
    return (
        syms_df.filter(F.size(F.split("syms", " ")) >= 2)
        .select(F.explode(pairs).alias("p"), "n")
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("n").alias("weight"))
    )


def _quote_regex(s: str) -> str:
    r"""Java-regex-quote a symbol (``\Q..\E``; embedded ``\E`` split)."""
    return "\\Q" + s.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def apply_merge(syms_df: DataFrame, left: str, right: str) -> DataFrame:
    """Merge one adjacent pair across the vocabulary: a single JVM
    ``regexp_replace`` anchored to symbol boundaries (start/space on
    both sides), replacing ``left right`` with ``leftright``."""
    pat = f"(?<=^| ){_quote_regex(left)} {_quote_regex(right)}(?=$| )"
    repl = (left + right).replace("\\", "\\\\").replace("$", "\\$")
    return syms_df.withColumn("syms", F.regexp_replace("syms", pat, repl))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_count: int = 2,
    stats: dict | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a corpus; returns the merge
    list in learned order (the tokenizer model).  Deterministic: ties
    on pair frequency break lexicographically on (left, right), so two
    engines (and the pure-Python differential in tests/test_bpe.py)
    learn the IDENTICAL merge sequence.  Stops early when no pair
    reaches ``min_count``."""
    from pyspark import StorageLevel

    syms = _init_symbols(word_counts(docs, text_col)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    syms.count()  # materialize once; each round replaces this relation
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(syms)
            .orderBy(F.desc("weight"), F.asc("left"), F.asc("right"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["weight"] < min_count:
            break
        left, right = top[0]["left"], top[0]["right"]
        merges.append((left, right))
        new_syms = apply_merge(syms, left, right).localCheckpoint(eager=True)
        syms.unpersist()
        syms = new_syms
    if stats is not None:
        stats["n_merges"] = len(merges)
    syms.unpersist()
    return merges


def bpe_encode_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """(word, pieces): segment each distinct word with a learned merge
    list — replaying the merges in rank order over the vocabulary
    relation (encode once per DISTINCT word; a corpus tokenization
    joins this kilobyte-scale table back, it never re-encodes per
    occurrence)."""
    syms = _init_symbols(
        words.select("word").distinct().withColumn("n", F.lit(1))
    )
    for left, right in merges:
        syms = apply_merge(syms, left, right)
    return syms.select("word", F.split("syms", " ").alias("pieces"))
