"""Reference-format text sinks — parity dumps.

The reference materializes every stage as `key<TAB>value` text
(TextOutputFormat, Step1.java:120 / Step2.java:113 / Step3.java:149 /
Step4.java:436).  These writers reproduce those encodings so a user of
the reference can diff stage outputs directly.  Doubles are rendered by
casting in the JVM (Spark's double->string is Java's Double.toString),
so numeric text matches the reference's `%s` formatting exactly.

The ARFF writer reproduces Step5's header + row conversion
(Step5.java:78-123) for Weka interop.  ARFF is a single local file by
design (it feeds an in-process Weka run); the distributed path is the
parquet R4 relation — this sink is interop only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.operators.counts import CorpusCounts
from semantic_similarity_system_using_aws_mapreduce_spark.schemas import VECTOR_COLUMNS

# Reference ARFF attribute names (Step5.java:80-86); order == VECTOR_COLUMNS.
ARFF_ATTRIBUTES = [
    f"{a}_{s}"
    for a in ["freq", "prob", "PMI", "t-test"]
    for s in ["distManhattan", "distEuclidean", "simCosine", "simJaccard", "simDice", "simJS"]
]


def _write_text(df: DataFrame, col, path: str) -> None:
    df.select(col.alias("value")).write.mode("overwrite").text(path)


def write_counts_text(counts: CorpusCounts, path: str) -> None:
    """Step1 output: `l <lex>` / `f <feat>` / `lf <lex> <feat>` TAB count
    (the tagged-union encoding, Step1.java:63-70, :99)."""
    lex = counts.lexeme_counts.select(
        F.concat(F.lit("l "), "lexeme", F.lit("\t"), F.col("l_count").cast("string")).alias("value")
    )
    feat = counts.feature_counts.select(
        F.concat(F.lit("f "), "feature", F.lit("\t"), F.col("f_count").cast("string")).alias("value")
    )
    pair = counts.pair_counts.select(
        F.concat(
            F.lit("lf "), "lexeme", F.lit(" "), "feature",
            F.lit("\t"), F.col("lf_count").cast("string"),
        ).alias("value")
    )
    lex.unionByName(feat).unionByName(pair).write.mode("overwrite").text(path)


def write_assoc_text(assoc: DataFrame, path: str) -> None:
    """Step3 output: `lex feat<TAB>assoc_freq=_ assoc_prob=_ assoc_PMI=_
    assoc_t_test=_` (Step3.java:96-98); doubles via JVM Double.toString."""
    d = lambda c: F.col(c).cast("string")  # noqa: E731
    _write_text(
        assoc,
        F.concat(
            F.col("lexeme"), F.lit(" "), F.col("feature"), F.lit("\t"),
            F.lit("assoc_freq="), d("assoc_freq"),
            F.lit(" assoc_prob="), d("assoc_prob"),
            F.lit(" assoc_PMI="), d("assoc_pmi"),
            F.lit(" assoc_t_test="), d("assoc_ttest"),
        ),
        path,
    )


def write_pair_vectors_text(vectors: DataFrame, path: str) -> None:
    """Step4 output: `w1 w2 isRelated<TAB>[v0, v1, ..., v23]`
    (Arrays.toString formatting, Step4.java:302); labels rendered
    `True`/`False` like the canonical gold file."""
    vec_strs = [F.col(c).cast("string") for c in VECTOR_COLUMNS]
    _write_text(
        vectors,
        F.concat(
            F.col("word1"), F.lit(" "), F.col("word2"), F.lit(" "),
            F.initcap(F.col("is_related").cast("string")),
            F.lit("\t["), F.concat_ws(", ", *vec_strs), F.lit("]"),
        ),
        path,
    )


def write_arff(vectors: DataFrame, path: str) -> None:
    """Step5's ARFF encoding (header Step5.java:88-93, rows :97-123):
    24 numeric attributes + nominal class {similar, not-similar}.
    Collects to the driver — interop sink, not a data path."""
    rows = vectors.select(
        *[F.col(c).cast("string").alias(c) for c in VECTOR_COLUMNS],
        F.when(F.col("is_related"), "similar").otherwise("not-similar").alias("klass"),
    ).collect()
    with open(path, "w") as f:
        f.write("@relation semantic_similarity\n\n")
        for attr in ARFF_ATTRIBUTES:
            f.write(f"@attribute {attr} numeric\n")
        f.write("@attribute class {similar, not-similar}\n\n@data\n")
        for r in rows:
            f.write(",".join([*[r[c] for c in VECTOR_COLUMNS], r.klass]) + "\n")


def write_training_shards(
    docs: DataFrame,
    path: str,
    budget_tokens: int,
    part_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize a document relation as shard-packed training data:
    Hive-partitioned parquet with one directory per (stratum, shard_id)
    and exactly ONE file per shard, rows inside each file in
    deterministic ``order_col`` order.  Returns the shard manifest
    (stratum, shard_id, n_docs, n_tokens) — the index a training job
    reads to schedule shards.

    Shard assignment is operators/sampling.py:token_shards (hash-free
    prefix-sum packing, reproducible on re-runs).  The one-file-per-
    shard guarantee comes from repartitioning on the shard key before a
    partitionBy write: every shard's rows land in exactly one task, and
    a task writes one file per partition value it holds.

    Scale design: shards are ~budget_tokens by construction, so task
    memory is bounded regardless of corpus size; distribution across
    executors is the hash of (stratum, shard_id).  The repartition is
    the only shuffle beyond the packing prefix-sum itself.  Compare the
    reference's text sinks (one part-file per reducer, no data-aware
    layout, Step1.java:120): here layout IS the contract.
    """
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import token_shards

    assignment = token_shards(
        docs, budget_tokens, part_col=part_col, order_col=order_col, text_col=text_col
    ).select("doc_id", "stratum", "n_tokens", "shard_id")
    packed = docs.select(
        F.col(order_col).alias("doc_id"), F.col(text_col).alias("text")
    ).join(assignment, "doc_id")
    (
        packed.repartition(F.col("stratum"), F.col("shard_id"))
        .sortWithinPartitions("stratum", "shard_id", "doc_id")
        .write.mode("overwrite")
        .partitionBy("stratum", "shard_id")
        .parquet(path)
    )
    # Manifest from the assignment relation, NOT a re-read of the
    # written tree (r12): the old spark.read.parquet(path) re-listed
    # and re-scanned one directory + file PER SHARD — footer/listing
    # overhead linear in shard count (a token-budget layout produces
    # MANY shards by design), for numbers the assignment already
    # holds.  Identical (stratum, shard_id, n_docs, n_tokens) rows:
    # the write is a straight repartition of `packed`, which carries
    # every assignment row exactly once.
    return assignment.groupBy("stratum", "shard_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("n_tokens")
    )
