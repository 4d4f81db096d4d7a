"""Stages 2+3 — marginal joins and association measures.

The reference spends two whole MapReduce jobs here:

  * Step2 dual-emits every ``lf`` record under its lexeme key and its
    feature key, custom-partitions by the first token, and exploits
    Hadoop's lexicographic key sort ("w f" < "w l" < "w lf") to carry
    the marginal in reducer instance fields across reduce() calls
    (Step2.java:34-43, :59-78, :87-94) — an order-dependent streaming
    join;
  * Step3 re-shuffles on (lexeme, feature) to merge the two halves and
    computes the four association measures (Step3.java:52-98).

Both jobs are one declarative 3-way equi-join in Spark: the
partitioner, sort trick, and carried state are pure MapReduce
workarounds (SURVEY.md §2.4 J1/J2).  Catalyst picks shuffle-hash /
sort-merge per side and AQE splits skewed partitions at runtime — the
Zipfian head-word skew the reference had to live with.

The corpus totals L and F enter as a broadcast cross-join of the 1-row
totals aggregate (the reference's S3 counters side-file + job-conf
injection, Step1.java:131-150 / Step3.java:112-139, disappears).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.operators.counts import CorpusCounts


def joined_counts(counts: CorpusCounts) -> DataFrame:
    """R2-equivalent: every (lexeme, feature) pair with its pair count
    and both marginals — ``(lexeme, feature, lf_count, l_count,
    f_count)`` — as a single 3-way join."""
    return counts.pair_counts.join(counts.lexeme_counts, "lexeme").join(
        counts.feature_counts, "feature"
    )


def association_measures(counts: CorpusCounts, mode: str = "standard") -> DataFrame:
    """R3 ``assoc`` — the four association measures per (lexeme,
    feature) (reference Step3.java:83-98):

      * ``assoc_freq``  = lf
      * ``assoc_prob``  = lf / l                       (P(feature|lexeme))
      * ``assoc_pmi``   = (F * lf) / (l * f)  in parity mode — the
        reference computes the PMI *ratio without the log*
        (Step3.java:91, quirk M3); standard mode applies log2.
      * ``assoc_ttest`` = ((lf/L) - (l/L)(f/F)) / sqrt((l/L)(f/F))

    Rows where any of l, f, lf is 0 are dropped (guard Step3.java:83;
    impossible for counts produced by corpus_counts, but preserved for
    inputs loaded from elsewhere).
    """
    if mode not in ("standard", "parity"):
        raise ValueError(f"mode must be 'standard' or 'parity', got {mode!r}")
    lf, l, f = F.col("lf_count"), F.col("l_count"), F.col("f_count")
    L, Ftot = F.col("L"), F.col("F")
    pmi_ratio = (Ftot * lf) / (l * f)
    df = (
        joined_counts(counts)
        .crossJoin(F.broadcast(counts.totals))
        .filter((lf != 0) & (l != 0) & (f != 0))
    )
    return df.select(
        "lexeme",
        "feature",
        lf.cast("double").alias("assoc_freq"),
        (lf / l).cast("double").alias("assoc_prob"),
        (pmi_ratio if mode == "parity" else F.log2(pmi_ratio)).alias("assoc_pmi"),
        (
            ((lf / L) - (l / L) * (f / Ftot)) / F.sqrt((l / L) * (f / Ftot))
        ).alias("assoc_ttest"),
    )
