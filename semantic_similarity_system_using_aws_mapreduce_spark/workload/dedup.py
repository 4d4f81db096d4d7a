"""Deduplication operators over the documents table — the LLM-data
pipeline's bread and butter, each designed for 100 TB scale:

  * exact        — hash-groupBy; one shuffle on a 128-bit digest, no
                   text comparison after the hash.
  * minhash/LSH  — shingle -> base md5 hash (ONE md5 per shingle) ->
                   k universal hashes (a_k*x+b_k mod p, pure int
                   arithmetic, whole-stage codegen) -> per-doc min ->
                   banded bucket join.  At scale candidate generation
                   touches only bucket collisions, never all pairs.
  * simhash      — 60-bit fingerprint: explode tokens, tf-weighted
                   +/-1 per bit of the token hash, 60 codegen'd
                   conditional sums in one grouped aggregation.
  * n-gram jaccard — exact verification measure: inverted shingle
                   index self-join on the (long) shingle hash; at
                   scale you run it only on LSH candidates (here also
                   standalone as the ground truth).

All hashes are md5-derived 60-bit integers (`conv(substr(md5(x),1,15),
16,10)`), chosen because they are bit-identical in Spark and DuckDB —
the correctness oracle runs the same arithmetic.  Everything below is
JVM expressions: no Python, no interpreted higher-order lambdas in hot
paths (HOF transform/aggregate are NOT codegen'd in Spark — measured
10-40x slower than the explode+groupBy plans used here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_HASHES = 8
N_BANDS = 4  # rows-per-band = N_HASHES // N_BANDS = 2
JACCARD_THRESHOLD = 0.8
# Universal hash family h_k(x) = (A[k] * (x mod P) + B[k]) mod P over a
# Mersenne prime: products stay < 2^62, so identical in any int64 SQL.
P = 2147483647
A = [1103515245, 1229782938, 1377093957, 1588635695, 1739064211, 1865811235, 1966632999, 2027875231]
B = [12345, 98765, 55555, 31337, 77777, 13579, 24680, 424242]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _toks() -> Column:
    return F.filter(F.split(F.col("text"), " "), lambda t: t != "")


def _shingles(toks: Column) -> Column:
    """Word 3-gram shingles as strings."""
    return F.transform(
        F.sequence(F.lit(0), F.size(toks) - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at(toks, i + 1),
            F.element_at(toks, i + 2),
            F.element_at(toks, i + 3),
        ),
    )


def _md5_int(col: Column) -> Column:
    """Portable 60-bit integer hash (identical in DuckDB)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _shingle_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, h): distinct 60-bit hashes of the doc's 3-gram
    shingles — the shared scan for minhash and jaccard."""
    toks = _toks()
    return (
        _docs(spark, sf_dir)
        .filter(F.size(toks) >= 3)
        .select("doc_id", F.explode(_shingles(toks)).alias("shingle"))
        .select("doc_id", _md5_int(F.col("shingle")).alias("h"))
        .distinct()
    )


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest: survivor = min doc_id per md5."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5("text").alias("digest"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .select("keep_doc_id", "n_copies")
    )


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + h0..h{k-1}: min over shingles of the k universal
    hashes of the shingle's base md5 hash.  One md5 per shingle, then
    pure codegen'd integer arithmetic and one grouped min."""
    sh = _shingle_hashes(spark, sf_dir)
    x = F.col("h") % P
    aggs = [
        F.min((F.lit(A[k]) * x + F.lit(B[k])) % P).alias(f"h{k}")
        for k in range(N_HASHES)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_sigs(spark, sf_dir)


def q_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: docs agreeing on all rows of any band are candidate
    near-dups.  The self-join keys on (band, h_i, h_j) directly — at
    100 TB this shuffle is tiny compared to all-pairs."""
    sigs = _minhash_sigs(spark, sf_dir)
    rows_per_band = N_HASHES // N_BANDS
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            *[
                F.col(f"h{b * rows_per_band + r}").alias(f"k{r}")
                for r in range(rows_per_band)
            ],
        )
        for b in range(N_BANDS)
    ]
    buckets = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", "bb.band", "bb.k0", "bb.k1")
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.k0") == F.col("b.k0"))
            & (F.col("a.k1") == F.col("b.k1"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def q_ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard >= 0.8 pairs via inverted shingle-hash
    index (shuffle on the long hash, not the string)."""
    sh = _shingle_hashes(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document: bit b is set iff the tf-weighted
    +/-1 sum over distinct tokens (by token-hash bit b) is positive.
    Plan: explode -> tf groupBy -> 60 conditional sums in one grouped
    aggregation — all whole-stage codegen, one shuffle on doc_id."""
    toks = _toks()
    tf = (
        _docs(spark, sf_dir)
        .filter(F.size(toks) >= 1)
        .select("doc_id", F.explode(toks).alias("t"))
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("w"))
        .select("doc_id", "w", _md5_int(F.col("t")).alias("h"))
    )
    bit_aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, F.col("w")).otherwise(
                -F.col("w")
            )
        ).alias(f"s{b}")
        for b in range(60)
    ]
    sums = tf.groupBy("doc_id").agg(*bit_aggs)
    simhash = None
    for b in range(60):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2**b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        simhash = term if simhash is None else simhash + term
    return sums.select("doc_id", simhash.alias("simhash"))


QUERIES = {
    "q_exact_dedup": q_exact_dedup,
    "q_minhash_signatures": q_minhash_signatures,
    "q_minhash_lsh_candidates": q_minhash_lsh_candidates,
    "q_ngram_jaccard_dups": q_ngram_jaccard_dups,
    "q_simhash": q_simhash,
}

_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"
_SHINGLES = (
    "list_transform(range(1, len(toks) - 1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])"
)
_MD5INT = "('0x' || substr(md5({x}), 1, 15))::BIGINT"

_SH_CTE = f"""
        d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sh AS (SELECT DISTINCT doc_id, {_MD5INT.format(x='shingle')} AS h FROM (
            SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM d WHERE len(toks) >= 3))
"""

_SIG_COLS = ",\n               ".join(
    f"min(({A[k]} * (h % {P}) + {B[k]}) % {P}) AS h{k}" for k in range(N_HASHES)
)

_SIGS_CTE = f"""{_SH_CTE},
        sigs AS (SELECT doc_id, {_SIG_COLS} FROM sh GROUP BY doc_id)
"""

ORACLES = {
    "q_exact_dedup": """
        SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "q_minhash_signatures": f"""
        WITH {_SIGS_CTE}
        SELECT * FROM sigs
    """,
    "q_minhash_lsh_candidates": f"""
        WITH {_SIGS_CTE},
        buckets AS (
            SELECT doc_id, 0 AS band, h0 AS k0, h1 AS k1 FROM sigs
            UNION ALL SELECT doc_id, 1, h2, h3 FROM sigs
            UNION ALL SELECT doc_id, 2, h4, h5 FROM sigs
            UNION ALL SELECT doc_id, 3, h6, h7 FROM sigs
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.k0 = b.k0 AND a.k1 = b.k1
         AND a.doc_id < b.doc_id
    """,
    "q_ngram_jaccard_dups": f"""
        WITH {_SH_CTE},
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY 1, 2)
        SELECT doc_a, doc_b,
               round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE i * 1.0 / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
    """,
    "q_simhash": f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents WHERE len({_TOKS}) >= 1),
        tok AS (SELECT doc_id, unnest(toks) AS t FROM d),
        tf AS (SELECT doc_id, t, count(*)::BIGINT AS w,
                      {_MD5INT.format(x="t")} AS h
               FROM tok GROUP BY doc_id, t),
        bits AS (SELECT doc_id, b.b AS b,
                        sum(CASE WHEN (h >> b.b) & 1 = 1 THEN w ELSE -w END) AS s
                 FROM tf CROSS JOIN (SELECT unnest(range(60)) AS b) b
                 GROUP BY doc_id, b.b)
        SELECT doc_id,
               sum(CASE WHEN s > 0 THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS simhash
        FROM bits GROUP BY doc_id
    """,
}
