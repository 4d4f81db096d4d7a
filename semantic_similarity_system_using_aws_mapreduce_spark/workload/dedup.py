"""Deduplication operators over the documents table — the LLM-data
pipeline's bread and butter, each designed for 100 TB scale:

  * exact        — hash-groupBy; one shuffle on a 128-bit digest, no
                   text comparison after the hash.
  * minhash/LSH  — shingle -> k minhashes -> banded bucket join; at
                   scale candidate generation touches only bucket
                   collisions (shuffle on band hash), never all pairs.
  * simhash      — 60-bit fingerprint per doc from token hashes; near
                   dup = small Hamming distance; fingerprinting is
                   shuffle-free (array expressions per row).
  * n-gram jaccard — exact verification measure: inverted shingle
                   index self-join; at scale you run it only on LSH
                   candidates (here also standalone as the ground
                   truth).

All hashes are md5-derived 60-bit integers (`conv(substr(md5(x),1,15),
16,10)`), chosen because they are bit-identical in Spark and DuckDB —
the correctness oracle runs the same arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_HASHES = 8
N_BANDS = 4  # rows-per-band = N_HASHES // N_BANDS = 2
JACCARD_THRESHOLD = 0.8


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


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content digest: survivor = min doc_id per md5."""
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5("text").alias("digest"))
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .select("keep_doc_id", "n_copies")
    )


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id + h0..h{k-1}: min over shingles of md5(seed || shingle).
    Computed as array expressions per document — shuffle-free."""
    toks = _toks()
    sh = _shingles(toks)

    def seeded(k: int):
        # NB: the lambda must take exactly one arg — PySpark passes the
        # array index to a second parameter, defaults included.
        return lambda s: _md5_int(F.concat(F.lit(f"{k}|"), s))

    cols = [
        F.array_min(F.transform(sh, seeded(k))).alias(f"h{k}") for k in range(N_HASHES)
    ]
    return _docs(spark, sf_dir).filter(F.size(toks) >= 3).select("doc_id", *cols)


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_sigs(spark, sf_dir)


def q_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: hash each band of 2 signature values to a bucket;
    docs sharing any bucket are candidate near-dups.  The self-join is
    on (band, bucket) — at 100 TB this is the only shuffle and it is
    tiny compared to all-pairs."""
    sigs = _minhash_sigs(spark, sf_dir)
    rows_per_band = N_HASHES // N_BANDS
    band_cols = []
    for b in range(N_BANDS):
        parts = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"), _md5_int(F.concat_ws("_", *parts)).alias("bucket")
            )
        )
    buckets = sigs.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def q_ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard >= 0.8 pairs via inverted shingle index
    (shuffle on shingle; candidate pairs only where shingles collide)."""
    toks = _toks()
    sh = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(_shingles(toks)).alias("shingle"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
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
    """60-bit SimHash per document: bit b is set iff the sum over
    distinct tokens of +/-1 (by token-hash bit b) weighted by term
    frequency is positive.  Entirely array expressions — shuffle-free
    fingerprinting."""
    toks = _toks()
    uniq = F.array_distinct(toks)

    def count_of(t):
        return F.size(F.filter(toks, lambda u: u == t)).cast("long")

    # per distinct token: (hash, tf) pairs
    tok_h = F.transform(uniq, lambda t: _md5_int(t))
    tok_w = F.transform(uniq, count_of)
    bit_sum = lambda b: F.aggregate(  # noqa: E731
        F.zip_with(tok_h, tok_w, lambda h, w: F.struct(h.alias("h"), w.alias("w"))),
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(F.shiftright(p["h"], b).bitwiseAND(F.lit(1)) == 1, p["w"]).otherwise(
            -p["w"]
        ),
    )
    simhash = None
    for b in range(60):
        term = F.when(bit_sum(b) > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
        simhash = term if simhash is None else simhash + term
    return (
        _docs(spark, sf_dir)
        .filter(F.size(toks) >= 1)
        .select("doc_id", simhash.alias("simhash"))
    )


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

_SIG_COLS = ",\n               ".join(
    "list_aggregate(list_transform({sh}, s -> {h}), 'min') AS h{k}".format(
        sh="shingles", h=_MD5INT.format(x=f"'{k}|' || s"), k=k
    )
    for k in range(N_HASHES)
)

_SIGS_CTE = f"""
        d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        s AS (SELECT doc_id, {_SHINGLES} AS shingles FROM d WHERE len(toks) >= 3),
        sigs AS (SELECT doc_id, {_SIG_COLS} FROM s)
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
            SELECT doc_id, 0 AS band, {_MD5INT.format(x="h0::VARCHAR || '_' || h1::VARCHAR")} AS bucket FROM sigs
            UNION ALL
            SELECT doc_id, 1 AS band, {_MD5INT.format(x="h2::VARCHAR || '_' || h3::VARCHAR")} AS bucket FROM sigs
            UNION ALL
            SELECT doc_id, 2 AS band, {_MD5INT.format(x="h4::VARCHAR || '_' || h5::VARCHAR")} AS bucket FROM sigs
            UNION ALL
            SELECT doc_id, 3 AS band, {_MD5INT.format(x="h6::VARCHAR || '_' || h7::VARCHAR")} AS bucket FROM sigs
        )
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM buckets a JOIN buckets b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    """,
    "q_ngram_jaccard_dups": f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sh AS (SELECT DISTINCT doc_id, shingle FROM (
            SELECT doc_id, unnest({_SHINGLES}) AS shingle FROM d)),
        sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        inter AS (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
            FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
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
