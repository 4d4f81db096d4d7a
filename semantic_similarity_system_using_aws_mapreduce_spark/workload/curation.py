"""Training-data curation workload: deterministic sampling, shard
packing, and the end-to-end quality/dedup funnel — the operations that
turn a raw 100 TB crawl into a training corpus.

All four queries are hash-deterministic (operators/sampling.py's
md5-bucket design), so the DuckDB oracles reproduce them bit-for-bit:
sampling decisions, shard boundaries, and dedup survivors never depend
on partitioning, parallelism, or RNG state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import (
    domain_quota,
    dsir_select,
    global_shuffle_order,
    hash_bucket,
    hash_sample,
    sample_per_group,
    sequence_pack,
    sqrt_temperature_mixture,
    token_shards,
)

# Training-mixture rates: downsample dominant English, keep rarer
# languages at higher rates (per-mille of each stratum).
MIX_RATES = {"en": 400, "de": 800, "es": 800, "fr": 800, "zh": 800}
SAMPLE_K = 20
QUOTA_K = 10
SHARD_BUDGET = 2048
MIN_TOKENS = 24
MIN_TTR = 0.35
# DSIR: a deterministic 5% of documents play the high-quality target
# domain; the raw remainder is scored and the top quarter selected.
DSIR_TARGET_PERMILLE = 50
DSIR_BUCKETS = 256
DSIR_KEEP = 0.25


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language mixture sampling — a pure map-side
    filter (no shuffle, no RNG): keep iff md5('smp:'||doc_id)%1000
    falls under the language's per-mille rate."""
    return hash_sample(_docs(spark, sf_dir), MIX_RATES, "lang", "doc_id").select(
        "doc_id", "lang", "source"
    )


def q_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-language uniform sample (hash-ordered
    row_number inside each stratum)."""
    out = sample_per_group(_docs(spark, sf_dir), SAMPLE_K, "lang", "doc_id")
    return out.select("doc_id", "lang", "sample_rank")


def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain frequency capping (operators/sampling.domain_quota):
    keep each source's {QUOTA_K} largest documents — quality-ordered
    capping so one over-represented crawl host cannot dominate the
    mixture.  Two-phase salted top-k; identical rows to the naive
    per-source window."""
    out = domain_quota(_docs(spark, sf_dir), QUOTA_K, "source", "doc_id", "n_chars")
    return out.select("doc_id", "source", "n_chars", "quota_rank")


def q_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget shard packing per language (prefix sum over
    doc order; one shuffle keyed by lang)."""
    return token_shards(_docs(spark, sf_dir), SHARD_BUDGET, "lang", "doc_id")


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-budget sequence packing (operators/sampling.sequence_pack):
    the per-stratum token stream cut every {SHARD_BUDGET} tokens with
    documents SPLIT across cut points — one row per (doc x sequence)
    with the half-open token range that lands in that sequence.  The
    layout a training job feeds the model; token-conservation
    (Σ ranges == doc tokens) is part of the oracle check."""
    return sequence_pack(_docs(spark, sf_dir), SHARD_BUDGET, "lang", "doc_id")


def q_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch shuffle: every document's global training
    position = rank of md5('epoch:0:'||doc_id) — reproducible across
    retries/engines/cluster sizes, re-drawn per epoch via the salt.
    Distributed two-pass enumeration (hash-prefix range buckets +
    offset rollup), never a one-task global window — see
    operators/sampling.global_shuffle_order."""
    return global_shuffle_order(_docs(spark, sf_dir), "doc_id", salt="epoch:0")


def q_source_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language rebalancing at alpha = 0.5 with
    DATA-DERIVED rates (contrast q_stratified_sample's static
    per-mille table): stratum share moves from p_s toward
    sqrt(p_s)/Σsqrt — the multilingual-LM mixture rule — with rare
    strata UPSAMPLED via whole-document repetition (n_copies > 1).
    Integer-exact end to end (IEEE sqrt is the only FP step, quantized
    immediately), so the oracle reproduces every copy decision; see
    operators/sampling.sqrt_temperature_mixture."""
    out = sqrt_temperature_mixture(_docs(spark, sf_dir), "lang", "doc_id")
    return out.select(F.col("key").alias("doc_id"), F.col("stratum").alias("lang"), "n_copies")


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation funnel, one row per language:

        raw docs -> quality gate (min tokens, min type-token ratio)
                 -> exact-dedup survivors (min doc_id per content md5)
                 -> per-language counts + kept-token stats

    Composes the quality operators (q_doc_quality's statistics), exact
    dedup (same survivor rule as q_exact_dedup), and grouped reporting
    in a single declarative plan — the shape of a real ingest audit.
    """
    from semantic_similarity_system_using_aws_mapreduce_spark.workload.text import _tokens_col

    flagged = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", "text", _tokens_col().alias("toks"))
        .select(
            "doc_id",
            "lang",
            "text",
            F.size("toks").alias("n_tokens"),
            (F.size(F.array_distinct("toks")) / F.size("toks")).alias("ttr"),
        )
        .withColumn(
            "is_kept",
            (F.col("n_tokens") >= MIN_TOKENS) & (F.col("ttr") >= MIN_TTR),
        )
    )
    # Survivor = first kept doc per content digest.  Partitioning the
    # window by (digest, is_kept) ranks kept docs among themselves, so
    # the whole funnel is ONE scan -> one window shuffle (by digest) ->
    # one aggregation shuffle (by lang) — no re-scan per funnel stage.
    w = Window.partitionBy(F.md5("text"), "is_kept").orderBy("doc_id")
    flagged = flagged.withColumn(
        "is_surv", F.col("is_kept") & (F.row_number().over(w) == 1)
    )
    kept_long = F.col("is_kept").cast("long")
    surv_long = F.col("is_surv").cast("long")
    return flagged.groupBy("lang").agg(
        F.count("*").alias("n_raw"),
        F.sum(kept_long).alias("n_quality"),
        F.sum(surv_long).alias("n_kept"),
        F.coalesce(
            F.sum(F.when(F.col("is_surv"), F.col("n_tokens"))), F.lit(0)
        ).alias("kept_tokens"),
        F.round(F.avg(F.when(F.col("is_surv"), F.col("n_tokens"))), 6).alias(
            "avg_tokens"
        ),
        F.round(F.sum(surv_long) / F.count("*"), 6).alias("keep_rate"),
    )


def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative quality gate: per language, drop documents whose
    type-token ratio sits below that language's 25th percentile.

    The threshold is an exact interpolated percentile per group
    (sort-based aggregate, one shuffle on lang), broadcast back onto
    the scored scan — the second pass is map-side.  Thresholds are
    rounded to 6 dp on BOTH engines before comparing so borderline
    membership can't flip on a last-ulp interpolation difference."""
    from semantic_similarity_system_using_aws_mapreduce_spark.workload.text import _tokens_col

    scored = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", _tokens_col().alias("toks"))
        .select(
            "doc_id",
            "lang",
            (F.size(F.array_distinct("toks")) / F.size("toks")).alias("ttr"),
        )
    )
    thr = scored.groupBy("lang").agg(
        F.round(F.expr("percentile(ttr, 0.25)"), 6).alias("p25_ttr")
    )
    return (
        scored.join(F.broadcast(thr), "lang")
        .groupBy("lang", "p25_ttr")
        .agg(
            F.count_if(F.col("ttr") >= F.col("p25_ttr")).alias("n_kept"),
            F.count_if(F.col("ttr") < F.col("p25_ttr")).alias("n_dropped"),
        )
        .select("lang", "p25_ttr", "n_kept", "n_dropped")
    )


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization + PII scrub per document: lowercase, drop English
    stopwords, redact emails / IPv4s / phone numbers, and report the
    per-kind match counts plus a digest of the cleaned text.

    Scale design: entirely map-side (split/filter/array_join + a chain
    of codegen'd regexp_replace) — no shuffle, no UDF; the digest lets
    a downstream dedup run on normalized content.  The PII patterns are
    RE2-compatible so the DuckDB oracle hash-verifies the exact
    replacement semantics, not just counts.
    """
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import (
        LANG_PROFILES,
        pii_counts,
        redact_pii,
    )

    stop_arr = F.array(*[F.lit(s) for s in LANG_PROFILES["en"]])
    kept = F.filter(
        F.split(F.lower(F.col("text")), " "),
        lambda t: (t != "") & ~F.array_contains(stop_arr, t),
    )
    counts = pii_counts(F.col("text"))
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "text", kept.alias("__kept"))
        .select(
            "doc_id",
            F.size("__kept").alias("n_tokens_kept"),
            counts["n_email"].alias("n_email"),
            counts["n_ipv4"].alias("n_ipv4"),
            counts["n_phone"].alias("n_phone"),
            F.md5(redact_pii(F.array_join("__kept", " "))).alias("clean_hash"),
        )
    )


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): a deterministic
    {DSIR_TARGET_PERMILLE}-per-mille slice of documents plays the
    high-quality target domain; every remaining document is scored by
    its hashed-unigram+bigram log importance weight against that
    target and the top {DSIR_KEEP:.0%} (by Gumbel-noised score, noise
    hash-derived) is selected.  All log terms are int64 micro-nat
    quantized and the percentile threshold is 6-dp rounded on both
    engines, so the oracle reproduces the selection bit-for-bit
    (operators/sampling.dsir_select for the 100 TB shape)."""
    # spread_small_scan: the unigram+bigram feature explode is the
    # expansion-heavy shape that beats the extra round-robin exchange
    # (same-session interleaved A/B at sf0.1: 5.2 vs 7.0 s best, every
    # rep faster); int64 micro-nat sums keep the hash order-free
    from semantic_similarity_system_using_aws_mapreduce_spark.sources.tables import spread_small_scan

    docs = spread_small_scan(_docs(spark, sf_dir))
    is_t = hash_bucket(F.col("doc_id"), "dsir-t") < DSIR_TARGET_PERMILLE
    return dsir_select(
        docs.filter(~is_t),
        docs.filter(is_t),
        keep_frac=DSIR_KEEP,
        n_buckets=DSIR_BUCKETS,
    )


def q_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus data card: the per-(source, lang) + per-source + overall
    summary a dataset release ships — doc counts, token volume, and
    mean type-token ratio — in ONE grouping-sets pass (one Expand +
    one aggregation; no re-scan per level).  The TTR mean follows the
    engine's float-determinism recipe: each ratio is quantized to
    int64 micro-units BEFORE the sum, so the group mean has one
    cross-engine answer at any partitioning."""
    toks = F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    ttr_micro = F.round(
        F.size(F.array_distinct("_toks")) / F.size("_toks") * 1_000_000, 0
    ).cast("long")
    (
        _docs(spark, sf_dir)
        .select("source", "lang", toks.alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select("source", "lang", F.size("_toks").alias("_n"), ttr_micro.alias("_q"))
        .createOrReplaceTempView("docs_card")
    )
    return spark.sql(
        """
        SELECT coalesce(source, 'ALL') AS source,
               coalesce(lang, 'ALL') AS lang,
               count(*) AS n_docs,
               sum(_n) AS n_tokens,
               round(sum(_q) / count(*) / 1000000.0, 6) AS avg_ttr
        FROM docs_card
        GROUP BY GROUPING SETS ((source, lang), (source), ())
        """
    )


QUERIES = {
    "q_data_card": q_data_card,
    "q_dsir_select": q_dsir_select,
    "q_training_order": q_training_order,
    "q_sequence_packing": q_sequence_packing,
    "q_pii_redaction": q_pii_redaction,
    "q_quality_gate": q_quality_gate,
    "q_stratified_sample": q_stratified_sample,
    "q_sample_per_group": q_sample_per_group,
    "q_domain_quota": q_domain_quota,
    "q_token_shards": q_token_shards,
    "q_curation_funnel": q_curation_funnel,
    "q_source_mixture": q_source_mixture,
}

_MD5INT = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
_TOKS = "list_filter(string_split(text, ' '), t -> t <> '')"

from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import (  # noqa: E402
    LANG_PROFILES,
    PII_PATTERNS,
)

_STOP_LIST = ", ".join(f"'{w}'" for w in LANG_PROFILES["en"])
_KEPT = (
    "list_filter(string_split(lower(text), ' '), "
    f"t -> t <> '' AND NOT list_contains([{_STOP_LIST}], t))"
)
# Same replacement order as redact_pii: email, then ipv4, then phone.
_REDACTED = "array_to_string(kept, ' ')"
for _, _pat, _rep in PII_PATTERNS:
    _REDACTED = f"regexp_replace({_REDACTED}, '{_pat}', '{_rep}', 'g')"
_PII_COUNT_COLS = ",\n               ".join(
    f"len(regexp_extract_all(text, '{pat}'))::INT AS n_{kind}"
    for kind, pat, _ in PII_PATTERNS
)

_RATE_CASE = "CASE " + " ".join(
    f"WHEN lang = '{lang}' THEN {permille}" for lang, permille in sorted(MIX_RATES.items())
) + " ELSE 0 END"

ORACLES = {
    "q_data_card": f"""
        WITH d AS (SELECT source, lang, {_TOKS} AS toks FROM documents),
        s AS (SELECT source, lang, len(toks) AS _n,
                     CAST(round(len(list_distinct(toks)) * 1.0 / len(toks)
                                * 1000000, 0) AS BIGINT) AS _q
              FROM d WHERE len(toks) > 0)
        SELECT coalesce(source, 'ALL') AS source,
               coalesce(lang, 'ALL') AS lang,
               count(*)::BIGINT AS n_docs,
               sum(_n)::BIGINT AS n_tokens,
               round(sum(_q) * 1.0 / count(*) / 1000000.0, 6) AS avg_ttr
        FROM s
        GROUP BY GROUPING SETS ((source, lang), (source), ())
    """,
    "q_dsir_select": f"""
        WITH d AS (SELECT doc_id, {_TOKS} AS toks,
                          {_MD5INT.format(x="'dsir-t:' || doc_id")} % 1000
                              < {DSIR_TARGET_PERMILLE} AS is_t
                   FROM documents),
        feats AS (SELECT doc_id, is_t,
                         unnest(toks || list_transform(
                             range(1, len(toks)),
                             i -> toks[i] || ' ' || toks[i + 1])) AS ft
                  FROM d),
        fb AS (SELECT doc_id, is_t,
                      {_MD5INT.format(x="'dsir:' || ft")} % {DSIR_BUCKETS} AS b
               FROM feats),
        dfb AS (SELECT doc_id, b, count(*)::BIGINT AS m
                FROM fb WHERE NOT is_t GROUP BY 1, 2),
        cr AS (SELECT b, sum(m)::BIGINT AS c_r FROM dfb GROUP BY b),
        ctg AS (SELECT b, count(*)::BIGINT AS c_t FROM fb WHERE is_t GROUP BY b),
        nr AS (SELECT sum(c_r)::BIGINT AS n_r FROM cr),
        nt AS (SELECT count(*)::BIGINT AS n_t FROM fb WHERE is_t),
        ratio AS (SELECT b,
                         CAST(round(ln(((coalesce(c_t, 0) + 1.0) / (n_t + {DSIR_BUCKETS}))
                                       / ((c_r + 1.0) / (n_r + {DSIR_BUCKETS})))
                                    * 1000000, 0) AS BIGINT) AS lr_micro
                  FROM cr LEFT JOIN ctg USING (b) CROSS JOIN nr CROSS JOIN nt),
        w AS (SELECT doc_id, sum(m * lr_micro)::BIGINT AS w_micro,
                     sum(m)::BIGINT AS n_feats
              FROM dfb JOIN ratio USING (b) GROUP BY doc_id),
        scored AS (SELECT d.doc_id,
                          coalesce(w.n_feats, 0)::BIGINT AS n_feats,
                          coalesce(w.w_micro, 0)::BIGINT AS w_micro,
                          coalesce(w.w_micro, 0)::BIGINT
                          + CAST(round(-ln(-ln(
                                ({_MD5INT.format(x="'dsir-g:' || d.doc_id")} % 100000 + 0.5)
                                / 100000.0)) * 1000000, 0) AS BIGINT) AS score_micro
                   FROM d LEFT JOIN w ON w.doc_id = d.doc_id
                   WHERE NOT d.is_t),
        thr AS (SELECT round(quantile_cont(score_micro, {1.0 - DSIR_KEEP}), 6) AS t
                FROM scored)
        SELECT scored.doc_id, n_feats,
               round(w_micro / 1000000.0, 6) AS log_weight,
               score_micro >= t AS selected
        FROM scored CROSS JOIN thr
    """,
    "q_training_order": f"""
        WITH h AS (SELECT doc_id,
                          {_MD5INT.format(x="'epoch:0:' || doc_id")} AS h
                   FROM documents)
        SELECT doc_id,
               (row_number() OVER (ORDER BY h, doc_id) - 1)::BIGINT AS position
        FROM h
    """,
    "q_sequence_packing": f"""
        WITH d AS (SELECT doc_id, lang AS stratum,
                          len({_TOKS})::BIGINT AS n_tokens
                   FROM documents),
        c AS (SELECT *, CAST(sum(n_tokens) OVER (
                  PARTITION BY stratum ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
              FROM d WHERE n_tokens > 0),
        spans AS (SELECT doc_id, stratum, n_tokens,
                         cum - n_tokens AS off,
                         unnest(range(CAST(floor((cum - n_tokens) * 1.0 / {SHARD_BUDGET}) AS BIGINT),
                                      CAST(floor((cum - 1) * 1.0 / {SHARD_BUDGET}) AS BIGINT) + 1)) AS seq_id
                  FROM c)
        SELECT doc_id, stratum, seq_id,
               greatest(seq_id * {SHARD_BUDGET} - off, 0) AS tok_start,
               least((seq_id + 1) * {SHARD_BUDGET} - off, n_tokens) AS tok_end
        FROM spans
    """,
    "q_pii_redaction": f"""
        WITH d AS (SELECT doc_id, text, {_KEPT} AS kept FROM documents)
        SELECT doc_id,
               len(kept)::INT AS n_tokens_kept,
               {_PII_COUNT_COLS},
               md5({_REDACTED}) AS clean_hash
        FROM d
    """,
    "q_quality_gate": f"""
        WITH scored AS (
            SELECT doc_id, lang,
                   len(list_distinct(toks)) * 1.0 / len(toks) AS ttr
            FROM (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)),
        thr AS (
            SELECT lang, round(quantile_cont(ttr, 0.25), 6) AS p25_ttr
            FROM scored GROUP BY lang)
        SELECT lang, p25_ttr,
               count(*) FILTER (WHERE ttr >= p25_ttr) AS n_kept,
               count(*) FILTER (WHERE ttr < p25_ttr) AS n_dropped
        FROM scored JOIN thr USING (lang)
        GROUP BY lang, p25_ttr
    """,
    "q_stratified_sample": f"""
        SELECT doc_id, lang, source FROM documents
        WHERE {_MD5INT.format(x="'smp:' || doc_id")} % 1000 < {_RATE_CASE}
    """,
    "q_sample_per_group": f"""
        WITH ranked AS (
            SELECT doc_id, lang,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY {_MD5INT.format(x="'kpg:' || doc_id")}
                                % {1 << 60}, doc_id) AS sample_rank
            FROM documents)
        SELECT doc_id, lang, sample_rank FROM ranked
        WHERE sample_rank <= {SAMPLE_K}
    """,
    "q_domain_quota": f"""
        WITH ranked AS (
            SELECT doc_id, source, n_chars,
                   row_number() OVER (
                       PARTITION BY source
                       ORDER BY n_chars DESC, doc_id) AS quota_rank
            FROM documents)
        SELECT doc_id, source, n_chars, quota_rank FROM ranked
        WHERE quota_rank <= {QUOTA_K}
    """,
    "q_token_shards": f"""
        WITH d AS (SELECT doc_id, lang AS stratum,
                          len({_TOKS})::INT AS n_tokens
                   FROM documents),
        c AS (SELECT *, sum(n_tokens) OVER (
                  PARTITION BY stratum ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM d)
        SELECT doc_id, stratum, n_tokens,
               CAST(floor((cum - n_tokens) * 1.0 / {SHARD_BUDGET}) AS BIGINT) AS shard_id
        FROM c
    """,
    "q_curation_funnel": f"""
        WITH t AS (SELECT doc_id, lang, text,
                          len({_TOKS})::INT AS n_tokens,
                          len(list_distinct({_TOKS})) * 1.0 / len({_TOKS}) AS ttr
                   FROM documents),
        kept AS (SELECT * FROM t
                 WHERE n_tokens >= {MIN_TOKENS} AND ttr >= {MIN_TTR}),
        surv AS (SELECT * FROM (
                     SELECT *, row_number() OVER (
                         PARTITION BY md5(text) ORDER BY doc_id) AS rn
                     FROM kept) WHERE rn = 1),
        total AS (SELECT lang, count(*)::BIGINT AS n_raw FROM t GROUP BY lang),
        kq AS (SELECT lang, count(*)::BIGINT AS n_quality FROM kept GROUP BY lang),
        ss AS (SELECT lang, count(*)::BIGINT AS n_kept,
                      sum(n_tokens)::BIGINT AS kept_tokens,
                      round(avg(n_tokens), 6) AS avg_tokens
               FROM surv GROUP BY lang)
        SELECT total.lang, n_raw,
               coalesce(n_quality, 0) AS n_quality,
               coalesce(n_kept, 0) AS n_kept,
               coalesce(kept_tokens, 0) AS kept_tokens,
               avg_tokens,
               round(coalesce(n_kept, 0) * 1.0 / n_raw, 6) AS keep_rate
        FROM total
        LEFT JOIN kq USING (lang)
        LEFT JOIN ss USING (lang)
    """,
    # Mirrors sqrt_temperature_mixture's integer-exact derivation:
    # sqrt is IEEE-correctly-rounded (bit-identical cross-engine),
    # quantized to int64 immediately; everything downstream is integer
    # division/remainder, so every copy decision reproduces exactly.
    # Casts: DuckDB widens sum() to HUGEINT — ::BIGINT keeps the
    # arithmetic (and the driver's type-sensitive hash) in int64.
    "q_source_mixture": """
        WITH c AS (SELECT lang AS s, count(*)::BIGINT AS n_s
                   FROM documents GROUP BY lang),
        t AS (SELECT CAST(sum(n_s) AS BIGINT) AS N FROM c),
        w AS (SELECT s, n_s, N,
                     CAST(floor(sqrt(n_s::DOUBLE / N) * 1000000) AS BIGINT) AS w_s
              FROM c, t),
        wt AS (SELECT CAST(sum(w_s) AS BIGINT) AS W FROM w),
        r AS (SELECT s, (w_s * N) AS num, (W * n_s) AS den FROM w, wt),
        rr AS (SELECT s, num // den AS base,
                      ((num % den) * 1000) // den AS rem_mille
               FROM r)
        SELECT doc_id, lang,
               CAST(base + CASE WHEN ('0x' || substr(md5('mix:' || doc_id), 1, 15))::BIGINT
                                     % 1000 < rem_mille
                           THEN 1 ELSE 0 END AS BIGINT) AS n_copies
        FROM documents d JOIN rr ON d.lang = rr.s
        WHERE base + CASE WHEN ('0x' || substr(md5('mix:' || doc_id), 1, 15))::BIGINT
                               % 1000 < rem_mille
                     THEN 1 ELSE 0 END >= 1
    """,
}
