"""Deterministic sampling and shard-packing operators for
training-data curation.

Everything here is hash-deterministic (no RNG state, no
`F.rand()`): a row's fate depends only on its key, so runs are
reproducible across retries, engines, and cluster sizes — the property
a 100 TB curation pipeline needs for auditable data lineage.  The hash
is the same md5-derived 60-bit integer the dedup operators use
(portable to any engine with md5).

Scale notes per operator:

* ``hash_sample`` — a pure map-side filter: no shuffle, no state, and
  the predicate pushes into the scan's row-group filtering only if the
  bucket is precomputed; at 100 TB this is the cheapest possible
  sampling plan (every executor decides rows locally).
* ``sample_per_group`` — window row_number per group.  With few large
  strata the per-group sort dominates; prefilter with
  ``hash_sample`` at a rate that leaves ~4x the target k, then rank
  (documented in the docstring; the operator takes a ``prefilter``
  permille for exactly that).
* ``token_shards`` — the running token total is a prefix sum: one
  shuffle keyed by the stratum column.  Shard assignment is
  deterministic given the (stratum, order) pair, so re-running on the
  same snapshot yields identical shards — what checkpoint/resume of a
  tokenization job requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.operators.dedup import md5_int, tokens


def hash_bucket(key: Column, salt: str, n_buckets: int = 1000) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5(salt:key)."""
    return md5_int(F.concat_ws(":", F.lit(salt), key)) % n_buckets


def hash_sample(
    df: DataFrame,
    rates_permille: dict[str, int] | int,
    stratum_col: str = "lang",
    key_col: str = "doc_id",
    default_permille: int = 0,
    salt: str = "smp",
) -> DataFrame:
    """Deterministic stratified sample: keep a row iff its hash bucket
    falls below its stratum's per-mille rate.

    ``rates_permille`` is either one int (uniform sampling) or a
    {stratum_value: permille} dict (training-mixture reweighting —
    e.g. downsample a dominant language).  Rows in strata missing from
    the dict keep ``default_permille``.
    """
    bucket = hash_bucket(F.col(key_col), salt)
    if isinstance(rates_permille, int):
        rate: Column = F.lit(rates_permille)
    else:
        rate = F.lit(default_permille)
        # build the WHEN chain in sorted order for a stable plan
        for stratum, permille in sorted(rates_permille.items()):
            rate = F.when(F.col(stratum_col) == stratum, permille).otherwise(rate)
    return df.filter(bucket < rate)


def sample_per_group(
    df: DataFrame,
    k: int,
    group_col: str = "lang",
    key_col: str = "doc_id",
    salt: str = "kpg",
    prefilter_permille: int | None = None,
) -> DataFrame:
    """Uniform-without-replacement k rows per group, deterministically:
    rank rows inside each group by (hash(key), key) and keep the first
    k.  Equivalent to a seeded reservoir sample but reproducible and
    engine-portable.

    For a huge stratum, pass ``prefilter_permille`` to hash-filter
    before ranking (choose it so the expected survivors are a few times
    k): the window then sorts a small relation instead of the full
    group.  The prefilter uses a DIFFERENT salt, so it composes with
    the ranking hash without correlation.
    """
    if prefilter_permille is not None:
        df = hash_sample(
            df, prefilter_permille, group_col, key_col, salt=salt + ":pre"
        )
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key_col), salt, 1 << 60), F.col(key_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= k)
    )


def domain_quota(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    key_col: str = "doc_id",
    order_col: str = "n_chars",
    salt_buckets: int = 16,
) -> DataFrame:
    """Frequency capping: keep at most ``k`` rows per ``group_col``,
    preferring the largest ``order_col`` (ties by ``key_col``) — the
    per-domain quota every crawl-scale pipeline applies so one
    over-represented site cannot dominate the training mixture
    (C4/RefinedWeb-style source capping).  Unlike
    :func:`sample_per_group` (uniform by hash) the quota is
    QUALITY-ORDERED: capping keeps each domain's best rows.

    Returns the kept rows with ``quota_rank`` (1..k within the group,
    in the quota order).

    Scale shape: a bare per-group window funnels a mega-domain (at
    100 TB a single host can contribute billions of pages) through one
    task; this runs the top-k TWO-PHASE — rank within
    (group, hash-salt) partitions and keep k, then rank the surviving
    ``<= salt_buckets * k`` rows per group.  Phase 1 bounds any
    partition at 1/salt_buckets of the hottest domain; phase 2's
    window never sees more than salt_buckets*k rows per group.  Every
    true top-k row survives phase 1 (it is within the top k of its own
    salt bucket), so the two-phase result is identical to the naive
    window's."""
    order = [F.desc(order_col), F.col(key_col)]
    w_local = Window.partitionBy(
        group_col, hash_bucket(F.col(key_col), "quota", salt_buckets)
    ).orderBy(*order)
    survivors = (
        df.withColumn("_r", F.row_number().over(w_local))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        survivors.withColumn("quota_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("quota_rank") <= k)
    )


def global_shuffle_order(
    df: DataFrame,
    key_col: str = "doc_id",
    salt: str = "epoch:0",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic global training order: (key, position) where
    position is the rank of ``md5(salt:key)`` (ties by key) — the
    shuffle-before-packing step of a training run, reproducible across
    retries/engines/cluster sizes, re-shuffled per epoch by changing
    ``salt``.

    A naive ``row_number() OVER (ORDER BY h)`` collapses the corpus
    onto ONE task; ``zipWithIndex`` leaves the declarative plan.  This
    is the distributed two-pass enumeration instead: the top bits of
    the (uniform) hash range-bucket the rows — so bucket order IS hash
    order and buckets are balanced by construction — then per-bucket
    counts roll into cumulative offsets (a ``n_buckets``-row relation;
    its single-partition window is free), broadcast back, and
    position = offset + rank-within-bucket.  Data-sized stages: one
    groupBy and one per-bucket window sort — exactly the cost of the
    global sort the order semantically is."""
    if n_buckets & (n_buckets - 1):
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    shift = 60 - (n_buckets.bit_length() - 1)  # md5_int is uniform in [0, 2^60)
    h = md5_int(F.concat_ws(":", F.lit(salt), F.col(key_col)))
    base = df.select(F.col(key_col), h.alias("_h")).withColumn(
        "_bucket", F.shiftright(F.col("_h"), shift)
    )
    woff = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        base.groupBy("_bucket")
        .agg(F.count("*").alias("_n"))
        .withColumn("_offset", F.coalesce(F.sum("_n").over(woff), F.lit(0)))
        .select("_bucket", "_offset")
    )
    wrank = Window.partitionBy("_bucket").orderBy("_h", key_col)
    return (
        base.withColumn("_rank", F.row_number().over(wrank))
        .join(F.broadcast(offsets), "_bucket")
        .select(
            key_col,
            (F.col("_offset") + F.col("_rank") - 1).cast("long").alias("position"),
        )
    )


def sequence_pack(
    df: DataFrame,
    seq_tokens: int,
    part_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-budget sequence packing: concatenate each stratum's token
    stream in ``order_col`` order and cut it every ``seq_tokens``
    tokens, SPLITTING documents across cut points — the layout a
    training job actually feeds the model (contrast
    :func:`token_shards`, which assigns whole documents greedily and
    lets shards overhang).

    Output: one row per (document x overlapped sequence):
    (doc_id, stratum, seq_id, tok_start, tok_end) where
    [tok_start, tok_end) is the half-open token range of THIS document
    (0-based) that lands in sequence ``seq_id``.  A document spanning k
    cut points emits k+1 rows; Σ(tok_end - tok_start) == n_tokens
    exactly — packing never drops or duplicates a token.

    Plan: per-stratum prefix sum (one shuffle, same as token_shards)
    then a per-row ``sequence()`` explode over the spanned sequence
    ids — fan-out is ceil(n_tokens/seq_tokens)+1 per doc, no join, no
    second shuffle.  At 100 TB: the prefix-sum window is the only
    ordered stage; everything after is map-side.
    """
    n_tok = F.size(tokens(F.col(text_col)))
    w = (
        Window.partitionBy("stratum")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = (
        df.select(
            F.col(order_col).alias("doc_id"),
            F.col(part_col).alias("stratum"),
            n_tok.alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("off", F.col("cum") - F.col("n_tokens"))  # global start offset
    )
    first_seq = F.floor(F.col("off") / seq_tokens).cast("long")
    last_seq = F.floor((F.col("cum") - 1) / seq_tokens).cast("long")
    seqs = base.select(
        "doc_id",
        "stratum",
        "off",
        "n_tokens",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * seq_tokens
    seq_end = seq_start + seq_tokens
    return seqs.select(
        "doc_id",
        "stratum",
        "seq_id",
        F.greatest(seq_start - F.col("off"), F.lit(0).cast("long")).alias("tok_start"),
        F.least(seq_end - F.col("off"), F.col("n_tokens").cast("long")).alias("tok_end"),
    )


def token_shards(
    df: DataFrame,
    budget_tokens: int,
    part_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pack documents into training shards of ~``budget_tokens``
    whitespace tokens, per ``part_col`` stratum, in ``order_col`` order.

    A document's shard is ``floor(tokens_before_it / budget)`` — the
    shard its first token lands in; shards can overhang by at most one
    document (the standard greedy packing a tokenize-and-concat
    training job uses).  Output: (doc_id, stratum, n_tokens, shard_id).
    """
    n_tok = F.size(tokens(F.col(text_col)))
    w = (
        Window.partitionBy("stratum")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.select(
            F.col(order_col).alias("doc_id"),
            F.col(part_col).alias("stratum"),
            n_tok.alias("n_tokens"),
        )
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "stratum",
            "n_tokens",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / budget_tokens)
            .cast("long")
            .alias("shard_id"),
        )
    )


def sqrt_temperature_mixture(
    df: DataFrame,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    weight_quant: int = 1_000_000,
    salt: str = "mix",
) -> DataFrame:
    """Temperature-scaled mixture resampling at alpha = 0.5 (the
    multilingual-LM rebalancing rule: sample stratum s with probability
    proportional to p_s^alpha, downweighting dominant strata and
    upweighting rare ones — the exponentiated-rate scheme of XLM /
    mBERT-style training mixtures).  Unlike :func:`hash_sample` the
    rates are DERIVED FROM THE DATA, and rare strata get rates > 1,
    realized as whole-document repetition (epochs over the small
    stratum) plus a hash-gated fractional copy.

    Output: (key, stratum, n_copies) for every input row with
    n_copies >= 1, where Σ n_copies over a stratum ≈ q_s * N for
    q_s = sqrt(p_s) / Σ_t sqrt(p_t) — the corpus size is preserved in
    expectation while the stratum shares move toward uniform.

    Determinism design (why alpha is FIXED at 0.5): the only
    non-rational step, p^0.5, is IEEE-754 ``sqrt`` — correctly rounded
    and therefore bit-identical in every compliant engine, unlike
    ``pow`` (libm pow is not correctly rounded; Java and C disagree in
    the last ulp, which would flip a floor() and break the
    cross-engine hash gate).  sqrt(n_s/N) is quantized immediately to
    an int64 weight w_s = floor(sqrt * weight_quant); EVERYTHING after
    is exact integer arithmetic — the expected copy count
    r_s = (w_s * N) / (W * n_s) is kept as a rational: whole copies by
    integer division, the fractional remainder as a per-mille
    threshold against the row's :func:`hash_bucket`.  No FP sum ever
    crosses rows, so the result is independent of partitioning and
    reproducible by any engine with md5 + IEEE sqrt.

    Overflow bounds (int64): w_s <= weight_quant, so w_s * N needs
    N < 2^63 / weight_quant (9.2e12 rows at the default quant) and the
    remainder scaling needs W * n_s * 1000 < 2^63 — with k strata,
    n_s < 2^63 / (k * weight_quant * 1000).  For a corpus beyond that,
    drop weight_quant to 1e3; the rate granularity is still 1e-3.

    Scale shape: per-stratum counts are one small aggregation whose
    result (k rows) broadcasts back; the copy decision is then a pure
    map-side expression, and repetition is a map-side
    ``explode(sequence())`` bounded by ceil(r_s) — no shuffle touches
    the corpus itself."""
    n_s = F.col("_n_s")
    counts = df.groupBy(F.col(stratum_col).alias("_s")).agg(
        F.count("*").alias("_n_s")
    )
    n_total = counts.agg(F.sum("_n_s").alias("_N"))
    weighted = counts.crossJoin(F.broadcast(n_total)).withColumn(
        "_w_s",
        F.floor(F.sqrt(n_s / F.col("_N")) * weight_quant).cast("long"),
    )
    # integer sum of already-quantized weights: order-free
    w_total = weighted.agg(F.sum("_w_s").alias("_W"))
    rates = (
        weighted.crossJoin(F.broadcast(w_total))
        .select(
            "_s",
            (F.col("_w_s") * F.col("_N")).alias("_num"),
            (F.col("_W") * n_s).alias("_den"),
        )
        .select(
            "_s",
            # `div`, not `/`: float division loses exactness past 2^53
            # and would disagree with the oracle's integer `//`
            F.expr("_num div _den").cast("long").alias("_base"),
            F.expr("((_num % _den) * 1000) div _den")
            .cast("long")
            .alias("_rem_mille"),
        )
    )
    bucket = hash_bucket(F.col(key_col), salt)
    return (
        df.join(F.broadcast(rates), df[stratum_col] == F.col("_s"))
        .select(
            F.col(key_col).alias("key"),
            F.col(stratum_col).alias("stratum"),
            (
                F.col("_base")
                + F.when(bucket < F.col("_rem_mille"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_copies"),
        )
        .filter(F.col("n_copies") >= 1)
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    keep_frac: float = 0.25,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "dsir",
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR; Xie et al. 2023,
    arXiv:2302.03169): pick the ``keep_frac`` of a raw corpus whose
    hashed-n-gram distribution best matches a small TARGET corpus.

    Per document the log importance weight is
    sum over feature occurrences of ln(p_target[b] / p_raw[b]),
    where features are word unigrams + bigrams hashed into
    ``n_buckets`` buckets (the paper's hashed n-gram proxy) and both
    per-bucket distributions carry add-1 smoothing.  Selection is the
    paper's Gumbel-top-k resample made hash-deterministic: the Gumbel
    noise g = -ln(-ln(u)) draws u from the document's md5 bucket (the
    module-wide no-RNG rule), and a document is selected when its
    noised score clears the corpus's (1 - keep_frac) percentile.

    Cross-engine exactness: each ln() term is quantized to int64
    micro-nats BEFORE summing (the q_lm_quality recipe — integer sums
    have one correct answer regardless of partitioning), the noise is
    quantized the same way, and the percentile threshold is rounded to
    6 dp on both engines (the q_quality_gate recipe).

    Returns one row per corpus document:
    (doc_id, n_feats, log_weight, selected) with log_weight the
    unnoised importance weight in nats, rounded to 6 dp.

    Scale shape: the feature explode is map-side; the only
    corpus-sized shuffle keys (doc, bucket) — partial aggregation
    collapses it to per-doc VOCABULARY x bucket rows.  The bucket
    frequency tables are ``n_buckets`` rows (broadcast), the scoring
    join is broadcast, and the threshold is one aggregate over a
    single long column per doc (swap the exact percentile for
    approx_percentile at extreme scale; the gate's semantics do not
    change).  Nothing is quadratic; no RNG state crosses the driver.
    """
    from pyspark import StorageLevel

    from semantic_similarity_system_using_aws_mapreduce_spark.operators.dedup import word_shingles

    def feat_buckets(df: DataFrame) -> DataFrame:
        # token array materialized in its own projection first: the
        # bigram construction references it n+1 times (slices + size),
        # and Catalyst does not collapse a projection through
        # Generate — inline tokens() would re-split the text per
        # reference (the shingle_hashes discipline)
        toks = F.col("_toks")
        bigrams = F.when(F.size(toks) >= 2, word_shingles(toks, 2)).otherwise(
            F.array().cast("array<string>")
        )
        return (
            df.select(
                F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("_toks")
            )
            .select("doc_id", F.explode(F.concat(toks, bigrams)).alias("ft"))
            .select("doc_id", hash_bucket(F.col("ft"), salt, n_buckets).alias("b"))
        )

    # per-(doc, bucket) occurrence counts feed BOTH the raw frequency
    # table and the scoring join — persist so the explode runs once
    dfb = (
        feat_buckets(corpus)
        .groupBy("doc_id", "b")
        .agg(F.count("*").alias("m"))
        .persist(StorageLevel.MEMORY_AND_DISK)  # caller-owned: operators/__init__ contract
    )
    from pyspark.sql import Window

    c_raw = dfb.groupBy("b").agg(F.sum("m").alias("c_r"))
    c_tgt = feat_buckets(target).groupBy("b").agg(F.count("*").alias("c_t"))
    # Totals as UNPARTITIONED window sums over the joined bucket
    # relation (bounded at n_buckets rows, so the single window
    # partition is a constant, never the corpus) — the earlier
    # crossJoin-of-aggregates form re-executed the c_raw subplan for
    # n_r and the whole TARGET explode for n_t (profiled: ~1 s of the
    # query was those second evaluations).  FULL outer so n_t counts
    # target-only buckets exactly like the independent aggregate did;
    # ratio rows themselves keep the c_raw-bucket domain (filter).
    wall = Window.partitionBy()
    n_r = F.sum(F.coalesce(F.col("c_r"), F.lit(0))).over(wall)
    n_t = F.sum(F.coalesce(F.col("c_t"), F.lit(0))).over(wall)
    # ln(p_t[b]/p_r[b]) in int64 micro-nats; buckets unseen in the
    # target keep the smoothed floor via the coalesce
    lr = F.round(
        F.log(
            ((F.coalesce(F.col("c_t"), F.lit(0)) + 1.0) / (n_t + n_buckets))
            / ((F.col("c_r") + 1.0) / (n_r + n_buckets))
        )
        * 1_000_000,
        0,
    ).cast("long")
    ratio = (
        c_raw.join(c_tgt, "b", "full_outer")
        .select("b", "c_r", lr.alias("lr_micro"))
        .filter(F.col("c_r").isNotNull())
        .select("b", "lr_micro")
    )
    weights = (
        dfb.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("m") * F.col("lr_micro")).alias("w_micro"),
            F.sum("m").alias("n_feats"),
        )
    )
    u = (hash_bucket(F.col("doc_id"), salt + "-g", 100_000) + 0.5) / 100_000.0
    g_micro = F.round(-F.log(-F.log(u)) * 1_000_000, 0).cast("long")
    scored = (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(weights, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce(F.col("w_micro"), F.lit(0)).cast("long").alias("w_micro"),
        )
        .withColumn("score_micro", F.col("w_micro") + g_micro)
        # the percentile gate AND the final projection both consume the
        # scored relation — persist (doc_id + three longs per doc) so
        # the weights join runs once, not twice (caller-owned cache,
        # operators/__init__ contract; profiled: the second evaluation
        # was ~1.4 s of the query)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    thr = scored.agg(
        F.round(F.expr(f"percentile(score_micro, {1.0 - keep_frac})"), 6).alias("thr")
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "n_feats",
        F.round(F.col("w_micro") / 1_000_000.0, 6).alias("log_weight"),
        (F.col("score_micro") >= F.col("thr")).alias("selected"),
    )


# The ONE train/val/test split rule (per-mille md5 buckets of a
# grouping key).  Both q_leakage_safe_split and the curation CLI
# consume these — retuning either constant or the salt in one place
# keeps the CLI's splits and the verified query in lockstep.
SPLIT_TRAIN_PERMILLE = 800
SPLIT_VAL_PERMILLE = 900
SPLIT_SALT = "split"


def cluster_split(group_col: Column) -> Column:
    """'train' / 'val' / 'test' from the md5 bucket of ``group_col``.
    Pass the dedup-CLUSTER representative (not the doc id) so near-
    duplicate members can never straddle splits — the leakage guard
    q_leakage_safe_split verifies."""
    b = hash_bucket(group_col, SPLIT_SALT)
    return (
        F.when(b < SPLIT_TRAIN_PERMILLE, "train")
        .when(b < SPLIT_VAL_PERMILLE, "val")
        .otherwise("test")
    )


def bottomk_sample(
    df: DataFrame, key_col: str, k: int = 256, salt: str = "qsk"
) -> DataFrame:
    """The k rows whose salted md5 key-hash is SMALLEST — a
    deterministic uniform sample with bounded state (the KMV idea
    pointed at rows instead of distinct counts).  MERGEABLE exactly:
    bottom-k of a union == bottom-k of the per-shard bottom-k union,
    so shards, partitions, and streaming micro-batches fold without
    approximation drift — and because the hash (not a RNG) picks the
    sample, two engines select the IDENTICAL rows.

    Scale shape: the per-partition sort is a TopK (k rows of state per
    task, partial across partitions), never a full sort; the sample
    relation that leaves the scan is k rows regardless of corpus
    size."""
    h = md5_int(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string")))
    # key tiebreak: md5 collisions are ~impossible at 60 bits, but a
    # deterministic total order costs nothing and removes the "~"
    return (
        df.withColumn("_h", h).orderBy("_h", key_col).limit(k).drop("_h")
    )


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    key_col: str,
    probs: list[float],
    k: int = 256,
    salt: str = "qsk",
) -> DataFrame:
    """(prob, estimate) quantile estimates from a :func:`bottomk_sample`
    — O(1/sqrt(k)) rank error with k rows of state, vs. a full sort
    for exact quantiles.  The estimate is the exact interpolated
    percentile OF THE SAMPLE, so given the same keys it is
    bit-deterministic across engines and runs (unlike reservoir or
    RNG sampling) and the whole relation hash-verifies."""
    sample = bottomk_sample(df.select(key_col, value_col), key_col, k, salt)
    rows = [
        F.struct(
            F.lit(p).alias("prob"),
            F.percentile(F.col(value_col), F.lit(p)).alias("estimate"),
        )
        for p in probs
    ]
    return (
        sample.agg(F.array(*rows).alias("qs"))
        .select(F.explode("qs").alias("q"))
        .select("q.prob", "q.estimate")
    )
