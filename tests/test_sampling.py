"""Unit tests for the deterministic sampling / shard-packing operators
(operators/sampling.py).  Oracle equality for the workload queries is
covered by test_entry_queries.py; these tests pin the operator-level
contracts: determinism, stratification, rank bounds, and packing
arithmetic."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import (
    hash_sample,
    sample_per_group,
    token_shards,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, "en" if i % 2 == 0 else "de", " ".join(f"w{j}" for j in range(5 + i % 7)))
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_hash_sample_deterministic_and_stratified(docs):
    rates = {"en": 500, "de": 100}
    a = sorted(r.doc_id for r in hash_sample(docs, rates).collect())
    b = sorted(r.doc_id for r in hash_sample(docs, rates).collect())
    assert a == b and len(a) > 0
    by_lang = {
        r.lang: r.n
        for r in hash_sample(docs, rates).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # 100 docs per stratum: en keeps ~50, de ~10 — must differ materially
    assert by_lang.get("en", 0) > by_lang.get("de", 0)


def test_hash_sample_uniform_rate_and_default(docs):
    assert hash_sample(docs, 1000).count() == 200
    assert hash_sample(docs, 0).count() == 0
    # missing stratum falls back to default_permille
    assert hash_sample(docs, {"en": 1000}, default_permille=0).count() == 100


def test_sample_per_group_rank_bounds(docs):
    out = sample_per_group(docs, 7, "lang", "doc_id").collect()
    per = {}
    for r in out:
        per.setdefault(r.lang, []).append(r.sample_rank)
    assert set(per) == {"en", "de"}
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, 8))
    again = sample_per_group(docs, 7, "lang", "doc_id").collect()
    assert {(r.doc_id, r.sample_rank) for r in again} == {
        (r.doc_id, r.sample_rank) for r in out
    }


def test_sample_per_group_prefilter_still_k(docs):
    # prefilter keeps ~half of each stratum, still >> k=5
    out = sample_per_group(docs, 5, "lang", "doc_id", prefilter_permille=500)
    per = (
        out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    )
    assert all(r.n == 5 for r in per)


def test_token_shards_packing(spark):
    # 6 docs x 10 tokens, budget 25 -> starts at 0,10,20,30,40,50 ->
    # shards 0,0,0,1,1,2
    rows = [(i, "en", " ".join(["t"] * 10)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r.doc_id: r.shard_id for r in token_shards(df, 25).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 2}


def test_token_shards_per_stratum_reset(spark):
    rows = [(i, "en" if i < 3 else "de", " ".join(["t"] * 10)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = token_shards(df, 15)
    # each stratum starts its own shard 0
    firsts = {
        r.stratum: r.shard_id
        for r in out.filter(F.col("doc_id").isin(0, 3)).collect()
    }
    assert firsts == {"en": 0, "de": 0}


def test_write_training_shards_layout_contract(docs, tmp_path):
    """The physical shard sink: one parquet file per (stratum, shard)
    directory, lossless round trip, manifest arithmetic consistent
    with the logical packing."""
    from semantic_similarity_system_using_aws_mapreduce_spark.sources.sinks import write_training_shards

    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, budget_tokens=50).cache()

    back = docs.sparkSession.read.parquet(path)
    assert back.count() == docs.count()
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )

    # exactly one data file per shard directory
    import glob
    import os

    shard_dirs = glob.glob(os.path.join(path, "stratum=*", "shard_id=*"))
    assert len(shard_dirs) == manifest.count() > 2
    for d in shard_dirs:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, d

    # manifest matches the logical packing: every shard except a
    # stratum's last holds >= budget - (max doc len - 1) tokens and
    # overhangs by at most one document
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import token_shards

    logical = token_shards(docs, 50)
    lm = {
        (r.stratum, r.shard_id): r.n
        for r in logical.groupBy("stratum", "shard_id").agg(F.count("*").alias("n")).collect()
    }
    pm = {(r.stratum, r.shard_id): r.n_docs for r in manifest.collect()}
    assert lm == pm
    manifest.unpersist()


def test_sequence_pack_conserves_tokens_and_fills_sequences(docs):
    """sequence_pack contracts: (a) every token of every doc lands in
    exactly one sequence segment; (b) within a stratum, every sequence
    except the last holds exactly seq_tokens tokens; (c) segments of a
    doc are contiguous ranges in consecutive sequences."""
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import sequence_pack

    seq = sequence_pack(docs, 64).toPandas()
    toks = {
        r.doc_id: r.n
        for r in docs.selectExpr(
            "doc_id", "size(filter(split(text, ' '), t -> t != '')) AS n"
        ).collect()
    }
    # (a) conservation per doc
    got = seq.assign(n=seq.tok_end - seq.tok_start).groupby("doc_id")["n"].sum()
    assert all(got[d] == toks[d] for d in got.index)
    # (b) full sequences except each stratum's last
    per_seq = seq.assign(n=seq.tok_end - seq.tok_start).groupby(["stratum", "seq_id"])["n"].sum()
    for stratum in seq.stratum.unique():
        sizes = per_seq[stratum].sort_index()
        assert (sizes.iloc[:-1] == 64).all(), sizes
        assert 0 < sizes.iloc[-1] <= 64
    # (c) a multi-sequence doc's segments occupy consecutive seq_ids
    multi = seq.groupby("doc_id").filter(lambda g: len(g) > 1)
    for _, g in multi.groupby("doc_id"):
        ids = sorted(g.seq_id)
        assert ids == list(range(ids[0], ids[0] + len(ids)))


def test_global_shuffle_order_is_the_hash_rank_permutation(spark):
    """The distributed two-pass enumeration must equal the naive
    one-task global rank exactly, positions must be a permutation of
    0..n-1, and a different epoch salt must produce a different
    permutation (while both stay deterministic)."""
    import pytest as _pytest
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from semantic_similarity_system_using_aws_mapreduce_spark.operators.dedup import md5_int
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import global_shuffle_order

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {r.doc_id: r.position for r in global_shuffle_order(docs, "doc_id").collect()}
    n = docs.count()
    assert sorted(got.values()) == list(range(n))

    h = md5_int(F.concat_ws(":", F.lit("epoch:0"), F.col("doc_id")))
    naive = {
        r.doc_id: r.p
        for r in docs.select(
            "doc_id",
            (F.row_number().over(Window.orderBy(h, "doc_id")) - 1).alias("p"),
        ).collect()
    }
    assert got == naive

    epoch1 = {
        r.doc_id: r.position
        for r in global_shuffle_order(docs, "doc_id", salt="epoch:1").collect()
    }
    assert sorted(epoch1.values()) == list(range(n))
    assert epoch1 != got

    with _pytest.raises(ValueError):
        global_shuffle_order(docs, "doc_id", n_buckets=48)


def test_sqrt_temperature_mixture_rebalances_toward_uniform(spark):
    """alpha=0.5 mixture: dominant stratum downsampled, rare stratum
    upsampled via n_copies > 1, total size preserved within the
    per-mille hash-gate tolerance, and the result is deterministic."""
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import sqrt_temperature_mixture

    # 900 'big' vs 100 'small': p = (0.9, 0.1) -> q = (0.75, 0.25),
    # so expected copies/doc are 0.833 (big) and 2.5 (small)
    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    out = sqrt_temperature_mixture(df, "src", "doc_id")
    per = {
        r.stratum: (r.n_rows, r.n_copies)
        for r in out.groupBy("stratum")
        .agg(F.count("*").alias("n_rows"), F.sum("n_copies").alias("n_copies"))
        .collect()
    }
    big_rows, big_copies = per["big"]
    small_rows, small_copies = per["small"]
    # directions: big strictly downsampled, small strictly upsampled
    assert big_copies < 900 and small_copies > 100
    # every small doc survives (rate > 1 keeps all), with repetition
    assert small_rows == 100 and small_copies >= 200
    # expected totals within per-mille granularity: 750 and 250
    assert abs(big_copies - 750) <= 25
    assert abs(small_copies - 250) <= 25
    # corpus size preserved in expectation
    total = big_copies + small_copies
    assert abs(total - 1000) <= 50

    again = sqrt_temperature_mixture(df, "src", "doc_id")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))

    # n_copies >= 1 for every emitted row
    assert out.filter(F.col("n_copies") < 1).count() == 0


def test_scrub_spans_conserves_tokens_property(spark):
    """Property over random corpora: for every doc,
    n_tokens - n_removed == token count of the scrubbed text, removed
    positions are a subset of [0, n_tokens), and a corpus with no
    cross-document repeats scrubs nothing."""
    import random

    from semantic_similarity_system_using_aws_mapreduce_spark.operators.dedup import duplicate_spans, scrub_spans

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]  # tiny vocab -> natural repeats
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 40))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    w = 5
    out = scrub_spans(df, duplicate_spans(df, window=w), window=w).collect()
    assert len(out) == 60
    for r in out:
        kept = [t for t in r.scrubbed.split(" ") if t]
        assert r.n_tokens - r.n_removed == len(kept), r.doc_id
        assert 0 <= r.n_removed <= r.n_tokens

    # all-unique corpus: nothing flagged, text round-trips exactly
    uniq = [(i, " ".join(f"u{i}_{j}" for j in range(10))) for i in range(10)]
    udf_ = spark.createDataFrame(uniq, "doc_id long, text string")
    uout = {r.doc_id: r for r in scrub_spans(udf_, duplicate_spans(udf_, window=w), window=w).collect()}
    for i, text in uniq:
        assert uout[i].n_removed == 0 and uout[i].scrubbed == text


def test_sqrt_temperature_mixture_single_stratum_identity(spark):
    """With one stratum the mixture is the identity: every doc exactly
    once (q_s = 1, r = N/n_s = 1)."""
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import sqrt_temperature_mixture

    df = spark.createDataFrame([(i, "only") for i in range(100)], "doc_id long, src string")
    out = sqrt_temperature_mixture(df, "src", "doc_id").collect()
    assert len(out) == 100
    assert all(r.n_copies == 1 for r in out)


def test_dsir_select_prefers_target_like_documents(spark):
    """DSIR contract: raw docs sharing the target's vocabulary carry a
    higher log importance weight than vocabulary-disjoint docs, the
    selection keeps ~keep_frac of the corpus, and the whole pipeline is
    hash-deterministic (two runs agree row-for-row)."""
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import dsir_select

    target = spark.createDataFrame(
        [(1000 + i, "alpha beta gamma delta epsilon zeta") for i in range(10)],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        # 30 target-like docs, 90 off-domain docs
        [(i, "alpha beta gamma delta") for i in range(30)]
        + [(100 + i, f"noise{i} filler{i} junk{i} blob{i}") for i in range(90)],
        "doc_id long, text string",
    )
    out = dsir_select(corpus, target, keep_frac=0.25).collect()
    assert len(out) == 120
    by_id = {r.doc_id: r for r in out}
    w_like = [by_id[i].log_weight for i in range(30)]
    w_off = [by_id[100 + i].log_weight for i in range(90)]
    assert min(w_like) > max(w_off)
    n_sel = sum(1 for r in out if r.selected)
    assert 0.15 * 120 <= n_sel <= 0.35 * 120
    # determinism
    again = dsir_select(corpus, target, keep_frac=0.25).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # empty documents still get a row (weight 0), never dropped
    with_empty = corpus.union(
        spark.createDataFrame([(999, "")], "doc_id long, text string")
    )
    out2 = dsir_select(with_empty, target, keep_frac=0.25).collect()
    assert len(out2) == 121
    empty_row = next(r for r in out2 if r.doc_id == 999)
    assert empty_row.n_feats == 0 and empty_row.log_weight == 0.0


def test_dsir_select_empty_target_still_computes_real_ratios(spark):
    """Regression: sum() over an empty target is NULL where the SQL
    oracle's count(*) is 0 — without the coalesce every log-ratio goes
    NULL and all weights silently collapse to 0.  With it, an empty
    target yields the real smoothed ratios (uniform target prior), so
    weights are finite, non-null, and content-dependent."""
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import dsir_select

    corpus = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(5))) for i in range(20)],
        "doc_id long, text string",
    )
    empty_target = spark.createDataFrame([], "doc_id long, text string")
    out = dsir_select(corpus, empty_target, keep_frac=0.25).collect()
    assert len(out) == 20
    assert all(r.log_weight is not None for r in out)
    # smoothed target prior vs real raw counts: weights must be real
    # negatives (target assigns every bucket the uniform floor), not 0
    assert all(r.log_weight < 0 for r in out)


def test_domain_quota_two_phase_equals_naive_window(spark):
    """domain_quota's salted two-phase top-k must return EXACTLY the
    naive per-group window's rows — on a skewed frame where one group
    holds 90% of rows (the mega-domain the two-phase exists for) and
    ties in the order column force the doc_id tie-break."""
    from pyspark.sql import Window

    from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import domain_quota

    rows = [(i, "hot", (i * 7) % 13) for i in range(180)] + [
        (1000 + i, f"cold{i % 4}", i % 5) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = sorted(
        map(tuple, domain_quota(df, 6, "source", "doc_id", "n_chars").select(
            "doc_id", "source", "n_chars", "quota_rank"
        ).collect())
    )
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), "doc_id")
    want = sorted(
        map(tuple, df.withColumn("quota_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("quota_rank") <= 6)
        .select("doc_id", "source", "n_chars", "quota_rank")
        .collect())
    )
    assert got == want
    # the quota keeps each group's LARGEST rows: every kept hot row's
    # n_chars must be >= every dropped hot row's
    kept_hot = [t for t in got if t[1] == "hot"]
    assert len(kept_hot) == 6
    dropped_max = max(
        t[2] for t in map(tuple, df.collect())
        if t[1] == "hot" and t[0] not in {k[0] for k in kept_hot}
    )
    assert min(t[2] for t in kept_hot) >= dropped_max - 0  # ties allowed


def test_bottomk_quantile_sketch_merges_exactly(spark):
    """The sketch's scale claim: bottom-k of a UNION equals the
    re-truncated union of per-shard bottom-k samples — shards,
    partitions, and micro-batches fold with ZERO approximation drift
    (hash selection, not RNG).  And the estimates audit within the
    rank tolerance vs exact percentiles."""
    import pyspark.sql.functions as F

    from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import (
        bottomk_sample,
        quantile_sketch,
    )

    df = spark.range(0, 20_000).select(
        F.col("id").alias("k"),
        (F.pow(F.col("id") % 1000, 1.3)).alias("v"),  # skewed values
    )
    whole = sorted(map(tuple, bottomk_sample(df, "k", k=128).collect()))
    shards = [df.filter(F.col("k") % 3 == i) for i in range(3)]
    folded_src = shards[0].unionByName(shards[1]).unionByName(shards[2])
    # per-shard bottom-k, unioned, re-truncated == whole-table bottom-k
    per_shard = bottomk_sample(shards[0], "k", k=128)
    for s in shards[1:]:
        per_shard = per_shard.unionByName(bottomk_sample(s, "k", k=128))
    folded = sorted(map(tuple, bottomk_sample(per_shard, "k", k=128).collect()))
    assert folded == whole == sorted(map(tuple, bottomk_sample(folded_src, "k", k=128).collect()))

    # estimates within rank tolerance of the exact percentiles
    probs = [0.25, 0.5, 0.9]
    est = {r.prob: r.estimate for r in quantile_sketch(df, "v", "k", probs, k=128).collect()}
    n = df.count()
    for p in probs:
        cdf = df.filter(F.col("v") <= est[p]).count() / n
        assert abs(cdf - p) <= 0.15, (p, est[p], cdf)
    # deterministic across runs
    est2 = {r.prob: r.estimate for r in quantile_sketch(df, "v", "k", probs, k=128).collect()}
    assert est == est2
