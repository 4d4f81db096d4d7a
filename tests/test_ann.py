"""ANN: brute-force exactness and LSH recall against it."""

import math

from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.operators.ann import ann_topk_lsh, cosine_topk_bruteforce

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_bruteforce_matches_workload_knn(spark):
    """The per-vector brute force must agree with the oracle-checked
    single-query q_knn for vec_id=0."""
    from semantic_similarity_system_using_aws_mapreduce_spark.workload.embeddings import q_knn

    bf = (
        cosine_topk_bruteforce(_emb(spark), k=10)
        .filter(F.col("vec_id") == 0)
        .orderBy("rank")
        .collect()
    )
    expected = q_knn(spark, SF_DIR).collect()
    assert [r.neighbor_id for r in bf] == [r.vec_id for r in expected]
    for got, exp in zip(bf, expected):
        assert math.isclose(round(got.cosine, 6), exp.cosine, abs_tol=1e-6)


def test_bruteforce_shapes(spark):
    n = _emb(spark).count()
    bf = cosine_topk_bruteforce(_emb(spark), k=5)
    assert bf.count() == n * 5
    per_vec = bf.groupBy("vec_id").count().agg(F.min("count"), F.max("count")).collect()[0]
    assert per_vec[0] == per_vec[1] == 5


def test_ivf_recall(spark):
    """IVF with n_probe=8 of 16 lists must beat a healthy recall floor
    and agree exactly on returned cosines."""
    import math as m

    from semantic_similarity_system_using_aws_mapreduce_spark.operators.ann import ann_topk_ivf

    bf = cosine_topk_bruteforce(_emb(spark), k=10)
    ivf = ann_topk_ivf(_emb(spark), k=10, n_lists=16, n_probe=8)
    truth = {(r.vec_id, r.neighbor_id): r.cosine for r in bf.collect()}
    got = {(r.vec_id, r.neighbor_id): r.cosine for r in ivf.collect()}
    hits = set(got) & set(truth)
    recall = len(hits) / len(truth)
    assert recall > 0.4, f"IVF recall too low: {recall:.3f}"
    for key in list(hits)[:50]:
        assert m.isclose(got[key], truth[key], rel_tol=1e-9)


def test_lsh_recall(spark):
    """LSH top-10 must recover a solid fraction of the true top-10.
    On near-uniform random embeddings (this fixture) recall is the
    hard case; assert a sane floor and exact-cosine agreement on the
    pairs it does return."""
    bf = cosine_topk_bruteforce(_emb(spark), k=10)
    lsh = ann_topk_lsh(_emb(spark), k=10, n_planes=4, n_tables=8)
    truth = {(r.vec_id, r.neighbor_id): r.cosine for r in bf.collect()}
    got = {(r.vec_id, r.neighbor_id): r.cosine for r in lsh.collect()}
    hits = set(got) & set(truth)
    recall = len(hits) / len(truth)
    assert recall > 0.3, f"LSH recall too low: {recall:.3f}"
    for key in list(hits)[:50]:
        assert math.isclose(got[key], truth[key], rel_tol=1e-9)


def test_quantize_embeddings_bounds_and_zero_guard(spark):
    """Codes must stay in the int8 symmetric range, reconstruction
    error must respect the scale/2 bound, and all-zero vectors must
    get scale 0 with all-zero codes (not a division blowup)."""
    from pyspark.sql import functions as F

    from semantic_similarity_system_using_aws_mapreduce_spark.operators.ann import quantize_embeddings

    base = _emb(spark).limit(50)
    zero = spark.createDataFrame(
        [(10_000, [0.0] * 8, -1)], "vec_id long, embedding array<float>, label int"
    )
    q = quantize_embeddings(
        base.unionByName(zero.select(*base.columns)), keep_vec=True
    )
    rows = q.collect()
    assert len(rows) == 51
    for r in rows:
        assert all(-127 <= c <= 127 for c in r.codes)
        if r.scale == 0:
            assert all(c == 0 for c in r.codes)
            continue
        for x, c in zip(r.embedding, r.codes):
            assert abs(x - c * r.scale) <= r.scale / 2 + 1e-12
    zero_row = [r for r in rows if r.vec_id == 10_000]
    assert len(zero_row) == 1 and zero_row[0].scale == 0.0
