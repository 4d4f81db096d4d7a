"""Approximate nearest neighbor search over an embedding column.

Two paths, same results contract:

  * brute force — broadcast normalized matrix + per-partition numpy
    matmul (exact; the correctness oracle; O(N^2) scoring).
  * SRP-LSH     — sign-random-projection signatures bucket the vectors;
    exact scoring only *within* buckets (multi-probe over T independent
    tables).  At 100 TB the bucket join is the only shuffle and each
    bucket fits an executor; recall tunes with (n_planes, n_tables).

Signatures are computed with a seeded numpy projection inside an
Arrow-batched pandas UDF; everything after is plain relational ops, so
Catalyst handles the bucket join like any other equi-join (AQE splits
skewed buckets).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _normalized_matrix(df: DataFrame, id_col: str, vec_col: str):
    local = df.select(id_col, vec_col).toPandas()
    ids = local[id_col].to_numpy()
    mat = np.array(local[vec_col].tolist(), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return ids, mat


def cosine_topk_bruteforce(
    df: DataFrame, k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact top-k neighbors for EVERY vector (self-join form):
    (vec_id, neighbor_id, cosine, rank)."""
    spark = df.sparkSession
    ids, mat = _normalized_matrix(df, id_col, vec_col)
    bc = spark.sparkContext.broadcast((ids, mat))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = bc.value
        id_pos = {int(v): i for i, v in enumerate(all_ids)}
        for pdf in batches:
            q = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            sims = q @ all_mat.T
            qids = pdf[id_col].to_numpy()
            for row, qid in enumerate(qids):
                sims[row, id_pos[int(qid)]] = -np.inf  # exclude self
            # top-k per row (argpartition then exact ordering)
            part = np.argpartition(-sims, kth=min(k, sims.shape[1] - 1), axis=1)[:, :k]
            out_q, out_n, out_c, out_r = [], [], [], []
            for row, qid in enumerate(qids):
                cand = part[row]
                # order by cosine desc, neighbor id asc (deterministic ties)
                order = cand[np.lexsort((all_ids[cand], -sims[row, cand]))][:k]
                for rank, j in enumerate(order, start=1):
                    out_q.append(qid)
                    out_n.append(all_ids[j])
                    out_c.append(sims[row, j])
                    out_r.append(rank)
            yield pd.DataFrame(
                {"vec_id": out_q, "neighbor_id": out_n, "cosine": out_c, "rank": out_r}
            )

    return df.mapInPandas(
        gen, schema="vec_id long, neighbor_id long, cosine double, rank int"
    )


def srp_signatures(
    df: DataFrame,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, table, bucket): one sign-random-projection bucket per
    hash table.  Bucket = the n_planes sign bits packed into an int."""
    first = df.select(vec_col).first()
    dim = len(first[0])
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, n_planes, dim))
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(planes)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bc.value
        weights = 1 << np.arange(n_planes)
        for pdf in batches:
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            out_id, out_t, out_b = [], [], []
            for t in range(n_tables):
                bits = (v @ pl[t].T) > 0  # (batch, n_planes)
                buckets = bits @ weights
                out_id.extend(pdf[id_col].tolist())
                out_t.extend([t] * len(pdf))
                out_b.extend(buckets.tolist())
            yield pd.DataFrame({"vec_id": out_id, "table": out_t, "bucket": out_b})

    return df.mapInPandas(gen, schema="vec_id long, table int, bucket long")


def ivf_assign(
    df: DataFrame,
    n_lists: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """IVF coarse quantization: k-means centroids (seeded MLlib) and
    per-vector list assignment.  Returns (assignments DF with a `list`
    column, centroid matrix as numpy).  At 100 TB, training samples the
    data and assignment is one map pass."""
    import numpy as np
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feats = df.select(
        F.col(id_col), F.col(vec_col), array_to_vector(F.col(vec_col)).alias("features")
    )
    model = KMeans(k=n_lists, seed=seed, featuresCol="features").fit(feats)
    assigned = model.transform(feats).select(
        id_col, vec_col, F.col("prediction").alias("list")
    )
    centroids = np.array([np.asarray(c) for c in model.clusterCenters()])
    return assigned, centroids


def ann_topk_ivf(
    df: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: each query probes its ``n_probe`` nearest
    centroid lists and scores exactly within them.

    Plan: one k-means pass -> per-vector probe lists (numpy vs the
    broadcast centroid matrix, Arrow-batched) -> equi-join probe lists
    with inverted lists -> exact cosine -> window top-k.  The join is
    the only shuffle over candidates; list sizes are N/n_lists on
    average, so scored pairs ~ N * n_probe * N/n_lists instead of N^2.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    assigned, centroids = ivf_assign(df, n_lists, seed, id_col, vec_col)
    cnorm = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )
    bc = spark.sparkContext.broadcast(cnorm)

    def probes(batches):
        cn = bc.value
        for pdf in batches:
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sims = v @ cn.T
            top = np.argsort(-sims, axis=1)[:, :n_probe]
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(ids, n_probe),
                    "list": top.ravel(),
                }
            )

    probe_lists = df.select(id_col, vec_col).mapInPandas(
        probes, schema="vec_id long, list int"
    )
    inv = assigned.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv"), "list"
    )
    cand = (
        probe_lists.join(inv, "list")
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", "nv")
        .distinct()
    )
    vecs = df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("qv"))
    dot = F.aggregate(
        F.zip_with("qv", "nv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    scored = cand.join(vecs, "vec_id").select(
        "vec_id",
        "neighbor_id",
        (dot / (nrm(F.col("qv")) * nrm(F.col("nv")))).alias("cosine"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cosine", "rank")
    )


def ann_topk_lsh_portable(
    df: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 4,
    quant: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SRP-LSH approximate top-k with a fully deterministic,
    cross-engine-reproducible hash family — the scale-safe ANN plan the
    correctness gate can hash-verify against a SQL oracle.

    Differences from :func:`ann_topk_lsh` (which draws Gaussian planes
    from a seeded numpy RNG inside an Arrow UDF):

      * hyperplanes are ±1 vectors derived from md5 of "srp:t:j:i" —
        pure JVM expressions, no Python anywhere, and byte-identical
        reproducible in any engine with md5;
      * the plane dot products are computed over fixed-point quantized
        components (``round(x*quant)`` as int64), so bucket assignment
        is exact integer math — immune to FP summation-order drift
        between engines (a sign flip near 0.0 would otherwise change
        buckets);
      * candidates are scored with exact double cosine and ranked by
        the ROUNDED cosine (6 dp) with neighbor-id tiebreak, making the
        top-k deterministic across engines.

    Scale shape (the 100 TB plan): explode -> broadcast-join the tiny
    plane table -> two keyed aggregations (both shuffle on vec_id) ->
    bucket self equi-join (the only pairwise stage, bucketed never
    all-pairs) -> explode-join scoring linear in candidate count ->
    window top-k.  No driver collect, no broadcast of the data matrix.
    """
    spark = df.sparkSession
    dim = len(df.select(vec_col).first()[0])
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.dedup import md5_int

    planes = (
        spark.range(n_tables).select(F.col("id").alias("t"))
        .crossJoin(spark.range(n_planes).select(F.col("id").alias("j")))
        .crossJoin(spark.range(dim).select(F.col("id").alias("i")))
        .select(
            "t", "j", "i",
            F.when(
                md5_int(F.concat_ws(":", F.lit("srp"), "t", "j", "i")) % 2 == 0,
                F.lit(1),
            ).otherwise(F.lit(-1)).alias("sign"),
        )
    )
    u = df.select(
        F.col(id_col).alias("vec_id"), F.posexplode(vec_col).alias("i", "v")
    ).select("vec_id", "i", F.col("v").cast("double").alias("x"))
    # u feeds four subplans (quantized dots, norms, and both sides of
    # the candidate scoring join); persist so the scan+explode runs
    # once.  At cluster scale with embeddings too big to cache, drop
    # this and let the (cheap, column-pruned) scans repeat — the
    # shuffles dominate there, not the scans.
    from pyspark import StorageLevel

    u = u.persist(StorageLevel.MEMORY_AND_DISK)
    q = u.select(
        "vec_id", "i", F.round(F.col("x") * quant, 0).cast("long").alias("xq")
    )
    dots = (
        q.join(F.broadcast(planes), "i")
        .groupBy("vec_id", "t", "j")
        .agg(F.sum(F.col("xq") * F.col("sign")).alias("dot"))
    )
    buckets = dots.groupBy("vec_id", "t").agg(
        F.sum(
            F.expr(
                "CASE WHEN dot >= 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(j AS INT)) "
                "ELSE CAST(0 AS BIGINT) END"
            )
        ).alias("bucket")
    )
    # Both sides of the self-join read buckets, and exchange reuse does
    # not fire across the aliases (AQE may broadcast one side) — without
    # the persist the whole signature pipeline runs twice (measured 2x).
    # Blocks are dropped by the ContextCleaner once the result DataFrame
    # is garbage-collected.
    from pyspark import StorageLevel

    buckets = buckets.persist(StorageLevel.MEMORY_AND_DISK)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_id"), F.col("b.vec_id").alias("neighbor_id"))
        .distinct()
    )
    norms = u.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nrm"))
    ub = u.select(F.col("vec_id").alias("neighbor_id"), "i", F.col("x").alias("y"))
    pair_dots = (
        cand.join(u, "vec_id")
        .join(ub, ["neighbor_id", "i"])
        .groupBy("vec_id", "neighbor_id")
        .agg(F.sum(F.col("x") * F.col("y")).alias("dot"))
    )
    scored = (
        pair_dots.join(norms, "vec_id")
        .join(
            norms.select(F.col("vec_id").alias("neighbor_id"), F.col("nrm").alias("nrm_b")),
            "neighbor_id",
        )
        .select(
            "vec_id",
            "neighbor_id",
            F.round(F.col("dot") / (F.col("nrm") * F.col("nrm_b")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("vec_id", "neighbor_id", "cosine", "rnk")
    )


def ann_topk_lsh(
    df: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k per vector: candidates = vectors sharing any
    (table, bucket); exact cosine on candidates only; window top-k.

    Plan: signatures (Arrow UDF) -> self equi-join on (table, bucket)
    -> distinct pairs -> exact scoring via JVM array expressions ->
    row_number window.  No all-pairs stage anywhere.
    """
    sigs = srp_signatures(df, n_planes, n_tables, seed, id_col, vec_col)
    a, b = sigs.alias("a"), sigs.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.table") == F.col("b.table"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") != F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_id"), F.col("b.vec_id").alias("neighbor_id"))
        .distinct()
    )
    vecs = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    dot = F.aggregate(
        F.zip_with("qv", "nv", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )
    scored = (
        cand.join(vecs.withColumnRenamed("v", "qv"), "vec_id")
        .join(
            vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("nv")),
            "neighbor_id",
        )
        .select(
            "vec_id",
            "neighbor_id",
            (dot / (nrm(F.col("qv")) * nrm(F.col("nv")))).alias("cosine"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cosine", "rank")
    )


def quantize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
    keep_vec: bool = False,
) -> DataFrame:
    """Symmetric per-vector linear quantization of an embedding column
    to ``bits``-bit integer codes — the standard 4x storage/bandwidth
    reduction for embedding tables at corpus scale (codes ship as
    int8; the float vector reconstructs as ``code * scale``).

    scale  = max|x| / (2^(bits-1) - 1)
    code_i = floor(x_i / scale + 0.5)   ∈ [-(2^(bits-1)-1), 2^(bits-1)-1]

    floor-based rounding (not half-even round()) keeps the arithmetic
    bit-identical across engines: /, +0.5 and floor are all exactly-
    rounded IEEE ops.  All-zero vectors get scale 0 and all-zero codes.
    Entirely map-side — no shuffle, no UDF.

    Returns (id, scale:double, codes:array<int>); reconstruction error
    is bounded by scale/2 per element.  ``keep_vec=True`` passes the
    original vector column through (for fidelity audits) so consumers
    never need a join to re-attach it.
    """
    qmax = 2 ** (bits - 1) - 1
    amax = F.array_max(F.transform(vec_col, lambda v: F.abs(v.cast("double"))))
    with_scale = df.select(
        F.col(id_col), F.col(vec_col), (amax / F.lit(float(qmax))).alias("scale")
    )
    codes = F.when(
        F.col("scale") > 0,
        F.transform(
            vec_col,
            lambda v: F.floor(v.cast("double") / F.col("scale") + F.lit(0.5)).cast(
                "int"
            ),
        ),
    ).otherwise(F.transform(vec_col, lambda v: F.lit(0)))
    kept = [F.col(vec_col)] if keep_vec else []
    return with_scale.select(id_col, "scale", codes.alias("codes"), *kept)
