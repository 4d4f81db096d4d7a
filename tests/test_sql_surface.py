"""The plain-SQL surface: session functions + temp views make every
engine hash/stem primitive reachable from spark.sql alone, with the
SQL scalar UDFs inlining into codegen (no Python in the plan)."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.sql import register_sql_surface

SF_DIR = "/root/testdata/sf0.001"


def test_porter_stem_sql_matches_python(spark):
    from semantic_similarity_system_using_aws_mapreduce_spark.functions.stemming import porter_stem

    register_sql_surface(spark)
    words = ["running", "relational", "caresses", "ponies", "sky", "agreed"]
    vals = ", ".join(f"('{w}')" for w in words)
    rows = spark.sql(
        f"SELECT w, porter_stem(w) AS s FROM VALUES {vals} AS t(w)"
    ).collect()
    assert {r.w: r.s for r in rows} == {w: porter_stem(w) for w in words}


def test_md5_int60_and_bucket_match_operator_arithmetic(spark):
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.dedup import md5_int
    from semantic_similarity_system_using_aws_mapreduce_spark.operators.sampling import hash_bucket

    register_sql_surface(spark)
    df = spark.createDataFrame([(f"key{i}",) for i in range(50)], "k string")
    df.createOrReplaceTempView("ks")
    got = spark.sql(
        "SELECT k, md5_int60(k) AS h, hash_bucket_permille(k, 'smp') AS b FROM ks"
    ).collect()
    want = {
        r.k: (r.h, r.b)
        for r in df.select(
            "k",
            md5_int(F.col("k")).alias("h"),
            hash_bucket(F.col("k"), "smp").cast("int").alias("b"),
        ).collect()
    }
    assert {r.k: (r.h, r.b) for r in got} == want


def test_sql_udfs_stay_jvm_side(spark):
    register_sql_surface(spark)
    plan = (
        spark.sql("SELECT md5_int60(cast(id AS STRING)) AS h FROM range(10)")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan  # inlined expression, not a UDF node


def test_views_enable_pure_sql_analytics(spark):
    register_sql_surface(spark, SF_DIR)
    rows = spark.sql(
        """
        SELECT source, count(*) AS n_docs, sum(n_chars) AS chars
        FROM documents GROUP BY source ORDER BY source
        """
    ).collect()
    assert len(rows) > 0
    import duckdb

    want = duckdb.sql(
        f"SELECT source, count(*) n, sum(n_chars) c FROM '{SF_DIR}/documents.parquet' "
        "GROUP BY source ORDER BY source"
    ).fetchall()
    assert [(r.source, r.n_docs, r.chars) for r in rows] == [tuple(w) for w in want]
