"""Library-level text-analysis operators."""

from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.operators.text_analysis import (
    identify_language,
    rolling_fingerprint,
    token_stats,
)


def test_identify_language(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is on the mat"),
            (2, "der hund ist ein tier und das ist gut"),
            (3, "le chat est dans la maison pour que"),
            (4, "xyzzy qwerty plugh"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: (r.lang_pred, r.lang_score) for r in identify_language(df).collect()}
    assert out[1][0] == "en" and out[1][1] > 0.3
    assert out[2][0] == "de"
    assert out[3][0] == "fr"
    assert out[4] == ("und", 0.0)


def test_token_stats(spark):
    df = spark.createDataFrame([(1, "hello world, antidisestablishment!")], ["doc_id", "text"])
    r = token_stats(df).collect()[0]
    assert r.n_words == 3
    # pieces: hell|o  worl|d|,  anti|dise|stab|lish|ment|!  -> 11
    assert r.n_pieces == 11


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "c b a"), (3, "a b c")], ["doc_id", "text"]
    )
    fp = {r.doc_id: r.fingerprint for r in rolling_fingerprint(df).collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]  # reordering changes the fingerprint
