from pathlib import Path

import pytest

from semantic_similarity_system_using_aws_mapreduce_spark.functions.stemming import porter_stem, stem_udf

GOLDEN = Path(__file__).parent / "data" / "stemmer_golden.tsv"


def test_golden_vectors():
    """5,813 words stemmed by the reference's compiled Stemmer.java
    (gold-standard vocabulary + corpus sample + classic Porter cases)."""
    mismatches = []
    for line in GOLDEN.read_text().splitlines():
        word, expected = line.split("\t")
        got = porter_stem(word)
        if got != expected:
            mismatches.append((word, expected, got))
    assert not mismatches, mismatches[:10]


def test_wrapper_semantics():
    # Stemmer.java:367-379: lowercase first; non-[a-z]+ unchanged.
    assert porter_stem("Worked") == "work"
    assert porter_stem("test/") == "test/"
    assert porter_stem("ABC123") == "abc123"
    assert porter_stem("") == ""
    # length <= 2 never stemmed (Stemmer.java:358)
    assert porter_stem("as") == "as"
    assert porter_stem("is") == "is"


@pytest.mark.parametrize(
    "word,stem",
    [("bounds", "bound"), ("abused", "abus"), ("testing", "test"), ("meetings", "meet")],
)
def test_spot_values(word, stem):
    assert porter_stem(word) == stem


def test_udf(spark):
    df = spark.createDataFrame(
        [("Worked",), ("bounds",), ("test/",), (None,)], ["w"]
    ).select(stem_udf("w").alias("s"))
    assert [r.s for r in df.collect()] == ["work", "bound", "test/", None]
