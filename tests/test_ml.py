"""ML stage (ML1-ML3): RandomForest k-fold CV on pipeline output."""

import pytest

from semantic_similarity_system_using_aws_mapreduce_spark.ml.classify import cross_validate_random_forest
from semantic_similarity_system_using_aws_mapreduce_spark.plans.pipeline import semantic_similarity_pipeline

SMALL_SAMPLE = "/root/reference/small-sample.txt"
GOLD_FULL = "/root/reference/word-relatedness.txt"


@pytest.fixture(scope="module")
def vectors(spark):
    return semantic_similarity_pipeline(spark, SMALL_SAMPLE, GOLD_FULL, mode="parity").vectors


def test_cross_validation(spark, vectors):
    result = cross_validate_random_forest(vectors, n_folds=5, num_trees=20)
    m = result.metrics
    assert m["n"] == 331
    assert 0.0 <= m["accuracy"] <= 1.0
    assert -1.0 <= m["kappa"] <= 1.0
    tp, fn = m["confusion"][0]
    fp, tn = m["confusion"][1]
    assert tp + fn + fp + tn == m["n"]
    assert m["correct"] == tp + tn
    # every instance predicted exactly once
    assert result.predictions.count() == 331
    # the tiny sample is almost all not-similar; the classifier should
    # at least beat always-wrong
    assert m["accuracy"] > 0.5
    # ROC area (reference report's ROC column, ~0.9 at full corpus
    # scale).  On this 331-instance fixture with ~3% positives the
    # held-out ranking is noise (measured ~0.38), so assert the metric
    # is computed and well-formed, not that the tiny model has skill.
    assert m["roc_area"] is not None
    assert 0.0 <= m["roc_area"] <= 1.0


def test_too_few_instances(spark, vectors):
    with pytest.raises(ValueError):
        cross_validate_random_forest(vectors.limit(1))
