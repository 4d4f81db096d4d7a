"""Stage 5 — RandomForest train/eval with k-fold cross-validation
(reference Step5.java:125-174 and the standalone WekaModel re-run entry,
WekaModel.java:176-207).

The reference streams Step4's S3 text output into a local ARFF file and
runs Weka's RandomForest with 10-fold CV, seed 42, on the driver.  Here
the 24 vector columns feed ``pyspark.ml`` directly — no ARFF
materialization, no driver-side data marshalling.

Numeric parity with Weka is not achievable (different tree algorithm,
different fold shuffling — SURVEY.md §2.10 ML1); the fidelity target is
metrics within tolerance of the published numbers (BASELINE.md):
accuracy ~93.5%, precision(similar) ~0.93-0.95, recall(similar) ~0.30.

Like Weka's ``crossValidateModel``, predictions from the k held-out
folds are pooled and metrics are computed once over the pooled set.
Infinity feature values (the D1/D2/D6 NaN->+inf policy) are clamped to
+/-1e300: tree splits are threshold comparisons, so any value larger
than every finite observation is equivalent, and MLlib rejects raw
infinities.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.ml.classification import RandomForestClassifier
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.functions import vector_to_array
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from semantic_similarity_system_using_aws_mapreduce_spark.schemas import VECTOR_COLUMNS

_CLAMP = 1e300


@dataclass
class CvResult:
    predictions: DataFrame  # pooled held-out predictions
    metrics: dict


def _prepare(vectors: DataFrame) -> DataFrame:
    clamped = [
        F.least(F.greatest(F.col(c), F.lit(-_CLAMP)), F.lit(_CLAMP)).alias(c)
        for c in VECTOR_COLUMNS
    ]
    df = vectors.select(
        "word1",
        "word2",
        F.col("is_related").cast("double").alias("label"),
        *clamped,
    )
    return VectorAssembler(inputCols=VECTOR_COLUMNS, outputCol="features").transform(df)


def cross_validate_random_forest(
    vectors: DataFrame,
    n_folds: int = 10,
    seed: int = 42,
    num_trees: int = 100,
) -> CvResult:
    """k-fold CV (``numFolds = min(10, n)``, skip below 2 — reference
    Step5.java:133-137); returns pooled predictions + the evaluation
    report.  ``num_trees=100`` matches Weka RandomForest's default
    ``numIterations``."""
    n = vectors.count()
    n_folds = min(n_folds, n)
    if n_folds < 2:
        raise ValueError(f"need >= 2 instances for cross-validation, got {n}")

    prepared = _prepare(vectors).withColumn(
        "fold", (F.rand(seed) * n_folds).cast("int")
    )
    prepared = prepared.cache()
    rf = RandomForestClassifier(
        featuresCol="features", labelCol="label", numTrees=num_trees, seed=seed
    )
    held_out = []
    for fold in range(n_folds):
        model = rf.fit(prepared.filter(F.col("fold") != fold))
        held_out.append(model.transform(prepared.filter(F.col("fold") == fold)))
    pooled = held_out[0]
    for part in held_out[1:]:
        pooled = pooled.unionByName(part)
    pooled = pooled.select(
        "word1",
        "word2",
        "label",
        "prediction",
        # P(similar): probability vector component for class 1.0.  A fold
        # trained on only not-similar rows yields a 1-element probability
        # vector (inferred numClasses=1) -> P(similar) = 0.
        F.coalesce(
            F.try_element_at(vector_to_array("probability"), F.lit(2)), F.lit(0.0)
        ).alias("p_similar"),
    ).cache()
    metrics = evaluation_report(pooled)
    prepared.unpersist()
    return CvResult(pooled, metrics)


def evaluation_report(predictions: DataFrame) -> dict:
    """Accuracy, kappa, MAE/RMSE, precision/recall/F1 for class
    ``similar``, ROC area, and the confusion matrix — the contents of
    the reference's evaluation report (Step5.java:139-167; published
    ROC area 0.899/0.893 in BASELINE.md).

    ``roc_area`` is the AUC of ``p_similar`` as a ranking score
    (distributed, via BinaryClassificationEvaluator).  For binary
    problems the class-0 area with score ``1 - p_similar`` is the same
    number, so one value covers Weka's per-class ROC column.  ``None``
    when the pooled predictions contain a single label class (AUC is
    undefined there — Weka prints NaN)."""
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    if predictions.select("label").distinct().count() == 2:
        roc_area = BinaryClassificationEvaluator(
            rawPredictionCol="p_similar", labelCol="label", metricName="areaUnderROC"
        ).evaluate(predictions)
    else:
        roc_area = None
    agg = predictions.agg(
        F.count("*").alias("n"),
        F.sum(((F.col("prediction") == 1.0) & (F.col("label") == 1.0)).cast("long")).alias("tp"),
        F.sum(((F.col("prediction") == 0.0) & (F.col("label") == 1.0)).cast("long")).alias("fn"),
        F.sum(((F.col("prediction") == 1.0) & (F.col("label") == 0.0)).cast("long")).alias("fp"),
        F.sum(((F.col("prediction") == 0.0) & (F.col("label") == 0.0)).cast("long")).alias("tn"),
        F.avg(F.abs(F.col("p_similar") - F.col("label"))).alias("mae"),
        F.avg(F.pow(F.col("p_similar") - F.col("label"), 2)).alias("mse"),
    ).collect()[0]
    n, tp, fn, fp, tn = agg.n, agg.tp, agg.fn, agg.fp, agg.tn
    correct = tp + tn
    accuracy = correct / n
    # Cohen's kappa from the confusion matrix.
    p_yes = ((tp + fn) / n) * ((tp + fp) / n)
    p_no = ((tn + fp) / n) * ((tn + fn) / n)
    pe = p_yes + p_no
    kappa = (accuracy - pe) / (1 - pe) if pe < 1 else 1.0
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    return {
        "n": n,
        "correct": correct,
        "accuracy": accuracy,
        "kappa": kappa,
        "mae": agg.mae,
        "rmse": math.sqrt(agg.mse),
        "precision_similar": precision,
        "recall_similar": recall,
        "f1_similar": f1,
        "roc_area": roc_area,
        "confusion": [[tp, fn], [fp, tn]],
    }
