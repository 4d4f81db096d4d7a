from semantic_similarity_system_using_aws_mapreduce_spark.ml.classify import cross_validate_random_forest, evaluation_report

__all__ = ["cross_validate_random_forest", "evaluation_report"]
