from semantic_similarity_system_using_aws_mapreduce_spark.functions.stemming import porter_stem, stem_udf

__all__ = ["porter_stem", "stem_udf"]
