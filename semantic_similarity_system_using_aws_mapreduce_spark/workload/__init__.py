"""The engine's declared query workload: every entry pairs a Spark
implementation (`(spark, sf_dir) -> DataFrame`) with an equivalent
DuckDB oracle SQL string, keyed by the same name, with identical
column names (computed columns rounded identically on both sides so
value hashes are stable across engines).

Sections map to SURVEY.md §2's operator inventory:
  relational  - scans, joins (broadcast/semi/anti/full-outer align),
                aggregations, windows, set ops, rollup/pivot (§2.1-2.4, 2.7)
  text        - the reference pipeline's semantics transplanted onto the
                documents table: token counts (A1-A3), association
                measures (M1-M4), D1-D6 source similarity (§2.5-2.6)
  dedup       - exact, minhash signatures + LSH candidates, simhash,
                n-gram jaccard near-dup (north-star extensions)
  embeddings  - vector norms, threshold/cosine top-k similarity search,
                centroids (north-star extensions)
  events      - time windows, sessionization, pivot, JSON extraction
                (§2.9 batch analogs; streaming lives in streaming/)
"""

from __future__ import annotations

from semantic_similarity_system_using_aws_mapreduce_spark.workload import dedup, embeddings, events, relational, text

_MODULES = [relational, text, dedup, embeddings, events]

QUERIES = {}
ORACLES = {}
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)

__all__ = ["QUERIES", "ORACLES"]
