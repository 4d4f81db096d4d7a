#!/usr/bin/env python
"""Benchmark the engine's headline queries.

Runs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query is forced to full execution with a noop sink (no driver
collect, no result materialization cost in the measurement).
"""

from __future__ import annotations

import json
import os
import sys
import time

from semantic_similarity_system_using_aws_mapreduce_spark.session import get_spark
from semantic_similarity_system_using_aws_mapreduce_spark.workload import QUERIES

HEADLINE = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier",
    "q_part_brand_revenue",
    "q_window_topk",
    "q_token_counts",
    "q_token_source_assoc",
    "q_source_similarity",
    "q_minhash_lsh_candidates",
    "q_ngram_jaccard_dups",
    "q_simhash",
    "q_cosine_pairs",
    "q_hourly_event_stats",
    "q_sessionization",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    # Warm the JVM/session (codegen, parquet footer caches) outside the
    # measured region.
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"  {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall-clock, noop sink",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
