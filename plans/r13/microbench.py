#!/usr/bin/env python
"""Micro-bench helper for the r13 optimization round: time a named
subset of bench.py's rows with the identical methodology (noop sink,
min-of-N, per-RUN cache clear + gc) so individual optimizations can
be measured without a full bench run.  Usage:

    python plans/r13/microbench.py q_token_counts warc_ingest_10k_pages [...]

Not part of the driver contract; bench.py remains the reported bench.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from semantic_similarity_system_using_aws_mapreduce_spark.session import get_spark
from semantic_similarity_system_using_aws_mapreduce_spark.workload import ALL_QUERIES as QUERIES

RUNS = int(os.environ.get("MICROBENCH_RUNS", "3"))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="microbench")
    import bench

    for t in ("lineitem", "documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    out: dict[str, object] = {}
    for name in names:
        runs: list[float] = []
        for _ in range(RUNS):
            # per-RUN cold cache (r13, VERDICT r12 #2): min-of-N must
            # never measure a predecessor run's persisted blocks
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            try:
                if name in bench.EXTRA_FNS:
                    bench.EXTRA_FNS[name](spark, sf_dir)
                else:
                    QUERIES[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
            except Exception as exc:  # noqa: BLE001
                out[name] = f"ERROR {type(exc).__name__}: {exc}"[:300]
                break
            runs.append(round(time.perf_counter() - t0, 3))
        if runs:
            out[name] = {"min": min(runs), "runs": runs}
            print(f"  {name}: {min(runs):.3f}s {runs}", file=sys.stderr)
    out["loadavg_1m"] = round(os.getloadavg()[0], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
