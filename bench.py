"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Methodology mirrors the reference harness
(medtype-as-service/server/medtype_serving/server/benchmark.py:26-31):
a warm-up pass is run and discarded before timing.  Each query is then
timed SPARK_GRAFT_BENCH_RUNS times (default 3) and the per-query median
is reported, so round-over-round deltas are signal rather than sandbox
noise (a single-run harness swung +-33% between rounds 3 and 4 with no
code change on most queries).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


HEADLINE = [
    "q01_pricing_summary",
    "q04_cust_nation_stats",
    "q08_token_topk",
    "q10_interval_overlap_counts",
    "q12_micro_macro",
    "q14_exact_dedup",
    "q15_minhash",
    "q16_ngram_jaccard",
    "q17_textstats",
    "q21_cluster_metrics",
    "q24_cosine_topk",
    "q25_cc_chains",
    "q53_flagship_linkage",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from medtype_spark.queries import QUERIES
    from medtype_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up (discarded, benchmark.py:30)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        fn(spark, sf_dir).count()  # warm-up, discarded (benchmark.py:30)
        samples = []
        n = 0
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            samples.append(time.perf_counter() - t0)
        dt = statistics.median(samples)
        times[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s median of {[round(s, 3) for s in samples]}"
              f" ({n} rows)", file=sys.stderr)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(json.dumps({
        "metric": "headline_suite_runtime",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
        "cpus": int(cpus),
        "estimator": f"median_of_{runs}",
    }))


if __name__ == "__main__":
    main()
