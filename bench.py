"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also measures raw Renko kernel throughput (ticks/sec) on a synthetic
replay comparable to the reference's perf_backtest.py (~1.5 M ticks/s
on one core, BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

HEADLINE = [
    "renko_wicks",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "running_order_total",
    "user_sessions",
    "asof_purchase_before_click",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "similarity_cosine_topk",
    "similarity_lsh_ann_topk",
    "text_quality",
    "tumbling_event_windows",
]


def kernel_throughput() -> dict:
    """Single-core kernel ticks/sec on 2M-tick synthetic replays
    (comparable to reference test/perf_backtest.py, which runs real FX
    ticks: sparse emissions — its EURGBP set emits 1 brick per ~1400
    ticks at ~1.5 M ticks/s/core). Reports both the sparse (dispatcher
    picks the vectorized skip-scan) and dense (scalar loop) regimes."""
    import numpy as np

    from renkodf_spark.kernel import (
        choose_scan,
        new_output,
        new_state,
        scan_ticks,
        scan_ticks_vectorized,
    )

    rng = np.random.default_rng(42)
    n = 2_000_000
    results = {}
    for label, sigma, brick in [("sparse", 0.000005, 0.0003), ("dense", 0.3, 1.0)]:
        base = 0.86 if brick < 1 else 100.0
        prices = base + np.cumsum(rng.normal(0, sigma, n))
        times = np.arange(n)
        best = 0.0
        for _ in range(3):  # best-of-3: the box is co-tenant, medians lie low
            state = new_state(float(prices[0]), brick)
            out = new_output()
            t0 = time.perf_counter()
            if choose_scan(prices, brick):
                scan_ticks_vectorized(times, prices, 1, brick, state, out)
            else:
                scan_ticks(times, prices.tolist(), 1, brick, state, out)
            best = max(best, n / (time.perf_counter() - t0))
        results[label] = best
    return results


def main():
    # single-core kernel throughput first, before the Spark JVM spins up
    # 32 executor threads that perturb the measurement
    tput = kernel_throughput()

    from renkodf_spark.session import build_session

    spark = build_session("renkodf-spark-bench", cores=int(CPUS), driver_memory="24g")
    spark.sparkContext.setLogLevel("ERROR")

    import renkodf_spark.queries as q

    builders = q.queries()

    # Warm-up: spin up executor threads, Python workers (Arrow path),
    # and whole-stage codegen before the timed loop — cold-start cost is
    # a property of the session, not of any operator, and at sf0.001 it
    # dominated the first timed query ~15x.
    import pandas as pd
    from pyspark.sql import functions as F

    spark.range(1_000).select(F.sum("id")).collect()
    (
        spark.range(1_000)
        .withColumn("g", F.col("id") % 8)
        .groupBy("g")
        .applyInPandas(lambda pdf: pd.DataFrame({"n": [len(pdf)]}), "n long")
        .collect()
    )

    timings = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = builders[name](spark, SF_DIR)
        n = df.count()  # full materialization of the result
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    timings["kernel_mticks_per_sec_sparse"] = round(tput["sparse"] / 1e6, 3)
    timings["kernel_mticks_per_sec_dense"] = round(tput["dense"] / 1e6, 3)
    print(
        f"# kernel throughput: sparse {tput['sparse']/1e6:.2f} / dense {tput['dense']/1e6:.2f} M ticks/s/core",
        file=sys.stderr,
    )

    total = round(sum(v for k, v in timings.items() if not k.startswith("kernel_mticks")), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
