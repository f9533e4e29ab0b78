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
    "similarity_cosine_topk",
    "text_quality",
    "tumbling_event_windows",
]


def kernel_throughput() -> float:
    """Single-core kernel ticks/sec on a 2M-tick synthetic replay
    (comparable to reference test/perf_backtest.py)."""
    import numpy as np

    from renkodf_spark.kernel import new_output, new_state, scan_ticks

    rng = np.random.default_rng(42)
    n = 2_000_000
    prices = (100.0 + np.cumsum(rng.normal(0, 0.3, n))).tolist()
    times = list(range(n))
    state = new_state(prices[0], 1.0)
    out = new_output()
    t0 = time.perf_counter()
    scan_ticks(times, prices, 1, 1.0, state, out)
    dt = time.perf_counter() - t0
    return n / dt


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("renkodf-spark-bench")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import renkodf_spark.queries as q

    builders = q.queries()
    timings = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = builders[name](spark, SF_DIR)
        n = df.count()  # full materialization of the result
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    tput = kernel_throughput()
    timings["kernel_mticks_per_sec"] = round(tput / 1e6, 3)
    print(f"# kernel throughput: {tput/1e6:.2f} M ticks/s/core", file=sys.stderr)

    total = round(sum(v for k, v in timings.items() if k != "kernel_mticks_per_sec"), 3)
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
