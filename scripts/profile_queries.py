"""Per-query profiling tool for the optimization rounds.

Times individual headline queries with the bench's exact methodology
(same session config, same pruning-proof ``materialize``), and/or dumps
``.explain("formatted")`` plans to ``plans/<tag>/<query>_<suffix>.txt``.

Usage:
  python scripts/profile_queries.py --plans-only --suffix before q1 q2 ...
  python scripts/profile_queries.py --samples 2 q1 q2 ...
  python scripts/profile_queries.py --plans-only --suffix before ALL

This is a developer tool; the committed numbers come from bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--suffix", default=None, help="dump plans with this suffix")
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from renkodf_spark.session import build_session

    spark = build_session(
        "renkodf-spark-profile", cores=int(CPUS), driver_memory="24g"
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd
    from pyspark.sql import functions as F

    import renkodf_spark.queries as q
    from bench import HEADLINE, materialize

    builders = q.queries()
    names = list(builders) if args.queries == ["ALL"] else (
        HEADLINE if args.queries == ["HEADLINE"] else args.queries
    )
    for n in names:
        if n not in builders:
            raise SystemExit(f"unknown query: {n}")

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    if args.suffix:
        os.makedirs(plans_dir, exist_ok=True)

    # warm-up identical to bench.py
    spark.range(1_000).select(F.sum("id")).collect()
    (
        spark.range(1_000)
        .withColumn("g", F.col("id") % 8)
        .groupBy("g")
        .applyInPandas(lambda pdf: pd.DataFrame({"n": [len(pdf)]}), "n long")
        .collect()
    )

    results: dict[str, dict] = {}
    if args.suffix:
        for name in names:
            df = builders[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
            print(f"# plan dumped: {name}_{args.suffix}.txt", file=sys.stderr)

    if not args.plans_only:
        samples: dict[str, list] = {n: [] for n in names}
        for _pass in range(args.samples):
            for name in names:
                spark.catalog.clearCache()
                spark.sparkContext.setJobDescription(f"profile:{name}")
                t0 = time.perf_counter()
                df = builders[name](spark, SF_DIR)
                rows = materialize(df)
                el = time.perf_counter() - t0
                samples[name].append(round(el, 3))
                print(f"# {name}: {el:.3f}s ({rows} rows)", file=sys.stderr)
        for name in names:
            results[name] = {
                "min": min(samples[name]),
                "samples": samples[name],
            }
        print(json.dumps(results, indent=1))
        if args.json_out:
            with open(args.json_out, "w") as f:
                json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
