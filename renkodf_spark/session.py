"""Session factory with the engine's recommended configuration.

Everything here is a *default*, not a requirement — the operators work
on any SparkSession (the driver gate passes one in); the factory just
encodes the settings we tune for:

- UTC session timezone: timestamps compare bit-for-bit against
  UTC-naive engines (DuckDB oracle, parquet ms/us columns).
- AQE on: runtime coalescing + skew-join splitting cover the skewed
  symbol/bucket cases without manual salting in the common path.
- shuffle partitions ~ cores locally (the 200 default over-parallelizes
  small local runs; on a real cluster size it to 2-3x total cores).
- Arrow batch size bounded: grouped-map kernels stream symbol histories
  through fixed-size Arrow batches instead of one giant allocation.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app: str = "renkodf-spark",
    *,
    master: str | None = None,
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str = "8g",
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = cores

    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # write-path posture (optimization guide §6): zstd beats snappy
        # on ratio at similar read speed for the persisted index/graph
        # layouts; local A/B neutral (tiny files), the win is at scale
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
