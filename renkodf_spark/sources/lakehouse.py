"""Lakehouse-format connectors (Delta / Iceberg / Hudi), gated behind
import-try: their jars are not on this image's classpath (per the
environment contract), so these helpers either delegate to the real
readers when available or fail with a precise, actionable error instead
of an opaque ClassNotFoundException mid-job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _format_available(spark: SparkSession, fmt: str, probe_class: str) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(probe_class)  # type: ignore[union-attr]
        return True
    except Exception:
        return False


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    if not _format_available(spark, "delta", "org.apache.spark.sql.delta.DeltaLog"):
        raise ImportError(
            "Delta Lake jars are not on the classpath. Add "
            "io.delta:delta-spark_2.13 and the DeltaCatalog confs, then "
            "spark.read.format('delta').load(path) — this helper will pick it up."
        )
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    if not _format_available(spark, "iceberg", "org.apache.iceberg.spark.SparkCatalog"):
        raise ImportError(
            "Iceberg runtime is not on the classpath. Add "
            "org.apache.iceberg:iceberg-spark-runtime and a catalog conf; "
            "then spark.table('catalog.db.table')."
        )
    return spark.table(table)


def read_hudi(spark: SparkSession, path: str) -> DataFrame:
    if not _format_available(spark, "hudi", "org.apache.hudi.DefaultSource"):
        raise ImportError(
            "Hudi bundle is not on the classpath. Add "
            "org.apache.hudi:hudi-spark-bundle, then "
            "spark.read.format('hudi').load(path)."
        )
    return spark.read.format("hudi").load(path)
