"""Tick ingestion: the engine-side version of the reference's input
contract (renkodf.py:29-49 / SURVEY.md O-1, O-2, O-20):

- only `close` is required; `datetime` falls back to another column
- `bid`->`close` style renames (test/test_ws.py:15)
- integer epoch timestamps with a unit (`ts_unit`, renkodf.py:455)
- parquet / CSV / JSON, batch or streaming, same normalization

plus sinks for the brick tables (partitioned parquet — the natural
layout for downstream pruning by symbol/date).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def normalize_ticks(
    df: DataFrame,
    *,
    price_col: str = "close",
    time_col: str | None = None,
    symbol_col: str | None = None,
    ts_unit: str | None = None,
) -> DataFrame:
    """Produce the canonical (symbol, event_time, close) tick frame.

    - `price_col` is renamed to `close` (e.g. bid/price/last)
    - `time_col` becomes `event_time`; if it is integral, `ts_unit`
      (s/ms/us/ns) converts it (reference ts_unit, renkodf.py:455)
    - a missing symbol column becomes the single-instrument '0'
    """
    if price_col not in df.columns:
        raise ValueError(f"Column '{price_col}' doesn't exist!")
    out = df.withColumnRenamed(price_col, "close") if price_col != "close" else df
    out = out.withColumn("close", F.col("close").cast("double"))

    if time_col is None:
        candidates = [c for c in ("event_time", "datetime", "timestamp", "ts", "time") if c in out.columns]
        if not candidates:
            raise ValueError("no time column found; pass time_col=")
        time_col = candidates[0]
    if time_col != "event_time":
        out = out.withColumnRenamed(time_col, "event_time")

    dtype = dict(out.dtypes)["event_time"]
    if dtype in ("bigint", "int", "long", "double"):
        unit = ts_unit or "us"
        if unit == "ns":
            out = out.withColumn("event_time", F.timestamp_micros(F.expr("event_time div 1000")))
        elif unit == "us":
            out = out.withColumn("event_time", F.timestamp_micros(F.col("event_time").cast("long")))
        elif unit == "ms":
            out = out.withColumn("event_time", F.timestamp_millis(F.col("event_time").cast("long")))
        elif unit == "s":
            out = out.withColumn("event_time", F.timestamp_seconds(F.col("event_time").cast("long")))
        else:
            raise ValueError(f"unknown ts_unit '{unit}' (use s/ms/us/ns)")
    elif dtype == "string":
        out = out.withColumn("event_time", F.to_timestamp("event_time"))

    if symbol_col is None:
        out = out.withColumn("symbol", F.lit("0")) if "symbol" not in out.columns else out
    elif symbol_col != "symbol":
        out = out.withColumnRenamed(symbol_col, "symbol")
    return out


TICK_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
        T.StructField("close", T.DoubleType()),
    ]
)


def read_ticks(
    spark: SparkSession,
    path: str,
    *,
    format: str = "parquet",
    streaming: bool = False,
    schema: T.StructType | None = None,
    **normalize_kwargs,
) -> DataFrame:
    """Read + normalize ticks from parquet/csv/json, batch or streaming.

    CSV/JSON require a schema in streaming mode (Spark rule); batch CSV
    uses header inference only when no schema is given (avoid at scale)."""
    reader = spark.readStream if streaming else spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if format == "csv":
        if schema is None and not streaming:
            reader = reader.option("header", True).option("inferSchema", True)
        else:
            reader = reader.option("header", True)
        df = reader.csv(path)
    elif format == "json":
        df = reader.json(path)
    else:
        df = reader.parquet(path)
    return normalize_ticks(df, **normalize_kwargs)


def write_bricks(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: tuple = ("symbol",),
) -> None:
    """Persist a brick table partitioned for downstream pruning.
    At scale add a date column to partition_by so partition pruning and
    symbol pruning compose."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)
