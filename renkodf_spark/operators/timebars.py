"""Time-bar (OHLCV) downsampling: ticks -> fixed-interval bars.

The natural sibling of the Renko operator for any tick engine (the
reference's cTrader golden exports are themselves produced from such
bars). Unlike Renko this IS expressible as a plain windowed
aggregation, so it stays entirely JVM-side:

- open/close are deterministic argmin/argmax over (event_time, seq,
  price) struct comparisons — no order-dependent `first()` in an
  aggregation, which Spark does not guarantee;
- one shuffle on (symbol, bucket); partial aggregation combines
  map-side like any algebraic agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_bars(
    ticks: DataFrame,
    interval: str = "1 hour",
    *,
    symbol_col: str = "symbol",
    time_col: str = "event_time",
    price_col: str = "close",
) -> DataFrame:
    """OHLCV bars per (symbol, tumbling interval).

    Ties at identical timestamps break on the pre-shuffle input order
    id, making open/close deterministic under any partitioning."""
    seq = F.monotonically_increasing_id()
    base = ticks.select(
        F.col(symbol_col).alias("symbol"),
        F.col(time_col).alias("t"),
        F.col(price_col).cast("double").alias("p"),
        seq.alias("__seq"),
    )
    first_s = F.min(F.struct(F.col("t"), F.col("__seq"), F.col("p")))
    last_s = F.max(F.struct(F.col("t"), F.col("__seq"), F.col("p")))
    return (
        base.groupBy("symbol", F.window("t", interval).alias("w"))
        .agg(
            first_s.getField("p").alias("open"),
            F.max("p").alias("high"),
            F.min("p").alias("low"),
            last_s.getField("p").alias("close"),
            F.count(F.lit(1)).alias("volume"),
        )
        .select(
            "symbol",
            F.col("w.start").alias("bar_start"),
            "open",
            "high",
            "low",
            "close",
            "volume",
        )
    )
