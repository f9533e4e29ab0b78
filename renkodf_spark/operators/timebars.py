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
    seq_col: str | None = None,
) -> DataFrame:
    """OHLCV bars per (symbol, tumbling interval).

    Tie-break semantics (VERDICT r3 item 4): ticks sharing a timestamp
    need a total order for open/close to be well-defined. Pass
    ``seq_col`` (an arrival-sequence column, e.g. the exchange's trade
    id) to break ties by arrival — the faithful semantics. Without one,
    ties break on the price itself (open = lowest, close = highest
    price at the tied timestamp): an arbitrary but PARTITION-LAYOUT-
    INDEPENDENT rule, so the same input gives the same bars under any
    repartitioning. The previous fallback, monotonically_increasing_id,
    depended on physical row order and made duplicate-timestamp bars
    nondeterministic across layouts."""
    base = ticks.select(
        F.col(symbol_col).alias("symbol"),
        F.col(time_col).alias("t"),
        F.col(price_col).cast("double").alias("p"),
        *([F.col(seq_col).alias("__seq")] if seq_col else []),
    )
    tie = [F.col("__seq")] if seq_col else []
    first_s = F.min(F.struct(F.col("t"), *tie, F.col("p")))
    last_s = F.max(F.struct(F.col("t"), *tie, F.col("p")))
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
