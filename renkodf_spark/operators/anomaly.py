"""Rolling-window anomaly scoring: trailing z-scores on a metric
column — the monitoring primitive ("is this value unusual for its
recent history?") for metric streams and data-quality gates.

Cross-engine exactness follows the house frame rule: windowed FLOAT
aggregates can never hash-match another engine (segment-tree
re-association), so the value is fixed-pointed to integer cents ONCE
and the frame sums (``Σv``, ``Σv²``) are exact longs in any
association.  Mean and variance are then single IEEE expressions over
exact integers — identical in any engine — and only the final z-score
is rounded.

Overflow bound: ``Σv²`` over a window of ``n`` rows needs
``n · (100·|v|)² < 2^63`` — e.g. |v| ≤ 1e6 allows windows to ~92k
rows; raise ``scale`` down (coarser cents) for wider regimes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_zscore(
    df: DataFrame,
    *,
    value_col: str,
    order_cols: list[str],
    partition_cols: list[str] | None = None,
    window: int = 100,
    threshold: float = 3.0,
    round_digits: int = 4,
    scale: int = 100,
) -> DataFrame:
    """Append ``(window_n, zscore, is_anomaly)``: the z-score of each
    row's value against its trailing ``window`` rows (inclusive) within
    its partition, in ``order_cols`` order (make the order total — add
    an id tie-break — or frame membership is layout-dependent).

    ``zscore`` is NULL while the window holds < 3 rows or has zero
    variance; ``is_anomaly`` is 1 iff ``|z| > threshold``.  Sample
    (n−1) variance.

    Scale shape: one shuffle on the partition columns; both frame sums
    share the single sort.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    part = list(partition_cols or [])
    v = F.round(F.col(value_col) * scale).cast("long")
    w = (
        Window.partitionBy(*part)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(-(window - 1), 0)
    )
    out = (
        df.withColumn("__vc", v)
        .withColumn("__n", F.count("__vc").over(w).cast("long"))
        .withColumn("__s", F.sum("__vc").over(w).cast("long"))
        .withColumn("__ss", F.sum(F.col("__vc") * F.col("__vc")).over(w).cast("long"))
    )
    n = F.col("__n").cast("double")
    s = F.col("__s").cast("double")
    ss = F.col("__ss").cast("double")
    var = (ss - s * s / n) / (n - F.lit(1.0))  # sample variance, cents²
    z = (F.col("__vc").cast("double") - s / n) / F.sqrt(var)
    zscore = F.when(
        (F.col("__n") >= 3) & (var > 0), F.round(z, round_digits)
    ).otherwise(F.lit(None).cast("double"))
    return (
        out.withColumn("window_n", F.col("__n"))
        .withColumn("zscore", zscore)
        .withColumn(
            "is_anomaly",
            F.coalesce(
                (F.abs(F.col("zscore")) > F.lit(threshold)).cast("int"), F.lit(0)
            ),
        )
        .drop("__vc", "__n", "__s", "__ss")
    )
