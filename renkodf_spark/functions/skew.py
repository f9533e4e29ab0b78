"""Skew mitigation: two-stage (salted) aggregation.

AQE's skew handling covers joins; a groupBy on a hot key still funnels
that key's rows through one reducer. `salted_agg` splits every key into
`buckets` salted sub-keys, partially aggregates (map-side combine works
per sub-key), then merges — the hot key's work spreads over `buckets`
reducers. Only algebraic aggregates are supported (sum/count/min/max/avg)
because they decompose into partial + merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)) if c == "*" else F.count(c),
    "min": F.min,
    "max": F.max,
}
_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    buckets: int = 32,
) -> DataFrame:
    """``aggs``: output_name -> (fn, column) with fn in
    sum/count/min/max/avg; column '*' allowed for count.

    Example::

        salted_agg(events, ["event_type"],
                   {"n": ("count", "*"), "total": ("sum", "value")})
    """
    partials = []
    finals = []
    for name, (fn, col) in aggs.items():
        if fn == "avg":
            partials.append(F.sum(col).alias(f"__s_{name}"))
            partials.append(F.count(col).alias(f"__c_{name}"))
            finals.append((F.sum(f"__s_{name}") / F.sum(f"__c_{name}")).alias(name))
        elif fn in _PARTIAL:
            partials.append(_PARTIAL[fn](col).alias(f"__p_{name}"))
            finals.append(_MERGE[fn](f"__p_{name}").alias(name))
        else:
            raise ValueError(f"unsupported aggregate '{fn}' (algebraic only)")

    salted = df.withColumn("__salt", F.pmod(F.monotonically_increasing_id(), F.lit(buckets)))
    stage1 = salted.groupBy(*keys, "__salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)
