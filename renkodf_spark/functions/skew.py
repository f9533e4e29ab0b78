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

def content_salt(df: DataFrame, buckets: int):
    """Column: a row-CONTENT hash bucket in ``[0, buckets)``.

    Deliberately not ``monotonically_increasing_id()`` (physical
    position) or ``rand()`` (partition-index seeded): a content hash
    makes every row's salt a pure function of the row itself, so
    stage-1 partials are bit-identical under task retry, speculative
    execution, and any repartitioning — the property that lets a
    re-run reducer be reconciled with the original.

    Caveat: fully identical rows share a salt, so a hot key whose rows
    are all byte-identical still lands in one bucket — but such rows
    carry identical aggregation contributions, and any real payload
    variation (an id, a timestamp) spreads them uniformly.

    Map-typed columns are excluded from the hash (``F.hash`` rejects
    them at analysis time); the salt hashes every other column, so a
    frame carrying an unrelated properties map still salts. A frame
    whose ONLY columns are maps degenerates to a single bucket —
    documented rather than guessed around."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    def hashable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return hashable(dt.elementType)
        if isinstance(dt, StructType):
            return all(hashable(f.dataType) for f in dt.fields)
        return True

    cols = [f.name for f in df.schema.fields if hashable(f.dataType)]
    if not cols:
        return F.lit(0)
    return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(buckets))


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

    salted = df.withColumn("__salt", content_salt(df, buckets))
    stage1 = salted.groupBy(*keys, "__salt").agg(*partials)
    return stage1.groupBy(*keys).agg(*finals)
