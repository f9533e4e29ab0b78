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


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    *,
    how: str = "inner",
    buckets: int = 32,
) -> DataFrame:
    """Skew-resistant equi-join: replicate the (smaller) ``dim`` side
    ``buckets``× and salt the ``facts`` side by row-content hash, so a
    hot join key's fact rows spread over ``buckets`` reducers instead
    of funneling through one.

    When to reach for it: AQE's skew-join splitting handles most cases
    at runtime, but it only splits *partitions*, not single oversized
    keys inside a co-partitioned cache, and it is unavailable when the
    join feeds an operator that pins the partitioning. This is the
    explicit, deterministic fallback — same algebra, different layout.

    Semantics: identical to ``facts.join(dim, on, how)`` for ``inner``
    and ``left`` (every fact row carries exactly one salt; the dim
    replica with that salt provides exactly the rows the plain join
    would). ``right``/``full`` are rejected — the replicated side
    would multiply unmatched dim rows.

    Scale shape: dim rows shuffle ``buckets``× (cheap for a dimension
    orders of magnitude smaller than the facts); the facts shuffle
    once on (key..., salt), which is the point.  The salt reuses
    ``content_salt`` so stage outputs are bit-stable under retry and
    speculative execution.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = [on] if isinstance(on, str) else list(on)
    salted_facts = facts.withColumn("__salt", content_salt(facts, buckets))
    replicated = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    return salted_facts.join(replicated, [*on, "__salt"], how).drop("__salt")


def skew_report(
    df: DataFrame,
    key_cols: list[str] | str,
    *,
    top_k: int = 10,
) -> DataFrame:
    """Key-distribution observability: the top-``top_k`` hottest keys
    with exact integer shares — the report that tells an operator
    whether to reach for ``salted_agg`` / ``salted_join`` / AQE skew
    hints BEFORE a job funnels a hot key through one reducer.

    One row per hot key: ``(rank, key..., count, share_ppm,
    cum_share_ppm, total_rows, n_keys)`` — shares in exact integer
    parts-per-million (``count·10⁶ DIV total``, engine-reproducible),
    cumulative share over the (count desc, key) rank order.

    Scale shape: one map-side-combinable count aggregation, then rank/
    cumsum over the BOUNDED top-k relation only (TakeOrdered shape);
    the totals collapse to a broadcast row.
    """
    from pyspark.sql.window import Window

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("count"))
    totals = counts.agg(
        F.sum("count").cast("long").alias("__total"),
        F.count(F.lit(1)).cast("long").alias("__nkeys"),
    )
    order = [F.desc("count")] + [F.asc(k) for k in keys]
    top = (
        counts.withColumn("rank", F.row_number().over(Window.orderBy(*order)))
        .filter(F.col("rank") <= top_k)
    )
    w = Window.orderBy("rank").rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.crossJoin(F.broadcast(totals))
        .withColumn(
            "share_ppm",
            F.expr("CAST(count * 1000000 DIV __total AS BIGINT)"),
        )
        .withColumn(
            "cum_share_ppm",
            F.expr("CAST(SUM(count * 1000000 DIV __total) OVER "
                   "(ORDER BY rank ROWS UNBOUNDED PRECEDING) AS BIGINT)"),
        )
        .select(
            "rank", *keys, "count", "share_ppm", "cum_share_ppm",
            F.col("__total").alias("total_rows"),
            F.col("__nkeys").alias("n_keys"),
        )
    )
