"""One-pass table profiling: per-column completeness, cardinality, and
range statistics — the data-quality report a pipeline runs before and
after every ingest ("did the null rate jump? did cardinality collapse?
did a timestamp column drift into the future?").

Everything is computed in a SINGLE aggregation pass over the table
(Catalyst expands the per-column distinct counts into one multi-phase
aggregate), then pivoted to one row per column with ``stack`` — no
per-column scans, no driver loops.  Value statistics are typed per
column class so the output is engine-exact:

* numeric — min / max / avg, ROUNDed (the float-sum convention);
* timestamp — min / max as exact integer µs;
* string — lexicographic min / max and ROUNDed mean length;
* everything else — completeness and cardinality only.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

_NUMERIC = (ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)
_TIME = (TimestampType, TimestampNTZType, DateType)


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    *,
    round_digits: int = 4,
) -> DataFrame:
    """Profile ``columns`` (default: all) in one aggregation pass.

    Returns one row per column:
    ``(column, n_rows, n_nulls, n_distinct, numeric_min, numeric_max,
    numeric_avg, ts_min_us, ts_max_us, str_min, str_max, avg_len)``
    with the value fields NULL outside their column class.
    ``n_distinct`` is exact and excludes NULLs.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("columns must be non-empty")

    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    for i, c in enumerate(cols):
        dtype = df.schema[c].dataType
        col = F.col(c)
        aggs.append(
            F.sum(col.isNull().cast("long")).cast("long").alias(f"__nulls_{i}")
        )
        aggs.append(F.count_distinct(col).cast("long").alias(f"__dist_{i}"))
        if isinstance(dtype, _NUMERIC):
            aggs.append(F.round(F.min(col), round_digits).cast("double").alias(f"__nmin_{i}"))
            aggs.append(F.round(F.max(col), round_digits).cast("double").alias(f"__nmax_{i}"))
            aggs.append(F.round(F.avg(col), round_digits).cast("double").alias(f"__navg_{i}"))
        else:
            for s in ("nmin", "nmax", "navg"):
                aggs.append(F.lit(None).cast("double").alias(f"__{s}_{i}"))
        if isinstance(dtype, _TIME):
            t = F.unix_micros(col.cast("timestamp"))
            aggs.append(F.min(t).cast("long").alias(f"__tmin_{i}"))
            aggs.append(F.max(t).cast("long").alias(f"__tmax_{i}"))
        else:
            aggs.append(F.lit(None).cast("long").alias(f"__tmin_{i}"))
            aggs.append(F.lit(None).cast("long").alias(f"__tmax_{i}"))
        if isinstance(dtype, StringType):
            aggs.append(F.min(col).alias(f"__smin_{i}"))
            aggs.append(F.max(col).alias(f"__smax_{i}"))
            aggs.append(
                F.round(F.avg(F.length(col)), round_digits)
                .cast("double")
                .alias(f"__slen_{i}")
            )
        else:
            aggs.append(F.lit(None).cast("string").alias(f"__smin_{i}"))
            aggs.append(F.lit(None).cast("string").alias(f"__smax_{i}"))
            aggs.append(F.lit(None).cast("double").alias(f"__slen_{i}"))

    one = df.agg(*aggs)

    fields = []
    for i, c in enumerate(cols):
        fields.extend(
            [
                # the name becomes a single-quoted SQL literal — escape
                # embedded quotes so exotic column names can't break or
                # inject into the stack() expression
                "'" + c.replace("'", "''") + "'",
                "__n",
                f"__nulls_{i}",
                f"__dist_{i}",
                f"__nmin_{i}",
                f"__nmax_{i}",
                f"__navg_{i}",
                f"__tmin_{i}",
                f"__tmax_{i}",
                f"__smin_{i}",
                f"__smax_{i}",
                f"__slen_{i}",
            ]
        )
    stack = (
        f"stack({len(cols)}, " + ", ".join(fields) + ") AS "
        "(column, n_rows, n_nulls, n_distinct, numeric_min, numeric_max, "
        "numeric_avg, ts_min_us, ts_max_us, str_min, str_max, avg_len)"
    )
    return one.select(F.expr(stack))
