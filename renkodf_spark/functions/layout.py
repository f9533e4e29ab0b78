"""Z-order (Morton) data layout: interleave the bits of two integer
dimensions so range-partitioning + within-partition sorting on ONE key
co-clusters BOTH — parquet row-group min/max stats then prune scans
filtered on either dimension (the Delta/Iceberg OPTIMIZE ZORDER idea,
expressed with plain Spark built-ins).

The bit interleave is pure integer arithmetic generated as a column
expression (JVM whole-stage codegen, zero-shuffle); the companion SQL
generator emits the identical expression for the DuckDB oracle, the
same sharing pattern as similarity.rp_planes' inlined constants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, *, bits: int = 16) -> Column:
    """Morton key of two non-negative integer columns, each masked to
    ``bits`` low bits: bit ``i`` of ``x`` lands at position ``2i``, bit
    ``i`` of ``y`` at ``2i + 1``. With ``bits <= 31`` the result fits a
    long. Callers quantize floats/timestamps to ints first (bucket
    width = value range / 2^bits)."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mask = (1 << bits) - 1
    xm = x.cast("long").bitwiseAND(F.lit(mask))
    ym = y.cast("long").bitwiseAND(F.lit(mask))
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zvalue_sql(x_sql: str, y_sql: str, *, bits: int = 16) -> str:
    """The identical Morton expression as ANSI/DuckDB SQL text, for
    oracle replay. ``x_sql`` / ``y_sql`` are integer-typed SQL
    expressions."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    mask = (1 << bits) - 1
    xm = f"(CAST({x_sql} AS BIGINT) & {mask})"
    ym = f"(CAST({y_sql} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xm} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ym} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    *,
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "__zkey",
) -> DataFrame:
    """Re-layout ``df`` for two-dimensional scan pruning: compute the
    Morton key of ``(x_col, y_col)``, range-partition on it, and sort
    within partitions — so a subsequent parquet write produces files
    AND row groups whose min/max stats are tight on *both* source
    columns. The key column is kept (callers drop it after writing if
    they don't want it persisted).

    Scale shape: one range-exchange (samples the key to build balanced
    bounds — the same mechanics as any global sort, AQE-coalesced) and
    a per-partition sort; the narrow integer key adds 8 bytes/row. At
    100 TB this is the standard compaction pass run once per ingest
    window, not per query; every later scan filtered on either
    dimension prunes files by footer stats instead of reading them.
    """
    keyed = df.withColumn(key_col, zvalue(F.col(x_col), F.col(y_col), bits=bits))
    parts = (
        keyed.repartitionByRange(num_partitions, key_col)
        if num_partitions is not None
        else keyed.repartitionByRange(key_col)
    )
    return parts.sortWithinPartitions(key_col)
