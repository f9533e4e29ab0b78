"""Equality comparison / diff oracle between engines (SURVEY.md O-22).

The reference compares engine outputs with strict `np.array_equal` and
a shift-tolerant diff walker (test/test_ws.py:45-48,
examples/comparison_ctrader.ipynb cell 21). The distributed versions:
`df_equal` via exceptAll in both directions (no collect of the big
side), `diff_report` as a keyed full-outer comparison returning only
the differing cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def df_equal(a: DataFrame, b: DataFrame, *, round_digits: int | None = None) -> bool:
    """Exact multiset equality of two DataFrames (schema order
    insensitive). Optionally round float columns first (the reference's
    round(x, 5) for FX golden comparison)."""
    cols = sorted(a.columns)
    if sorted(b.columns) != cols:
        return False

    def prep(df: DataFrame) -> DataFrame:
        out = df.select(*cols)
        if round_digits is not None:
            for c, t in out.dtypes:
                if t in ("double", "float"):
                    out = out.withColumn(c, F.round(F.col(c), round_digits))
        return out

    a2, b2 = prep(a), prep(b)
    return a2.exceptAll(b2).isEmpty() and b2.exceptAll(a2).isEmpty()


def diff_report(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    *,
    round_digits: int | None = None,
    max_rows: int = 100,
) -> DataFrame:
    """Keyed cell-level diff: one row per key present in either side
    with any differing column; columns `<col>_a` / `<col>_b` for the
    differing values. Drives the warm-start splice characterization
    (reference test/test_ws_ext.py:39-58)."""
    value_cols = [c for c in a.columns if c not in keys and c in b.columns]

    def prep(df: DataFrame, tag: str) -> DataFrame:
        out = df
        if round_digits is not None:
            for c, t in df.dtypes:
                if t in ("double", "float") and c in value_cols:
                    out = out.withColumn(c, F.round(F.col(c), round_digits))
        return out.select(*keys, *[F.col(c).alias(f"{c}_{tag}") for c in value_cols])

    j = prep(a, "a").join(prep(b, "b"), keys, "full_outer")
    any_diff = None
    for c in value_cols:
        ne = ~F.col(f"{c}_a").eqNullSafe(F.col(f"{c}_b"))
        any_diff = ne if any_diff is None else (any_diff | ne)
    return (
        j.filter(any_diff)
        .select(*keys, *[x for c in value_cols for x in (f"{c}_a", f"{c}_b")])
        .limit(max_rows)
    )
