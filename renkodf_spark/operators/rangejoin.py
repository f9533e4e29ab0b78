"""Range joins (point-in-interval and interval-overlap) as bounded
equi-joins.

Spark's own planner turns an inequality-only join condition into a
``BroadcastNestedLoopJoin`` (or a cartesian product) — O(|L|·|R|) work
that is fine for a broadcast-sized side and catastrophic for two large
inputs.  The classic distributed strategy is *bin bucketing*: quantize
the domain into fixed-width bins, explode each interval onto every bin
it covers, hash-partition both sides by (key..., bin), and equi-join —
the inequality predicate is then only a residual filter over candidate
pairs that already share a bin.  At 100 TB this is the difference
between a shuffle-bounded join and an unrunnable cross product.

Correctness of the dedup rules:

* point-in-interval — a point lives in exactly ONE bin, so each
  (point, interval) candidate pair is generated at most once; no dedup
  is needed.
* interval-overlap — two overlapping intervals share every bin covered
  by their intersection, so a pair would be emitted once per shared
  bin.  The intersection of ``[ls, le)`` and ``[rs, re)`` starts at
  ``max(ls, rs)``; both sides always cover the bin containing that
  start, and it is the FIRST bin they share.  Keeping only the
  candidate row whose bin equals ``floor(max(ls, rs) / width)``
  therefore keeps each overlapping pair exactly once.

Bin width is the operator's one tuning knob: each interval explodes to
``ceil(span / width) + 1`` rows, so width should be on the order of the
typical interval span (wider = fewer replicas, more residual-filter
work per bin).  ``max_bins_per_interval`` turns a mis-sized width into
a loud plan-time-cheap runtime error instead of a silent 10^6-row
explode.

The reference engine (srlcarlg/renkodf) has no join surface at all —
this module is part of the declared relational extension surface
(SURVEY.md §2 Part B), alongside `operators/asof.py`.
"""

from __future__ import annotations

from datetime import timedelta

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import DateType, TimestampType, TimestampNTZType

_BIN = "__rj_bin"


def _domain_col(df: DataFrame, name: str) -> Column:
    """Project a join-domain column onto BIGINT (µs for time types)."""
    dtype = df.schema[name].dataType
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return F.unix_micros(F.col(name).cast("timestamp"))
    if isinstance(dtype, DateType):
        return F.unix_micros(F.col(name).cast("timestamp"))
    return F.col(name).cast("long")


def _width_micros(bin_width) -> int:
    if isinstance(bin_width, timedelta):
        width = bin_width // timedelta(microseconds=1)  # exact integer µs
    else:
        width = int(bin_width)
    if width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width!r}")
    return width


def _interval_bins(
    start: Column, end: Column, width: int, bounds: str, max_bins: int | None
) -> Column:
    """All bin ids covered by [start, end) or [start, end]."""
    # [s, e): the interval's last covered point is e-1; [s, e]: it is e.
    #
    # Float-division precision note (the setsim/quantiles integer-div
    # audit, r13): floor(x / w) under float64 can be off by one for
    # |x| > 2^53 (epoch-µs stays below that until ~year 2255, but the
    # long domain accepts arbitrary BIGINTs). That is STILL SOUND here:
    # both the point side and the interval side bin through this same
    # monotone map (float division by a positive constant is monotone,
    # floor is monotone), so a covered point's bin always lies within
    # [first_bin, last_bin] and sequence() enumerates every integer in
    # between — no pair can be missed; the exact residual predicate
    # then discards any boundary spill. Bin LABELS near 2^53 may be
    # shifted by one, which nothing downstream interprets.
    last = end - F.lit(1) if bounds == "[)" else end
    first_bin = F.floor(start / F.lit(width))
    last_bin = F.greatest(F.floor(last / F.lit(width)), first_bin)
    if max_bins is not None:
        n = last_bin - first_bin + F.lit(1)
        last_bin = F.when(
            n > F.lit(int(max_bins)),
            F.raise_error(
                F.concat(
                    F.lit(
                        f"rangejoin: interval covers more than {max_bins} "
                        "bins; raise bin_width or max_bins_per_interval"
                    )
                )
            ).cast("long"),
        ).otherwise(last_bin)
    return F.explode(F.sequence(first_bin, last_bin))


def _check_disjoint(left: DataFrame, right: DataFrame, on: list[str]) -> None:
    overlap = (set(left.columns) & set(right.columns)) - set(on)
    if overlap:
        raise ValueError(
            "rangejoin requires disjoint non-key column names; shared: "
            f"{sorted(overlap)} — alias one side first"
        )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    bin_width,
    bounds: str = "[)",
    how: str = "inner",
    max_bins_per_interval: int | None = 4096,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    ``bounds`` is ``"[)"`` (default, closed-open) or ``"[]"``.
    ``how`` is ``inner`` or ``left`` (left = keep unmatched points with
    NULL interval columns).  Output = points.* ++ intervals.* (non-key
    names must be disjoint).  One shuffle per side on (on..., bin);
    never a nested-loop or cartesian plan.
    """
    if bounds not in ("[)", "[]"):
        raise ValueError(f"bounds must be '[)' or '[]', got {bounds!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    on = list(on or [])
    _check_disjoint(points, intervals, on)

    width = _width_micros(bin_width)
    p_long = _domain_col(points, point_col)
    s_long = _domain_col(intervals, start_col)
    e_long = _domain_col(intervals, end_col)

    pts = points.withColumn(_BIN, F.floor(p_long / F.lit(width)))
    ivs = intervals.withColumn(
        _BIN, _interval_bins(s_long, e_long, width, bounds, max_bins_per_interval)
    )

    cond = [pts[_BIN] == ivs[_BIN]] + [pts[k] == ivs[k] for k in on]
    # residual: re-derive the long projections on the joined frames
    p_j = _domain_col(pts, point_col)
    s_j = _domain_col(ivs, start_col)
    e_j = _domain_col(ivs, end_col)
    in_iv = (p_j >= s_j) & ((p_j < e_j) if bounds == "[)" else (p_j <= e_j))
    if how == "inner":
        joined = pts.join(ivs, [*cond, in_iv], "inner")
        out_keys = [pts[k].alias(k) for k in on]
    else:
        joined = pts.join(ivs, [*cond, in_iv], "left")
        out_keys = [pts[k].alias(k) for k in on]
    keep_p = [pts[c] for c in points.columns if c not in on]
    keep_i = [ivs[c] for c in intervals.columns if c not in on]
    return joined.select(*out_keys, *keep_p, *keep_i)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    bin_width,
    bounds: str = "[)",
    max_bins_per_interval: int | None = 4096,
) -> DataFrame:
    """Inner-join interval rows that overlap.

    Overlap for ``"[)"`` bounds is ``ls < re AND rs < le``; for
    ``"[]"`` it is ``ls <= re AND rs <= le``.  Each overlapping pair is
    emitted exactly once (first-shared-bin rule, see module docstring).
    """
    if bounds not in ("[)", "[]"):
        raise ValueError(f"bounds must be '[)' or '[]', got {bounds!r}")
    on = list(on or [])
    _check_disjoint(left, right, on)

    width = _width_micros(bin_width)
    ls = _domain_col(left, left_start)
    le = _domain_col(left, left_end)
    rs = _domain_col(right, right_start)
    re = _domain_col(right, right_end)

    lx = left.withColumn(
        _BIN, _interval_bins(ls, le, width, bounds, max_bins_per_interval)
    )
    rx = right.withColumn(
        _BIN, _interval_bins(rs, re, width, bounds, max_bins_per_interval)
    )

    cond = [lx[_BIN] == rx[_BIN]] + [lx[k] == rx[k] for k in on]
    ls_j, le_j = _domain_col(lx, left_start), _domain_col(lx, left_end)
    rs_j, re_j = _domain_col(rx, right_start), _domain_col(rx, right_end)
    if bounds == "[)":
        overlap = (ls_j < re_j) & (rs_j < le_j)
    else:
        overlap = (ls_j <= re_j) & (rs_j <= le_j)
    first_shared = lx[_BIN] == F.floor(F.greatest(ls_j, rs_j) / F.lit(width))

    joined = lx.join(rx, [*cond, overlap, first_shared], "inner")
    out_keys = [lx[k].alias(k) for k in on]
    keep_l = [lx[c] for c in left.columns if c not in on]
    keep_r = [rx[c] for c in right.columns if c not in on]
    return joined.select(*out_keys, *keep_l, *keep_r)
