"""Batch Renko operator: ticks DataFrame -> wide brick DataFrame -> mode
projections.

Spark-first layout (SURVEY.md §1.4 / §2 O-5): the brick-ification
recurrence is non-associative (every brick depends on the running
`last_close` over the whole prefix), so it cannot be a join/window
composition. It runs as a grouped-map Pandas UDF — parallel across
symbols, sequential within a symbol, exactly the reference's
parallelism model (the reference is single-threaded per instrument).
Everything around the kernel (projection, export, slicing) is plain
DataFrame API so Catalyst prunes/pushes as usual.

Reference semantics reproduced: `Renko.__init__` validation
(renkodf.py:42-49), `_create_renko` (renkodf.py:71-252), first-brick
label drop (renkodf.py:69), `renko_df` projection (renkodf.py:291-387),
`to_rws` export (renkodf.py:389-420).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from renkodf_spark.kernel import (
    WIDE_VALUE_COLUMNS,
    choose_scan,
    new_output,
    new_state,
    output_arrays,
    scan_ticks,
    scan_ticks_vectorized,
)
from renkodf_spark.schema import (
    MODE_SOURCES,
    MODES,
    UTILS_COLUMNS,
    WIDE_COLUMN_NAMES,
    WIDE_SCHEMA,
)

_SEQ_COL = "__tick_seq"


def renko_pandas(
    pdf: pd.DataFrame,
    brick_size: float,
    *,
    time_col: str = "event_time",
    price_col: str = "close",
    drop_first: bool = True,
) -> pd.DataFrame:
    """Run the Renko kernel over one already-sorted pandas tick frame.

    Returns the wide brick table (without `symbol`/`brick_seq`; the
    Spark wrapper adds those). Used inside `applyInPandas` and directly
    by unit tests.
    """
    times = pdf[time_col].to_numpy()
    prices_np = pdf[price_col].to_numpy()
    out = new_output()
    if len(prices_np) > 0:
        state = new_state(float(prices_np[0]), brick_size)
        if choose_scan(prices_np, brick_size):
            scan_ticks_vectorized(times, prices_np, 1, brick_size, state, out)
        else:
            # python-list indexing is ~2x faster than numpy scalar access
            scan_ticks(times, prices_np.tolist(), 1, brick_size, state, out)

    arrs = output_arrays(out)
    # a brick's close time is its closing tick's timestamp: fancy-index
    # the tick array instead of converting boxed datetime scalars
    event_time = (
        times[arrs["tick_index_close"]]
        if len(times)
        else np.empty(0, dtype="datetime64[us]")
    )
    wide = {"event_time": event_time}
    for name in WIDE_VALUE_COLUMNS:
        wide[name] = arrs[name]
    res = pd.DataFrame(wide)

    if drop_first and len(res):
        # reference drops by index label (renkodf.py:69): every brick
        # sharing the first brick's close timestamp goes away
        res = res[res["event_time"] != res["event_time"].iloc[0]].reset_index(drop=True)
    return res


def renko(
    ticks: DataFrame,
    brick_size: float,
    *,
    symbol_col: str = "symbol",
    time_col: str = "event_time",
    price_col: str = "close",
    drop_first: bool = True,
    value_columns: tuple | None = None,
) -> DataFrame:
    """Compress a tick DataFrame into the wide Renko brick table.

    Scale model: one shuffle on `symbol`, then each symbol's ticks are
    compressed sequentially inside a single Arrow-batched Python worker
    call. At 100 TB the parallel axis is symbols (x days via the
    warm-start splitter); there is no other shuffle in the plan.

    Column pruning happens on both sides of the kernel: only
    (symbol, time, price) travel in, and `value_columns` trims what
    travels out (Catalyst cannot prune through a grouped-map UDF's
    output schema, so callers that want one mode pass just its columns
    — `renko_mode` does this automatically)."""
    if brick_size is None or brick_size <= 0:
        raise ValueError("brick_size cannot be 'None' or '<= 0'")
    if price_col not in ticks.columns:
        raise ValueError(f"Column '{price_col}' doesn't exist!")

    if symbol_col not in ticks.columns:
        ticks = ticks.withColumn(symbol_col, F.lit("0"))
    if time_col not in ticks.columns:
        raise ValueError(f"Column '{time_col}' doesn't exist!")

    if value_columns is None:
        out_schema = WIDE_SCHEMA
        out_columns = list(WIDE_COLUMN_NAMES)
    else:
        unknown = set(value_columns) - set(WIDE_VALUE_COLUMNS)
        if unknown:
            raise ValueError(f"unknown wide columns: {sorted(unknown)}")
        keep = {"symbol", "brick_seq", "event_time", *value_columns}
        out_schema = T.StructType([f for f in WIDE_SCHEMA.fields if f.name in keep])
        out_columns = [f.name for f in out_schema.fields]

    # Deterministic intra-timestamp order: capture input order before the
    # shuffle so equal-timestamp ticks replay in file order. Null/NaN
    # prices or timestamps are dropped up front — the recurrence would
    # otherwise silently absorb NaN into the wick state (the reference
    # has no guard and corrupts); the filter sits on the scan so it
    # pushes down.
    slim = ticks.select(
        F.col(symbol_col).cast("string").alias("symbol"),
        F.col(time_col).alias("__time"),
        F.col(price_col).cast("double").alias("__price"),
        F.monotonically_increasing_id().alias(_SEQ_COL),
    ).filter(
        F.col("__time").isNotNull() & F.col("__price").isNotNull() & ~F.isnan("__price")
    )

    # Arrow-native kernel host (r8): the old applyInPandas run paid,
    # per group, a pandas mergesort (5x slower than lexsort+take at
    # 10M rows), a BlockManager-consolidating DataFrame build, a
    # boolean-mask first-drop copy, and a column-reorder copy — then
    # Spark converted the frame back to Arrow anyway. applyInArrow
    # hands the group in as a pa.Table (primitive columns view as
    # numpy zero-copy) and takes arrays back zero-copy: measured 5x
    # end-to-end on a 10M-tick group at ~0.15 bricks/tick.
    def run_arrow(tbl: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        tbl = tbl.combine_chunks()
        ts_type = tbl.schema.field("__time").type
        t = tbl.column("__time").to_numpy(zero_copy_only=False)
        p = tbl.column("__price").to_numpy(zero_copy_only=False)
        s = tbl.column(_SEQ_COL).to_numpy(zero_copy_only=False)
        # stable total order (__seq is unique) == the old mergesort
        order = np.lexsort((s, t.view("int64")))
        t = t[order]
        p = p[order]
        ev, arrs = _scan_sorted(t, p, brick_size)
        # reference drops by index label (renkodf.py:69): every brick
        # sharing the first brick's close timestamp goes away — ev is
        # nondecreasing, so that's a prefix slice, not a mask copy
        cut = (
            int(np.searchsorted(ev, ev[0], side="right"))
            if (drop_first and len(ev))
            else 0
        )
        m = len(ev) - cut
        sym = tbl.column("symbol")[0].as_py() if tbl.num_rows else ""
        cols: dict[str, pa.Array] = {
            "symbol": _const_str_array(sym, m),
            "brick_seq": pa.array(np.arange(m, dtype=np.int64)),
            "event_time": pa.array(ev[cut:]).cast(ts_type),
        }
        for name in WIDE_VALUE_COLUMNS:
            cols[name] = pa.array(arrs[name][cut:])
        return pa.table({c: cols[c] for c in out_columns})

    return slim.groupBy("symbol").applyInArrow(run_arrow, out_schema)


def _scan_sorted(times: np.ndarray, prices: np.ndarray, brick_size: float):
    """Kernel over already-sorted tick arrays: returns (event_time
    array, wide value arrays) — the shared numpy core of the Arrow
    hosts (no pandas, no copies beyond the kernel's own buffers)."""
    out = new_output()
    if len(prices) > 0:
        state = new_state(float(prices[0]), brick_size)
        if choose_scan(prices, brick_size):
            scan_ticks_vectorized(times, prices, 1, brick_size, state, out)
        else:
            # python-list indexing is ~2x faster than numpy scalar access
            scan_ticks(times, prices.tolist(), 1, brick_size, state, out)
    arrs = output_arrays(out)
    ev = (
        times[arrs["tick_index_close"]]
        if len(times)
        else np.empty(0, dtype="datetime64[us]")
    )
    return ev, arrs


def _const_str_array(value: str, n: int):
    """Length-``n`` constant string column without an O(n) Python-object
    pass: a dictionary array over one value, cast to plain string."""
    import pyarrow as pa

    if n == 0:
        return pa.array([], pa.string())
    return pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int32)), pa.array([value], pa.string())
    ).cast(pa.string())


def renko_df(
    wide: DataFrame,
    mode: str = "wicks",
    utils_columns: bool = True,
    *,
    keys: tuple = ("symbol", "brick_seq", "event_time"),
    utils: tuple = UTILS_COLUMNS,
) -> DataFrame:
    """Project the wide brick table into one of the 7 OHLC modes
    (reference renko_df, renkodf.py:291-387). Pure `select`; Catalyst
    column-prunes the unused variants all the way into the kernel
    boundary."""
    if mode not in MODES:
        raise ValueError(f"Only {list(MODES)} options are valid.")
    open_src, high_src, low_src = MODE_SOURCES[mode]
    cols = [F.col(k) for k in keys if k in wide.columns]
    cols += [
        F.col(open_src).alias("open"),
        F.col(high_src).alias("high"),
        F.col(low_src).alias("low"),
        F.col("close"),
        F.col("volume"),
    ]
    if utils_columns:
        cols += [F.col(u) for u in utils if u in wide.columns]
    return wide.select(*cols)


def renko_mode(
    ticks: DataFrame,
    brick_size: float,
    mode: str = "wicks",
    utils_columns: bool = True,
    **renko_kwargs,
) -> DataFrame:
    """End-to-end single-mode Renko with pushdown: only the mode's
    variant columns cross the kernel's Arrow boundary (a grouped-map
    UDF's output schema is opaque to Catalyst's column pruning, so the
    pruning is explicit here)."""
    if mode not in MODES:
        raise ValueError(f"Only {list(MODES)} options are valid.")
    open_src, high_src, low_src = MODE_SOURCES[mode]
    needed = {open_src, high_src, low_src, "close", "volume"}
    if utils_columns:
        needed |= set(UTILS_COLUMNS)
    wide = renko(ticks, brick_size, value_columns=tuple(needed), **renko_kwargs)
    return renko_df(wide, mode, utils_columns)


def to_rws(wide: DataFrame, brick_size: float, use_iloc: int | None = None) -> DataFrame:
    """State-export table (reference to_rws, renkodf.py:389-420): wide
    table minus tick indexes, plus a `brick_size` literal and an int64
    microsecond `timestamp`. Feed it back via
    `renkodf_spark.live.RenkoLive(external_df=...)` or as the initial
    state of the streaming operator."""
    cols = [c for c in wide.columns if not c.startswith("tick_index_")]
    out = wide.select(
        *[F.col(c) for c in cols],
        F.lit(float(brick_size)).alias("brick_size"),
        F.unix_micros(F.col("event_time")).alias("timestamp"),
    ).drop("event_time")
    if use_iloc is not None:
        w = Window.partitionBy("symbol")
        if use_iloc < 0:
            rn = F.row_number().over(w.orderBy(F.desc("brick_seq")))
            out = out.withColumn("__rn", rn).filter(F.col("__rn") <= -use_iloc).drop("__rn")
        else:
            rn = F.row_number().over(w.orderBy(F.asc("brick_seq")))
            out = out.withColumn("__rn", rn).filter(F.col("__rn") <= use_iloc).drop("__rn")
    return out
