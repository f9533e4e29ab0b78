"""Memory-bounded Renko for arbitrarily long per-symbol histories.

`renko()` loads each symbol's full tick history into one Arrow batch —
the right call when symbols are numerous and individually bounded. At
100 TB a single symbol's history can exceed executor memory, so
`renko_chunked` processes the stream in consecutive event-time windows:
each window runs distributed across symbols, with the per-symbol kernel
state carried to the next window (the reference's own backtest->live
warm-start handoff, renkodf.py:457-508 / SURVEY.md O-13, is this same
stitching; unlike the reference's splice there is no first-bar
wick/volume discrepancy because the *full* scalar state — wick extremes,
volume, tick offset — crosses the boundary, not just the last brick row).

The recurrence is inherently sequential per symbol, so windows run in
sequence; the cluster still parallelizes across symbols within every
window, executor memory is bounded by the window's tick count per
symbol, and the driver holds one tiny state row per symbol.

Output is bit-identical to the one-shot `renko()` (asserted in tests).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from renkodf_spark.kernel import (
    WIDE_VALUE_COLUMNS,
    choose_scan,
    grid_anchor,
    new_output,
    output_arrays,
    scan_ticks,
    scan_ticks_vectorized,
)
from renkodf_spark.schema import WIDE_COLUMN_NAMES, WIDE_SCHEMA

# per-symbol state carried between windows:
#   kernel vector [last_close, last_dir, wick_min, wick_max, volume,
#   tick_open(global)] + next_seq, tick_offset, first_ts (label-drop)
_STATE_FIELDS = [
    ("last_close", T.DoubleType()),
    ("last_dir", T.LongType()),
    ("wick_min", T.DoubleType()),
    ("wick_max", T.DoubleType()),
    ("volume", T.LongType()),
    ("tick_open", T.LongType()),
    ("next_seq", T.LongType()),
    ("tick_offset", T.LongType()),
    ("first_ts", T.TimestampType()),
]

# bricks and the one state row share the applyInPandas output frame;
# __is_state flags the state row.
_PACKED_SCHEMA = T.StructType(
    list(WIDE_SCHEMA.fields)
    + [T.StructField("__is_state", T.IntegerType())]
    + [T.StructField(f"__st_{name}", dtype) for name, dtype in _STATE_FIELDS]
)

_INT_COLS = ("volume", "direction", "is_reversal", "tick_index_open", "tick_index_close")


def renko_chunked(
    ticks: DataFrame,
    brick_size: float,
    *,
    window: str = "1 week",
    symbol_col: str = "symbol",
    time_col: str = "event_time",
    price_col: str = "close",
    drop_first: bool = True,
) -> DataFrame:
    if brick_size is None or brick_size <= 0:
        raise ValueError("brick_size cannot be 'None' or '<= 0'")
    spark = ticks.sparkSession

    slim = ticks.select(
        F.col(symbol_col).cast("string").alias("symbol"),
        F.col(time_col).alias("__time"),
        F.col(price_col).cast("double").alias("__price"),
        F.monotonically_increasing_id().alias("__seq"),
        F.window(F.col(time_col), window).start.alias("__win"),
    )
    windows = [r[0] for r in slim.select("__win").distinct().orderBy("__win").collect()]

    state: dict[str, tuple] = {}
    chunks: list[DataFrame] = []
    def make_run(_carried: dict):
        def run(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(["__time", "__seq"], kind="mergesort")
            sym = pdf["symbol"].iloc[0]
            times = pdf["__time"].to_numpy()
            prices = pdf["__price"].to_numpy()

            st = _carried.get(sym)
            if st is None:
                anchor = grid_anchor(float(prices[0]), brick_size)
                kstate = [anchor, 0, anchor, anchor, 1, 1]  # tick_open: global idx 1
                next_seq, offset, first_ts = 0, 0, None
                start = 1
            else:
                (lc, ld, wmin, wmax, vol, tick_open_g, next_seq, offset, first_ts) = st
                # kernel works in window-local indexes; state keeps global
                kstate = [lc, int(ld), wmin, wmax, int(vol), int(tick_open_g) - int(offset)]
                start = 0

            out = new_output()
            if choose_scan(prices, brick_size):
                scan_ticks_vectorized(times, prices, start, brick_size, kstate, out)
            else:
                scan_ticks(times, prices.tolist(), start, brick_size, kstate, out)

            arrs = output_arrays(out)
            # close time = closing tick's timestamp (indexes still local here)
            res = {
                "event_time": times[arrs["tick_index_close"]].astype("datetime64[us]")
                if len(times)
                else np.empty(0, dtype="datetime64[us]")
            }
            for name in WIDE_VALUE_COLUMNS:
                res[name] = arrs[name]
            res = pd.DataFrame(res)
            if offset:
                res["tick_index_open"] += offset
                res["tick_index_close"] += offset

            if len(res) and first_ts is None:
                first_ts = res["event_time"].iloc[0]
            if drop_first and first_ts is not None:
                res = res[res["event_time"] != first_ts].reset_index(drop=True)

            res.insert(0, "brick_seq", np.arange(int(next_seq), int(next_seq) + len(res), dtype=np.int64))
            res.insert(0, "symbol", sym)
            res = res[list(WIDE_COLUMN_NAMES)]
            res["__is_state"] = 0
            for name, _ in _STATE_FIELDS:
                res[f"__st_{name}"] = None

            strow = dict.fromkeys(res.columns)
            strow.update(
                symbol=sym,
                __is_state=1,
                __st_last_close=kstate[0],
                __st_last_dir=kstate[1],
                __st_wick_min=kstate[2],
                __st_wick_max=kstate[3],
                __st_volume=kstate[4],
                __st_tick_open=kstate[5] + offset,  # back to global
                __st_next_seq=int(next_seq) + len(res),
                __st_tick_offset=offset + len(pdf),
                __st_first_ts=first_ts,
            )
            return pd.concat([res, pd.DataFrame([strow])], ignore_index=True)

        return run

    for win in windows:
        part = (
            slim.filter(F.col("__win") == F.lit(win))
            .drop("__win")
            .groupBy("symbol")
            .applyInPandas(make_run(dict(state)), _PACKED_SCHEMA)
            .cache()
        )
        st_pdf = (
            part.filter(F.col("__is_state") == 1)
            .select("symbol", *[f"__st_{name}" for name, _ in _STATE_FIELDS])
            .toPandas()
        )
        for row in st_pdf.itertuples(index=False):
            vals = list(row)
            state[vals[0]] = tuple(vals[1:])
        chunks.append(part.filter(F.col("__is_state") == 0).select(*WIDE_COLUMN_NAMES))

    if not chunks:
        return spark.createDataFrame([], WIDE_SCHEMA)
    out = chunks[0]
    for c in chunks[1:]:
        out = out.unionByName(c)
    return out
