"""Spark 4 `transformWithStateInPandas` variant of the streaming Renko
operator — same semantics as `renko_stream` (applyInPandasWithState),
hosted in the newer StatefulProcessor API, which carries the warm-start
table as a first-class `initialState` GroupedData (SURVEY §1.4 maps the
reference's RenkoWS state to exactly this) instead of a task closure.

Use this one when running on Spark 4 clusters; `renko_stream` remains
for 3.4+ compatibility. Both are differential-tested against each other
and against `RenkoLive`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import StatefulProcessor, StatefulProcessorHandle

from renkodf_spark.kernel import grid_anchor, new_output, output_arrays, scan_ticks, seed_row
from renkodf_spark.schema import STREAM_SCHEMA

_OUT_COLUMNS = [f.name for f in STREAM_SCHEMA.fields]
_VALUE_COLUMNS = [c for c in _OUT_COLUMNS if c not in ("symbol", "brick_seq", "event_time")]

_STATE_SCHEMA = (
    "last_close double, last_dir bigint, wick_min double, wick_max double, "
    "volume bigint, seq bigint"
)


class RenkoProcessor(StatefulProcessor):
    """Per-symbol Renko state machine (reference RenkoWS scalar state,
    renkodf.py:504-511, plus the brick_seq counter)."""

    def __init__(self, brick_size: float, emit_seed: bool = True):
        self._brick = float(brick_size)
        self._emit_seed = emit_seed

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("renko", _STATE_SCHEMA)

    def handleInitialState(self, key, initialState: pd.DataFrame, timerValues) -> None:
        # warm start from a to_rws export: resume from the last brick row
        last = initialState.sort_values("brick_seq").iloc[-1]
        self._state.update(
            (
                float(last["close"]),
                int(last["direction"]),
                float(last["close"]),
                float(last["close"]),
                int(last["volume"]),
                int(last["brick_seq"]) + 1,
            )
        )

    def handleInputRows(self, key, rows: Iterator[pd.DataFrame], timerValues) -> Iterator[pd.DataFrame]:
        symbol = key[0]
        chunks = [pdf[["event_time", "close"]] for pdf in rows]
        events = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        events = events.sort_values("event_time", kind="mergesort")
        times = events["event_time"].to_numpy()
        prices = events["close"].to_numpy().tolist()
        if not prices:
            return

        rows_head = []
        if self._state.exists():
            last_close, last_dir, wick_min, wick_max, volume, seq = self._state.get()
            kstate = [last_close, last_dir, wick_min, wick_max, volume, 0]
            start = 0
        else:
            anchor = grid_anchor(prices[0], self._brick)
            seq = 0
            if self._emit_seed:
                seed = seed_row(times[0], anchor)
                seed["brick_seq"] = seq
                rows_head.append(seed)
                seq += 1
            kstate = [anchor, 1, anchor, anchor, 1, 0]
            start = 1

        out = new_output()
        scan_ticks(times, prices, start, self._brick, kstate, out)
        n = len(out["event_time"])
        self._state.update(
            (kstate[0], int(kstate[1]), kstate[2], kstate[3], int(kstate[4]), int(seq + n))
        )
        if n == 0 and not rows_head:
            return

        arrs = output_arrays(out)
        frame = {
            "symbol": symbol,
            "brick_seq": range(seq, seq + n),
            "event_time": out["event_time"],
        }
        for c in _VALUE_COLUMNS:
            frame[c] = arrs[c]
        res = pd.DataFrame(frame)
        if rows_head:
            head = pd.DataFrame(
                [
                    {"symbol": symbol, "brick_seq": r["brick_seq"], "event_time": r["event_time"],
                     **{c: r[c] for c in _VALUE_COLUMNS}}
                    for r in rows_head
                ]
            )
            res = pd.concat([head, res], ignore_index=True)
        yield res[_OUT_COLUMNS]

    def close(self) -> None:
        pass


def renko_stream_tws(
    ticks: DataFrame,
    brick_size: float,
    *,
    symbol_col: str = "symbol",
    time_col: str = "event_time",
    price_col: str = "close",
    initial_state: DataFrame | None = None,
    emit_seed: bool = True,
) -> DataFrame:
    """Streaming wide-brick DataFrame via transformWithStateInPandas.

    ``initial_state``: optional warm-start DataFrame in ``to_rws()``
    shape (must contain symbol, brick_seq, close, direction, volume)."""
    if brick_size is None or brick_size <= 0:
        raise ValueError("brick_size cannot be 'None' or '<= 0'")
    try:  # the TWS state-server protocol needs protobuf on driver+workers
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package; "
            "use renkodf_spark.streaming.renko_stream (applyInPandasWithState) "
            "on environments without it"
        ) from e
    slim = ticks.select(
        ticks[symbol_col].alias("symbol"),
        ticks[time_col].alias("event_time"),
        ticks[price_col].alias("close"),
    )
    init = initial_state.groupBy("symbol") if initial_state is not None else None
    return slim.groupBy("symbol").transformWithStateInPandas(
        RenkoProcessor(brick_size, emit_seed),
        outputStructType=STREAM_SCHEMA,
        outputMode="Append",
        timeMode="None",
        initialState=init,
    )
