"""Drop-in API compatibility with the reference package.

A user of srlcarlg/renkodf can `from renkodf_spark.compat import Renko,
RenkoWS` and run their existing code unchanged: same constructor
signatures (renkodf.py:17, renkodf.py:424), same `renko_df(mode,
utils_columns)` / `to_rws(use_iloc)` / `add_prices` / `renko_animate`
surfaces, same DataFrame shapes and DatetimeIndex conventions — backed
by this engine's kernel (`divide_by` is accepted and validated but no
longer controls pre-allocation: buffers grow, so the reference's
IndexError on large gaps does not occur).

For cluster-scale data use the native operators instead
(`renkodf_spark.renko` on a Spark DataFrame); this module is the
single-process convenience layer.
"""

from __future__ import annotations

import pandas as pd

from renkodf_spark.live import RenkoLive as RenkoWS  # noqa: F401  (API parity)
from renkodf_spark.operators.renko import renko_pandas
from renkodf_spark.schema import MODE_SOURCES, MODES, UTILS_COLUMNS


class Renko:
    """Batch API of the reference (`renkodf.Renko`, renkodf.py:16-420)."""

    def __init__(self, df_ticks: pd.DataFrame, brick_size: float, divide_by: int = 2):
        if brick_size is None or brick_size <= 0:
            raise ValueError("brick_size cannot be 'None' or '<= 0'")
        if divide_by is None or divide_by <= 0:
            raise ValueError("divide_by cannot be 'None' or '<= 0'")
        df = df_ticks
        if "datetime" not in df.columns:
            df = df.copy()
            df["datetime"] = df.index
        if "close" not in df.columns:
            raise ValueError("Column 'close' doesn't exist!")

        self._brick_size = float(brick_size)
        self._wide = renko_pandas(
            df.rename(columns={"datetime": "event_time"}), self._brick_size
        )

    def renko_df(self, mode: str = "wicks", utils_columns: bool = True) -> pd.DataFrame:
        if mode not in MODES:
            raise ValueError(f"Only {list(MODES)} options are valid.")
        open_src, high_src, low_src = MODE_SOURCES[mode]
        w = self._wide
        out = pd.DataFrame(
            {
                "open": w[open_src],
                "high": w[high_src],
                "low": w[low_src],
                "close": w["close"],
                "volume": w["volume"],
            }
        )
        if utils_columns:
            for c in UTILS_COLUMNS:
                out[c] = w[c]
        out.index = pd.DatetimeIndex(w["event_time"])
        out.index.name = "datetime"
        return out

    def to_rws(self, use_iloc: int | None = None) -> pd.DataFrame:
        w = self._wide
        df = w.drop(columns=["tick_index_open", "tick_index_close"]).copy()
        df["brick_size"] = self._brick_size
        df["timestamp"] = pd.DatetimeIndex(df["event_time"]).asi8
        df = df.drop(columns=["event_time"])
        df.index = pd.DatetimeIndex(w["event_time"])
        df.index.name = "datetime"
        if use_iloc is not None:
            return df.iloc[use_iloc:] if use_iloc < 0 else df.iloc[:use_iloc]
        return df

    def plot(self, mode: str = "wicks", volume: bool = True, df: pd.DataFrame = None, add_plots=None):
        """Thin client over mplfinance (reference renkodf.py:254-289);
        out of engine scope — requires mplfinance installed."""
        try:
            import mplfinance as mpf
        except ImportError as e:  # pragma: no cover
            raise ImportError("plot() needs mplfinance (not bundled with the engine)") from e
        if df is not None and add_plots is None:
            raise ValueError("If 'df' parameter is used, 'add_plots' is mandatory!")
        title = f"\n renko: {mode} \nbrick size: {self._brick_size}"
        if df is not None:
            mpf.plot(df, type="candle", style="charles", volume=volume, addplot=add_plots, title=title)
        else:
            mpf.plot(self.renko_df(mode), type="candle", style="charles", volume=volume, title=title)
        return mpf.show()
