"""Differential tests: our kernel / RenkoLive vs the reference
implementation (imported read-only from /root/reference, mplfinance
stubbed), on synthetic random-walk ticks with gaps and reversals.

This is the reference's own primary test strategy (SURVEY.md §5):
strict equality across all 7 modes.
"""

import numpy as np
import pandas as pd
import pytest

from renkodf_spark.live import RenkoLive
from renkodf_spark.operators.renko import renko_pandas
from renkodf_spark.schema import MODES


def make_ticks(seed: int, n: int = 4000, base: float = 100.0) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    steps = rng.normal(0, 0.4, n)
    # inject gaps (multi-brick jumps) and trend flips
    jumps = rng.choice([0, 0, 0, 0, 0, 3.5, -3.5, 7.2, -6.8], size=n, p=[0.19, 0.19, 0.19, 0.19, 0.2, 0.01, 0.01, 0.01, 0.01])
    prices = base + np.cumsum(steps + jumps)
    times = pd.date_range("2023-06-01", periods=n, freq="250ms")
    return pd.DataFrame({"datetime": times, "close": prices}, index=times)


@pytest.mark.parametrize("seed", [1, 2, 7])
@pytest.mark.parametrize("mode", MODES)
def test_batch_matches_reference(reference_renko, seed, mode):
    ticks = make_ticks(seed)
    ref = reference_renko.Renko(ticks.copy(), brick_size=1.0, divide_by=1)
    ref_df = ref.renko_df(mode)

    ours_wide = renko_pandas(
        ticks.rename(columns={"datetime": "event_time"}), 1.0
    )
    from renkodf_spark.schema import MODE_SOURCES

    o, h, l = MODE_SOURCES[mode]
    assert len(ours_wide) == len(ref_df), f"brick count mismatch ({len(ours_wide)} vs {len(ref_df)})"
    np.testing.assert_array_equal(ours_wide["event_time"].to_numpy(), ref_df.index.to_numpy())
    np.testing.assert_array_equal(ours_wide[o].to_numpy(), ref_df["open"].to_numpy())
    np.testing.assert_array_equal(ours_wide[h].to_numpy(), ref_df["high"].to_numpy())
    np.testing.assert_array_equal(ours_wide[l].to_numpy(), ref_df["low"].to_numpy())
    np.testing.assert_array_equal(ours_wide["close"].to_numpy(), ref_df["close"].to_numpy())
    np.testing.assert_array_equal(ours_wide["volume"].to_numpy(), ref_df["volume"].to_numpy())
    np.testing.assert_array_equal(ours_wide["direction"].to_numpy(), ref_df["direction"].to_numpy())
    np.testing.assert_array_equal(ours_wide["is_reversal"].to_numpy(), ref_df["is_reversal"].to_numpy())
    np.testing.assert_array_equal(
        ours_wide["tick_index_open"].to_numpy(), ref_df["tick_index_open"].to_numpy()
    )
    np.testing.assert_array_equal(
        ours_wide["tick_index_close"].to_numpy(), ref_df["tick_index_close"].to_numpy()
    )


@pytest.mark.parametrize("seed", [3, 11])
@pytest.mark.parametrize("mode", ["wicks", "normal", "nongap", "fake-r-nongap"])
def test_live_matches_reference_ws(reference_renko, seed, mode):
    ticks = make_ticks(seed, n=1500)
    ts_int = ticks.index.asi8 // 1000  # us

    ref_ws = reference_renko.RenkoWS(int(ts_int[0]), float(ticks["close"].iloc[0]), brick_size=1.0)
    live = RenkoLive(int(ts_int[0]), float(ticks["close"].iloc[0]), brick_size=1.0)
    for t, p in zip(ts_int[1:], ticks["close"].iloc[1:]):
        ref_ws.add_prices(int(t), float(p))
        live.add_prices(int(t), float(p))

    ref_df = ref_ws.renko_df(mode)
    ours = live.renko_df(mode)
    assert len(ours) == len(ref_df)
    for col in ["timestamp", "open", "high", "low", "close", "volume", "direction", "is_reversal"]:
        np.testing.assert_array_equal(ours[col].to_numpy(), ref_df[col].to_numpy(), err_msg=col)
    np.testing.assert_array_equal(ours.index.to_numpy(), ref_df.index.to_numpy())

    # forming-bar synthesis, including its wick quirk
    ref_anim = ref_ws.renko_animate(mode)
    ours_anim = live.renko_animate(mode)
    assert len(ours_anim) == len(ref_anim)
    for col in ["open", "high", "low", "close", "volume", "direction"]:
        np.testing.assert_array_equal(
            ours_anim[col].to_numpy(), ref_anim[col].to_numpy(), err_msg=f"animate {col}"
        )


@pytest.mark.parametrize("mode", ["wicks", "nongap"])
def test_warm_start_matches_reference(reference_renko, mode):
    """Batch<=T -> to_rws -> live>T equals reference's identical handoff
    (contract of test/test_ws_ext.py: one characterized splice diff vs a
    full run; here we assert our handoff == reference handoff exactly)."""
    ticks = make_ticks(5, n=3000)
    split = 2000
    head, tail = ticks.iloc[:split], ticks.iloc[split:]

    ref_batch = reference_renko.Renko(head.copy(), brick_size=1.0, divide_by=1)
    ref_ws = reference_renko.RenkoWS(external_df=ref_batch.to_rws(), ts_unit="ns")

    ours_wide = renko_pandas(head.rename(columns={"datetime": "event_time"}), 1.0)
    ext = ours_wide.drop(columns=["tick_index_open", "tick_index_close"]).copy()
    ext["brick_size"] = 1.0
    ext["timestamp"] = pd.DatetimeIndex(ext["event_time"]).asi8
    ext = ext.drop(columns=["event_time"])
    live = RenkoLive(external_df=ext, ts_unit="ns")

    ts_int = tail.index.asi8
    for t, p in zip(ts_int, tail["close"]):
        ref_ws.add_prices(int(t), float(p))
        live.add_prices(int(t), float(p))

    ref_df = ref_ws.renko_df(mode)
    ours = live.renko_df(mode)
    assert len(ours) == len(ref_df)
    for col in ["timestamp", "open", "high", "low", "close", "volume", "direction", "is_reversal"]:
        np.testing.assert_array_equal(ours[col].to_numpy(), ref_df[col].to_numpy(), err_msg=col)
