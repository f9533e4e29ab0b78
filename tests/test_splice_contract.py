"""Warm-start splice contract, generalizing the reference's own
characterization (/root/reference/test/test_ws_ext.py:39-58): a batch
run up to T exported with to_rws() and replayed live after T differs
from a single full-history run in EXACTLY one row — the first bar after
the splice — and only in wick-derived columns + volume.

The reference's test pins {high, volume} for 'wicks' and {open, high,
volume} for 'nongap' — but that exception set is a property of its
US30 dataset (the first post-splice brick there is a falling brick, so
the wick column in play is `high` = wick_max). The invariant the splice
actually guarantees, which we assert here for all 7 modes on synthetic
walks in both directions:

1. brick count, close, direction, is_reversal, and timestamps are
   strictly equal everywhere — the splice never changes *which* bricks
   exist;
2. open/high/low diffs are confined to the single row at the splice
   boundary (the wick/volume accumulator reset to the exported brick's
   close can't see pre-splice extremes), and only in modes whose
   projection reads the wick state ('normal' is strictly equal);
3. volume differs at exactly that row;
4. the diffs have the reset's sign: spliced high <= full high, spliced
   low >= full low, spliced volume <= full volume.

This is stronger than "stitching is clean": it proves our splice
reproduces the reference's exception set — one characterized row, the
characterized columns, the characterized direction — and nothing else.
"""

import numpy as np
import pandas as pd
import pytest

from renkodf_spark.live import RenkoLive
from renkodf_spark.operators.renko import renko_pandas
from renkodf_spark.schema import MODE_SOURCES, MODES

from tests.test_vs_reference import make_ticks

BRICK = 1.0
SPLIT = 2000


def _mode_project(wide: pd.DataFrame, mode: str) -> pd.DataFrame:
    o, h, l = MODE_SOURCES[mode]
    return pd.DataFrame(
        {
            "timestamp": pd.DatetimeIndex(wide["event_time"]).asi8,
            "open": wide[o].to_numpy(),
            "high": wide[h].to_numpy(),
            "low": wide[l].to_numpy(),
            "close": wide["close"].to_numpy(),
            "volume": wide["volume"].to_numpy(),
            "direction": wide["direction"].to_numpy(),
            "is_reversal": wide["is_reversal"].to_numpy(),
        }
    )


def _spliced_and_full(seed: int):
    ticks = make_ticks(seed, n=3500)
    head, tail = ticks.iloc[:SPLIT], ticks.iloc[SPLIT:]

    # full-history batch run — the reference contract's r1_full
    full_wide = renko_pandas(ticks.rename(columns={"datetime": "event_time"}), BRICK)

    head_wide = renko_pandas(head.rename(columns={"datetime": "event_time"}), BRICK)
    ext = head_wide.drop(columns=["tick_index_open", "tick_index_close"]).copy()
    ext["brick_size"] = BRICK
    ext["timestamp"] = pd.DatetimeIndex(ext["event_time"]).asi8
    ext = ext.drop(columns=["event_time"])
    start_len = len(ext)

    spliced = RenkoLive(external_df=ext, ts_unit="ns")
    for t, p in zip(tail.index.asi8, tail["close"]):
        spliced.add_prices(int(t), float(p))
    return full_wide, spliced, start_len


@pytest.fixture(scope="module", params=[5, 9])
def splice_fixture(request):
    return _spliced_and_full(request.param)


def _diff_rows(a: pd.Series, b: pd.Series) -> list[int]:
    av, bv = a.to_numpy(), b.to_numpy()
    return np.nonzero(av != bv)[0].tolist()


@pytest.mark.parametrize("mode", MODES)
def test_splice_matches_reference_contract(splice_fixture, mode):
    full_wide, spliced, start_len = splice_fixture
    df_full = _mode_project(full_wide, mode)
    df_spl = spliced.renko_df(mode).reset_index(drop=True)

    assert len(df_full) == len(df_spl), "brick count must survive the splice"
    assert start_len < len(df_full), "fixture must emit bricks after the splice"

    # (1) the splice never changes which bricks exist
    for col in ["close", "direction", "is_reversal", "timestamp"]:
        diffs = _diff_rows(df_full[col], df_spl[col])
        assert diffs == [], f"{mode}.{col}: unexpected splice diffs at rows {diffs[:5]}"

    # (2) wick-derived columns: diffs confined to the splice-boundary row
    for col in ["open", "high", "low"]:
        diffs = _diff_rows(df_full[col], df_spl[col])
        if mode == "normal":
            # normal mode projects body extremes only — wick state is
            # invisible, so the reference's full-equality claim holds
            assert diffs == [], f"normal.{col}: unexpected splice diffs at rows {diffs[:5]}"
        else:
            assert diffs in ([], [start_len]), (
                f"{mode}.{col}: splice diff must be confined to the first "
                f"post-splice bar (row {start_len}), got rows {diffs[:5]}"
            )

    # (3) volume differs at exactly the splice boundary, in every mode
    vol_diffs = _diff_rows(df_full["volume"], df_spl["volume"])
    assert vol_diffs == [start_len], (
        f"{mode}: volume diff must be exactly the first post-splice bar, got {vol_diffs[:5]}"
    )

    # (4) the wick diffs have the reset's sign (volume's sign is NOT
    # pinned: the warm start seeds the counter from the last exported
    # brick's volume — reference renkodf.py:504-511 — which can exceed
    # the full run's ticks-since-that-brick)
    row_f, row_s = df_full.iloc[start_len], df_spl.iloc[start_len]
    assert row_s["high"] <= row_f["high"], f"{mode}: spliced high can only shrink"
    assert row_s["low"] >= row_f["low"], f"{mode}: spliced low can only grow"


def test_some_mode_actually_diffs(splice_fixture):
    """Guard against a vacuous pass: at least one mode must show the
    characterized wick diff at the boundary (if head/tail happened to
    splice exactly on a brick close, the fixture proves nothing)."""
    full_wide, spliced, start_len = splice_fixture
    hit = 0
    for mode in MODES:
        df_full = _mode_project(full_wide, mode)
        df_spl = spliced.renko_df(mode).reset_index(drop=True)
        for col in ["open", "high", "low"]:
            hit += len(_diff_rows(df_full[col], df_spl[col]))
    assert hit > 0, "fixture splice landed on a brick boundary; pick another seed/split"
