"""End-to-end differential on the reference's own bundled market data
(real EURGBP/US30 ticks, read-only): full Spark operator vs the
vendored reference, all columns, plus the golden brick counts from
BASELINE.md."""

import os

import numpy as np
import pandas as pd
import pytest

from renkodf_spark.operators.renko import renko
from renkodf_spark.schema import MODE_SOURCES

DATA = "/root/reference/examples/data"

CASES = [
    ("EURGBP_T1_cT.parquet", "bid", 0.0003, 161),
    ("US30_T1_cT.parquet", "bid", 5.0, 693),
]


@pytest.mark.parametrize("fname,price_col,brick,expected_bricks", CASES)
def test_spark_renko_on_reference_data(spark, reference_renko, fname, price_col, brick, expected_bricks):
    path = os.path.join(DATA, fname)
    if not os.path.exists(path):
        pytest.skip(f"{fname} not bundled")

    raw = pd.read_parquet(path)
    ticks = raw.rename(columns={price_col: "close"})
    ref = reference_renko.Renko(ticks.copy(), brick)

    pdf = pd.DataFrame(
        {
            "symbol": fname.split("_")[0],
            # the reference stores time as the index named 'datetime'
            "event_time": pd.DatetimeIndex(ticks.index).astype("datetime64[us]"),
            "close": ticks["close"].to_numpy(),
        }
    )
    wide = renko(spark.createDataFrame(pdf), brick).orderBy("brick_seq").toPandas()

    for mode in ("wicks", "normal", "nongap", "fake-r-nongap"):
        want = ref.renko_df(mode)
        assert len(wide) == len(want), (fname, mode)
        if mode == "wicks":
            assert len(wide) == expected_bricks  # BASELINE.md golden count
        o, h, l = MODE_SOURCES[mode]
        np.testing.assert_array_equal(
            wide["event_time"].to_numpy().astype("datetime64[us]"),
            want.index.to_numpy().astype("datetime64[us]"),
        )
        for ours, theirs in [(o, "open"), (h, "high"), (l, "low"), ("close", "close"),
                             ("volume", "volume"), ("direction", "direction"),
                             ("is_reversal", "is_reversal"),
                             ("tick_index_open", "tick_index_open"),
                             ("tick_index_close", "tick_index_close")]:
            np.testing.assert_array_equal(
                wide[ours].to_numpy(), want[theirs].to_numpy(), err_msg=f"{fname} {mode} {theirs}"
            )
