"""Golden micro-fixture from FIXTURES.md §F6 (verified against the
reference during the survey) — exercises anchor, same-direction bricks,
gap fill, 2-brick reversal threshold, wick reset, and the first-brick
timestamp drop, without Spark."""

import numpy as np
import pandas as pd
import pytest

from renkodf_spark.operators.renko import renko_pandas

PRICES = [10.2, 10.5, 11.1, 12.3, 11.9, 13.05, 10.9, 9.4, 9.9, 12.1]


def _ticks():
    times = pd.date_range("2024-01-01", periods=len(PRICES), freq="1min")
    return pd.DataFrame({"event_time": times, "close": PRICES})


def test_wicks_golden():
    res = renko_pandas(_ticks(), 1.0)
    expected = pd.DataFrame(
        {
            "minute": [3, 5, 6, 7, 9],
            "open": [11.0, 12.0, 12.0, 11.0, 11.0],
            "high": [12.0, 13.0, 13.0, 12.0, 12.0],
            "low": [11.0, 11.9, 11.0, 10.0, 9.9],
            "close": [12.0, 13.0, 11.0, 10.0, 12.0],
            "volume": [2, 3, 2, 2, 3],
            "direction": [1, 1, -1, -1, 1],
            "is_reversal": [0, 0, 1, 0, 1],
            "tick_index_open": [2, 3, 5, 6, 7],
            "tick_index_close": [3, 5, 6, 7, 9],
        }
    )
    assert len(res) == 5
    assert [t.minute for t in pd.DatetimeIndex(res["event_time"])] == expected["minute"].tolist()
    for col in expected.columns[1:]:
        np.testing.assert_array_equal(res[col].to_numpy(), expected[col].to_numpy(), err_msg=col)


def test_normal_mode_body_extremes():
    res = renko_pandas(_ticks(), 1.0)
    # 00:06 reversal row: body-only high/low = 12.0 / 11.0
    row = res.iloc[2]
    assert row["normal_high"] == 12.0 and row["normal_low"] == 11.0
    assert row["reverse_high"] == 13.0 and row["reverse_low"] == 11.0  # wick kept on reversal
    assert row["fake_high"] == 13.0  # previous close as fake wick (down reversal)


def test_multi_brick_first_tick_all_dropped():
    # First movement emits 3 bricks sharing one timestamp; the reference
    # drops the first index *label*, i.e. all three (FIXTURES.md F6 edge).
    prices = [10.2, 13.7, 14.2, 14.1, 15.3]
    times = pd.date_range("2024-01-01", periods=len(prices), freq="1min")
    ticks = pd.DataFrame({"event_time": times, "close": prices})
    res = renko_pandas(ticks, 1.0)
    assert res["close"].tolist() == [14.0, 15.0]
    assert res["event_time"].iloc[0].minute == 2


def test_no_preallocation_overflow():
    # gap emitting far more bricks than ticks: reference raises
    # IndexError (SURVEY §2 O-6); we must not.
    prices = [10.0, 5000.0, 5001.0]
    times = pd.date_range("2024-01-01", periods=3, freq="1s")
    res = renko_pandas(pd.DataFrame({"event_time": times, "close": prices}), 1.0, drop_first=False)
    assert len(res) == 4991  # 4990 gap bricks at :01 + 1 at :02
    # and with the label-drop every :01 brick goes away at once
    res2 = renko_pandas(pd.DataFrame({"event_time": times, "close": prices}), 1.0)
    assert len(res2) == 1


def test_validation_errors():
    import pyspark  # noqa: F401  (renko() is the spark-side validator)
    from renkodf_spark.operators.renko import renko

    with pytest.raises(ValueError):
        renko(None, 0)
    with pytest.raises(ValueError):
        renko(None, -1.0)


def test_renko_empty_and_single_tick(spark):
    import pandas as pd

    from renkodf_spark.operators.renko import renko
    from renkodf_spark.schema import WIDE_SCHEMA

    empty = spark.createDataFrame([], WIDE_SCHEMA)["symbol", "event_time", "close"]
    assert renko(empty, 1.0).count() == 0
    one = spark.createDataFrame(
        pd.DataFrame({"symbol": ["A"], "event_time": [pd.Timestamp("2024-01-01")], "close": [10.2]})
    )
    assert renko(one, 1.0).count() == 0  # a single tick emits nothing


def test_renko_drops_null_and_nan_ticks(spark):
    import numpy as np
    import pandas as pd

    from renkodf_spark.operators.renko import renko

    times = pd.date_range("2024-01-01", periods=7, freq="1min")
    dirty = pd.DataFrame(
        {
            "symbol": "A",
            "event_time": times,
            "close": [10.2, np.nan, 10.5, 11.1, None, 12.3, 13.4],
        }
    )
    clean = dirty.dropna(subset=["close"])
    got = renko(spark.createDataFrame(dirty), 1.0).orderBy("brick_seq").toPandas()
    want = renko(spark.createDataFrame(clean), 1.0).orderBy("brick_seq").toPandas()
    assert got["close"].tolist() == want["close"].tolist()
    assert not got["close"].isna().any()
