"""renko_chunked (windowed, state-carrying) must be bit-identical to the
one-shot renko() across window boundaries, including tick indexes,
brick_seq continuity, and the first-brick label drop."""

import numpy as np

from renkodf_spark.operators.renko import renko
from renkodf_spark.operators.renko_chunked import renko_chunked
from tests.test_spark_renko import _multi_symbol_ticks


def test_chunked_equals_oneshot(spark):
    pdf = _multi_symbol_ticks()  # ~10 min of 250ms ticks per symbol
    ticks = spark.createDataFrame(pdf)

    oneshot = renko(ticks, 1.0).orderBy("symbol", "brick_seq").toPandas()
    chunked = (
        renko_chunked(ticks, 1.0, window="2 minutes").orderBy("symbol", "brick_seq").toPandas()
    )

    assert len(oneshot) == len(chunked)
    for col in oneshot.columns:
        np.testing.assert_array_equal(
            oneshot[col].to_numpy(), chunked[col].to_numpy(), err_msg=col
        )


def test_chunked_single_source_scan(spark, sf_dir, tmp_path):
    """VERDICT r1 item 4: W windows must cost ONE scan of the source.
    The slimmed ticks are staged once (partitioned by window); the
    output plan must read only the staging dir, never the source."""
    from renkodf_spark.sources.tables import ticks_from_events

    staging = str(tmp_path / "stage")
    out = renko_chunked(
        ticks_from_events(spark, sf_dir), 20.0, window="1 week", staging_dir=staging
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "stage" in plan, "plan must read the staged copy"
    assert sf_dir not in plan, "plan must not rescan the original source"
    # partition pruning: each window's read carries a __win partition filter
    assert "__win" in plan


def test_chunked_idle_symbol_state_carry(spark):
    """A symbol with no ticks in a middle window must resume from its
    carried state (brick_seq, wick, volume) when it reappears."""
    import pandas as pd

    t0 = pd.Timestamp("2024-01-01")
    rows = []
    # symbol A ticks in windows 1 and 3 only; symbol B in all three
    for i, (mins, price) in enumerate(
        [(0, 10.0), (1, 12.5), (2, 13.8), (10, 15.2), (11, 16.9)]
    ):
        rows.append(("A", t0 + pd.Timedelta(minutes=mins), price))
    for i, (mins, price) in enumerate(
        [(0, 10.0), (4, 11.2), (5, 13.4), (8, 14.6), (11, 15.8)]
    ):
        rows.append(("B", t0 + pd.Timedelta(minutes=mins), price))
    pdf = pd.DataFrame(rows, columns=["symbol", "event_time", "close"])
    pdf["event_time"] = pdf["event_time"].astype("datetime64[us]")
    ticks = spark.createDataFrame(pdf)

    oneshot = renko(ticks, 1.0).orderBy("symbol", "brick_seq").toPandas()
    chunked = (
        renko_chunked(ticks, 1.0, window="4 minutes").orderBy("symbol", "brick_seq").toPandas()
    )
    assert len(oneshot) == len(chunked)
    for col in oneshot.columns:
        np.testing.assert_array_equal(
            oneshot[col].to_numpy(), chunked[col].to_numpy(), err_msg=col
        )


def test_chunked_filters_nan_like_oneshot(spark):
    """ADVICE r1: NaN/null prices must be dropped exactly as renko()
    does, instead of poisoning the wick state or raising."""
    import pandas as pd

    times = pd.date_range("2024-01-01", periods=8, freq="90s").astype("datetime64[us]")
    prices = [10.2, float("nan"), 13.7, 14.2, None, 14.1, 15.3, 16.4]
    pdf = pd.DataFrame({"symbol": "S", "event_time": times, "close": prices})
    ticks = spark.createDataFrame(pdf)
    oneshot = renko(ticks, 1.0).orderBy("brick_seq").toPandas()
    chunked = renko_chunked(ticks, 1.0, window="3 minutes").orderBy("brick_seq").toPandas()
    assert len(oneshot) > 0
    for col in oneshot.columns:
        np.testing.assert_array_equal(
            oneshot[col].to_numpy(), chunked[col].to_numpy(), err_msg=col
        )


def test_chunked_multibrick_first_tick_drop(spark):
    import pandas as pd

    # first tick movement emits 3 bricks -> all dropped, also when the
    # drop timestamp falls in window 1 and later bricks in window 2
    times = pd.date_range("2024-01-01", periods=6, freq="90s").astype("datetime64[us]")
    prices = [10.2, 13.7, 14.2, 14.1, 15.3, 16.4]
    pdf = pd.DataFrame({"symbol": "S", "event_time": times, "close": prices})
    ticks = spark.createDataFrame(pdf)
    oneshot = renko(ticks, 1.0).orderBy("brick_seq").toPandas()
    chunked = renko_chunked(ticks, 1.0, window="3 minutes").orderBy("brick_seq").toPandas()
    assert oneshot["close"].tolist() == chunked["close"].tolist()
    assert chunked["brick_seq"].tolist() == list(range(len(chunked)))
