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
