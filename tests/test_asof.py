"""asof_join differential tests vs pandas merge_asof (the canonical
single-node implementation), strict and non-strict, with nulls for
keys that have no match."""

import numpy as np
import pandas as pd

from renkodf_spark.operators.asof import asof_join


def _data(seed=3, n_left=400, n_right=150, n_keys=7):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "t": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000_000, n_left), unit="us"),
            "lid": np.arange(n_left),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys + 2, n_right),  # some keys never match
            "t": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 10_000_000, n_right), unit="us"),
            "payload": rng.normal(size=n_right).round(6),
        }
    )
    left["t"] = left["t"].astype("datetime64[us]")
    right["t"] = right["t"].astype("datetime64[us]")
    return left, right


def _pandas_asof(left, right, strict):
    out = pd.merge_asof(
        left.sort_values("t", kind="mergesort"),
        right.sort_values("t", kind="mergesort").rename(columns={"t": "rt"}),
        left_on="t",
        right_on="rt",
        by="k",
        allow_exact_matches=not strict,
        direction="backward",
    )
    return out.sort_values("lid").reset_index(drop=True)


def test_asof_join_matches_merge_asof_strict_and_not(spark):
    left_pdf, right_pdf = _data()
    # dedupe right on (k, t): equal-timestamp right rows are ambiguous in
    # any as-of definition (documented operator caveat)
    right_pdf = right_pdf.drop_duplicates(["k", "t"])
    left = spark.createDataFrame(left_pdf)
    right = spark.createDataFrame(right_pdf)

    for strict in (True, False):
        got = (
            asof_join(
                left,
                right,
                on="k",
                left_time="t",
                right_time="t",
                right_payload=["t", "payload"],
                strict=strict,
            )
            .orderBy("lid")
            .toPandas()
        )
        want = _pandas_asof(left_pdf, right_pdf, strict)
        np.testing.assert_array_equal(got["lid"].to_numpy(), want["lid"].to_numpy())
        np.testing.assert_array_equal(
            got["t_asof"].to_numpy().astype("datetime64[us]"),
            want["rt"].to_numpy().astype("datetime64[us]"),
            err_msg=f"strict={strict} matched time",
        )
        np.testing.assert_array_equal(
            np.nan_to_num(got["payload_asof"].to_numpy(), nan=-999.0),
            np.nan_to_num(want["payload"].to_numpy(), nan=-999.0),
            err_msg=f"strict={strict} payload",
        )


def test_renko_chunked_on_real_events(spark, sf_dir):
    """chunked == oneshot on the driver testdata (also exercises the
    vectorized-vs-scalar dispatcher inside the chunked kernel calls)."""
    from renkodf_spark.operators.renko import renko
    from renkodf_spark.operators.renko_chunked import renko_chunked
    from renkodf_spark.sources.tables import ticks_from_events

    ticks = ticks_from_events(spark, sf_dir)
    oneshot = renko(ticks, 20.0).orderBy("symbol", "brick_seq").toPandas()
    chunked = renko_chunked(ticks, 20.0, window="1 week").orderBy("symbol", "brick_seq").toPandas()
    assert len(oneshot) == len(chunked)
    for col in oneshot.columns:
        np.testing.assert_array_equal(oneshot[col].to_numpy(), chunked[col].to_numpy(), err_msg=col)


def test_time_bars_deterministic_with_ts_ties(spark):
    """VERDICT r3 item 4: equal-timestamp ticks must produce the same
    bars under any partition layout. Without seq_col the tiebreak is
    (t, p) — open = lowest, close = highest price at the tied instant —
    and with seq_col ties follow arrival order."""
    import pandas as pd

    from renkodf_spark.operators.timebars import time_bars

    # arrival order deliberately disagrees with price order at the ties
    pdf = pd.DataFrame(
        {
            "symbol": ["A"] * 4 + ["B"] * 3,
            "event_time": pd.to_datetime(
                ["2024-01-01 00:00:01"] * 2
                + ["2024-01-01 00:30:00"] * 2
                + ["2024-01-01 00:10:00"] * 3
            ).astype("datetime64[us]"),
            "close": [11.0, 10.0, 13.0, 12.0, 7.0, 9.0, 8.0],
            "seq": [0, 1, 2, 3, 0, 1, 2],
        }
    )
    df = spark.createDataFrame(pdf)

    # fallback (t, p): layout-independent — identical across partitionings
    outs = [
        time_bars(df.repartition(n), "1 hour")
        .orderBy("symbol")
        .toPandas()
        for n in (1, 32)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    a = outs[0][outs[0]["symbol"] == "A"].iloc[0]
    assert a["open"] == 10.0 and a["close"] == 13.0  # price-order ties
    b = outs[0][outs[0]["symbol"] == "B"].iloc[0]
    assert b["open"] == 7.0 and b["close"] == 9.0

    # explicit seq_col: arrival-order semantics, also layout-independent
    outs = [
        time_bars(df.repartition(n), "1 hour", seq_col="seq")
        .orderBy("symbol")
        .toPandas()
        for n in (1, 32)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    a = outs[0][outs[0]["symbol"] == "A"].iloc[0]
    assert a["open"] == 11.0 and a["close"] == 12.0  # arrival-order ties
    b = outs[0][outs[0]["symbol"] == "B"].iloc[0]
    assert b["open"] == 7.0 and b["close"] == 8.0


def test_asof_join_forward_and_nearest_match_merge_asof(spark):
    left_pdf, right_pdf = _data(seed=11)
    right_pdf = right_pdf.drop_duplicates(["k", "t"])
    left = spark.createDataFrame(left_pdf)
    right = spark.createDataFrame(right_pdf)

    cases = [("forward", True), ("forward", False), ("nearest", False)]
    for direction, strict in cases:
        got = (
            asof_join(
                left,
                right,
                on="k",
                left_time="t",
                right_time="t",
                right_payload=["t", "payload"],
                strict=strict,
                direction=direction,
            )
            .orderBy("lid")
            .toPandas()
        )
        want = pd.merge_asof(
            left_pdf.sort_values("t", kind="mergesort"),
            right_pdf.sort_values("t", kind="mergesort").rename(columns={"t": "rt"}),
            left_on="t",
            right_on="rt",
            by="k",
            allow_exact_matches=not strict,
            direction=direction,
        ).sort_values("lid").reset_index(drop=True)
        np.testing.assert_array_equal(
            got["t_asof"].to_numpy().astype("datetime64[us]"),
            want["rt"].to_numpy().astype("datetime64[us]"),
            err_msg=f"{direction} strict={strict} matched time",
        )
        np.testing.assert_array_equal(
            np.nan_to_num(got["payload_asof"].to_numpy(), nan=-999.0),
            np.nan_to_num(want["payload"].to_numpy(), nan=-999.0),
            err_msg=f"{direction} strict={strict} payload",
        )


def test_asof_join_tolerance_matches_merge_asof(spark):
    """VERDICT r4 item 7: tolerance= nulls out matches farther than the
    bound, in every direction — differential vs pandas merge_asof."""
    import datetime as dt

    left_pdf, right_pdf = _data(seed=23)
    right_pdf = right_pdf.drop_duplicates(["k", "t"])
    left = spark.createDataFrame(left_pdf)
    right = spark.createDataFrame(right_pdf)
    tol = pd.Timedelta(microseconds=40_000)

    cases = [("backward", True), ("backward", False), ("forward", True), ("nearest", False)]
    for direction, strict in cases:
        got = (
            asof_join(
                left,
                right,
                on="k",
                left_time="t",
                right_time="t",
                right_payload=["t", "payload"],
                strict=strict,
                direction=direction,
                tolerance=dt.timedelta(microseconds=40_000),
            )
            .orderBy("lid")
            .toPandas()
        )
        want = pd.merge_asof(
            left_pdf.sort_values("t", kind="mergesort"),
            right_pdf.sort_values("t", kind="mergesort").rename(columns={"t": "rt"}),
            left_on="t",
            right_on="rt",
            by="k",
            allow_exact_matches=not strict,
            direction=direction,
            tolerance=tol,
        ).sort_values("lid").reset_index(drop=True)
        np.testing.assert_array_equal(
            got["t_asof"].to_numpy().astype("datetime64[us]"),
            want["rt"].to_numpy().astype("datetime64[us]"),
            err_msg=f"{direction} strict={strict} matched time",
        )


def test_asof_tolerance_nearest_boundary(spark):
    """Numeric time column: the bound is inclusive, and a nearest match
    outside it nulls out (both candidates are then out of range)."""
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [10.0], "lid": [0]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [7.0, 14.0], "v": ["back", "fwd"]})
    )

    def run(tol):
        return asof_join(
            left, right, on="k", left_time="t", right_time="t",
            right_payload=["v"], strict=False, direction="nearest", tolerance=tol,
        ).collect()[0]["v_asof"]

    assert run(2.0) is None  # nearest dist is 3 > 2
    assert run(3.0) == "back"  # inclusive bound
    assert run(5.0) == "back"  # both in range: nearest wins


def test_asof_tolerance_timedelta_is_exact_microseconds(spark):
    """Self-review r5: timedelta -> microseconds must use exact integer
    division (total_seconds()*1e6 truncates e.g. 249us to 248)."""
    import datetime as dt

    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1],
                "t": pd.to_datetime(["2024-01-01 00:00:00.000249"]).astype("datetime64[us]"),
                "lid": [0],
            }
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1],
                "t": pd.to_datetime(["2024-01-01 00:00:00.000000"]).astype("datetime64[us]"),
                "v": ["hit"],
            }
        )
    )
    got = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_payload=["v"], strict=True,
        tolerance=dt.timedelta(microseconds=249),  # match is EXACTLY at the bound
    ).collect()
    assert got[0]["v_asof"] == "hit"


def test_asof_invalid_tolerance(spark):
    import datetime as dt

    import pytest as _pytest

    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [1.0], "lid": [0]}))
    with _pytest.raises(ValueError):
        asof_join(
            left, left, on="k", left_time="t", right_time="t", tolerance=-1.0
        )
    with _pytest.raises(ValueError):  # numeric time column, timedelta tolerance
        asof_join(
            left, left, on="k", left_time="t", right_time="t",
            tolerance=dt.timedelta(seconds=1),
        )


def test_asof_nearest_tie_goes_backward(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [10.0], "lid": [0]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "t": [5.0, 15.0], "v": ["back", "fwd"]})
    )
    got = asof_join(
        left, right, on="k", left_time="t", right_time="t",
        right_payload=["v"], strict=False, direction="nearest",
    ).collect()
    assert got[0]["v_asof"] == "back"  # equidistant: pandas convention


def test_asof_invalid_direction_combos(spark):
    import pytest as _pytest

    left = spark.createDataFrame(pd.DataFrame({"k": [1], "t": [1.0], "lid": [0]}))
    with _pytest.raises(ValueError):
        asof_join(left, left, on="k", left_time="t", right_time="t", direction="sideways")
    with _pytest.raises(ValueError):
        asof_join(
            left, left, on="k", left_time="t", right_time="t",
            direction="nearest", strict=True,
        )
