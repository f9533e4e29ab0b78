"""compat.Renko / compat.RenkoWS must be drop-in equal to the reference
package on its own calling conventions; df_equal/diff_report (O-22)."""

import numpy as np
import pandas as pd
import pytest

from renkodf_spark.compat import Renko, RenkoWS
from renkodf_spark.schema import MODES
from tests.test_vs_reference import make_ticks


@pytest.mark.parametrize("mode", ["wicks", "normal", "fake-r-nongap"])
def test_compat_renko_equals_reference(reference_renko, mode):
    ticks = make_ticks(9, n=3000)
    ref = reference_renko.Renko(ticks.copy(), 1.0, divide_by=1).renko_df(mode)
    ours = Renko(ticks.copy(), 1.0).renko_df(mode)
    assert list(ours.columns) == list(ref.columns)
    np.testing.assert_array_equal(ours.index.to_numpy(), ref.index.to_numpy())
    for c in ref.columns:
        np.testing.assert_array_equal(ours[c].to_numpy(), ref[c].to_numpy(), err_msg=c)


def test_compat_to_rws_roundtrip(reference_renko):
    ticks = make_ticks(10, n=2000)
    ref_export = reference_renko.Renko(ticks.copy(), 1.0, divide_by=1).to_rws(use_iloc=-7)
    ours_export = Renko(ticks.copy(), 1.0).to_rws(use_iloc=-7)
    assert list(ours_export.columns) == list(ref_export.columns)
    for c in ref_export.columns:
        np.testing.assert_array_equal(ours_export[c].to_numpy(), ref_export[c].to_numpy(), err_msg=c)

    # and both warm-start identically
    ws_ref = reference_renko.RenkoWS(external_df=ref_export.copy(), ts_unit="ns")
    ws_ours = RenkoWS(external_df=ours_export.copy(), ts_unit="ns")
    t0 = int(ticks.index.asi8[-1])
    for k, p in enumerate([101.0, 103.5, 99.2]):
        ws_ref.add_prices(t0 + k, p)
        ws_ours.add_prices(t0 + k, p)
    a, b = ws_ref.renko_df(), ws_ours.renko_df()
    for c in a.columns:
        np.testing.assert_array_equal(b[c].to_numpy(), a[c].to_numpy(), err_msg=c)


def test_compat_gap_tolerance_parity(reference_renko):
    """VERDICT r2 item 8: the reference caps bricks-per-event at
    gap_tolerance (pre-allocated arrays, renkodf.py:541-550) and raises
    IndexError on a larger gap; the compat layer must honor the same
    contract instead of silently accepting the argument."""
    t0 = 1_700_000_000_000_000
    # ~300-brick gap: seed at 10.0, one tick at 320.0 with brick 1.0
    ref = reference_renko.RenkoWS(t0, 10.0, 1.0)
    with pytest.raises(IndexError):
        ref.add_prices(t0 + 1, 320.0)
    ours = RenkoWS(t0, 10.0, 1.0)
    with pytest.raises(IndexError):
        ours.add_prices(t0 + 1, 320.0)

    # a raised tolerance admits the gap in both engines, with equal bricks
    ref2 = reference_renko.RenkoWS(t0, 10.0, 1.0)
    ref2.add_prices(t0 + 1, 320.0, gap_tolerance=400)
    ours2 = RenkoWS(t0, 10.0, 1.0)
    ours2.add_prices(t0 + 1, 320.0, gap_tolerance=400)
    a, b = ref2.renko_df(), ours2.renko_df()
    assert len(a) == len(b) > 300
    for c in a.columns:
        np.testing.assert_array_equal(b[c].to_numpy(), a[c].to_numpy(), err_msg=c)
    # ours: cap disabled entirely with None (documented deliberate extra)
    ours3 = RenkoWS(t0, 10.0, 1.0)
    ours3.add_prices(t0 + 1, 320.0, gap_tolerance=None)
    assert len(ours3.renko_df()) == len(a)


def test_compat_validation_errors():
    with pytest.raises(ValueError):
        Renko(pd.DataFrame({"close": [1.0]}), 0)
    with pytest.raises(ValueError):
        Renko(pd.DataFrame({"close": [1.0]}), 1.0, divide_by=0)
    with pytest.raises(ValueError):
        Renko(pd.DataFrame({"x": [1.0]}), 1.0)
    with pytest.raises(ValueError):
        Renko(pd.DataFrame({"close": [1.0]}), 1.0).renko_df("bogus")


def test_df_equal_and_diff_report(spark):
    from renkodf_spark.functions import df_equal, diff_report

    a = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.0, 3.0]}))
    b = spark.createDataFrame(pd.DataFrame({"k": [3, 1, 2], "v": [3.0, 1.0, 2.0]}))
    assert df_equal(a, b)
    c = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "v": [1.0, 2.4, 3.0]}))
    assert not df_equal(a, c)
    assert df_equal(a, c, round_digits=0)
    d = diff_report(a, c, ["k"]).toPandas()
    assert d["k"].tolist() == [2] and d["v_a"].iloc[0] == 2.0 and d["v_b"].iloc[0] == 2.4


def test_salted_agg_salt_is_replay_deterministic(spark, sf_dir):
    """VERDICT r4 item 8: the salt must be a pure function of row
    content — identical per row on any partition layout — so stage-1
    partials replay bit-identically under retry/speculation (the old
    monotonically_increasing_id salt was physical-position-dependent)."""
    from renkodf_spark.functions.skew import content_salt, salted_agg
    from renkodf_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    by_id = lambda d: {  # noqa: E731
        r["event_id"]: r["s"] for r in d.withColumn("s", content_salt(ev, 16)).collect()
    }
    a, b = by_id(ev), by_id(ev.repartition(13))
    assert a == b
    assert len(set(a.values())) > 1  # and it actually spreads rows
    # stage-1 partials are therefore layout-invariant too: same (key,
    # salt) cells with the same partial values on both layouts
    import pyspark.sql.functions as F

    def stage1(d):
        return {
            (r["event_type"], r["s"]): (r["n"], r["mx"])
            for r in d.withColumn("s", content_salt(ev, 16))
            .groupBy("event_type", "s")
            .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("mx"))
            .collect()
        }

    assert stage1(ev) == stage1(ev.repartition(13))
    # and results still match the direct aggregation
    got = salted_agg(ev, ["event_type"], {"n": ("count", "*")}, buckets=16)
    want = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_salted_agg_tolerates_map_columns(spark):
    """Self-review r5: F.hash rejects MapType, so the content salt must
    skip map columns instead of failing at analysis time."""
    from pyspark.sql import functions as F

    from renkodf_spark.functions.skew import salted_agg

    df = spark.createDataFrame(
        [(i % 2, float(i), {"a": str(i)}) for i in range(40)],
        "k long, v double, props map<string,string>",
    )
    got = {
        r["k"]: (r["n"], r["total"])
        for r in salted_agg(df, ["k"], {"n": ("count", "*"), "total": ("sum", "v")}).collect()
    }
    assert got == {0: (20, 380.0), 1: (20, 400.0)}


def test_salted_agg_matches_direct(spark, sf_dir):
    from renkodf_spark.functions.skew import salted_agg
    from renkodf_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    got = (
        salted_agg(
            ev,
            ["event_type"],
            {
                "n": ("count", "*"),
                "max_v": ("max", "value"),
                "min_u": ("min", "user_id"),
                "sum_u": ("sum", "user_id"),
                "avg_u": ("avg", "user_id"),
            },
            buckets=8,
        )
        .orderBy("event_type")
        .toPandas()
    )
    import pyspark.sql.functions as F

    want = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("value").alias("max_v"),
            F.min("user_id").alias("min_u"),
            F.sum("user_id").alias("sum_u"),
            F.avg("user_id").alias("avg_u"),
        )
        .orderBy("event_type")
        .toPandas()
    )
    import numpy as np

    for c in want.columns:
        np.testing.assert_array_equal(got[c].to_numpy(), want[c].to_numpy(), err_msg=c)
