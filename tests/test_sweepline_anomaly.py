"""Unit tests for sweep-line concurrency, rolling z-scores, and the
key-skew report."""

import pytest
from pyspark.sql import functions as F

from renkodf_spark.functions.skew import skew_report
from renkodf_spark.operators.anomaly import rolling_zscore
from renkodf_spark.operators.sweepline import concurrency_profile, max_concurrency


def test_concurrency_profile_hand_case(spark):
    iv = spark.createDataFrame(
        [
            (1, 0, 10),
            (1, 5, 15),   # overlaps -> 2 active in [5, 10)
            (1, 10, 20),  # starts exactly when the first ends: [) -> still 2
            (1, 30, 30),  # empty interval: ignored
            (2, 0, 5),
        ],
        "k long, s long, e long",
    )
    out = {(r.k, r.ts): (r.delta, r.active)
           for r in concurrency_profile(iv, start_col="s", end_col="e",
                                        on=["k"]).collect()}
    assert out == {
        (1, 0): (1, 1),
        (1, 5): (1, 2),
        (1, 10): (0, 2),   # -1 end and +1 start collapse to net 0
        (1, 15): (-1, 1),
        (1, 20): (-1, 0),
        (2, 0): (1, 1),
        (2, 5): (-1, 0),
    }
    peak = {r.k: (r.peak_active, r.peak_ts)
            for r in max_concurrency(iv, start_col="s", end_col="e",
                                     on=["k"]).collect()}
    assert peak == {1: (2, 5), 2: (1, 0)}  # earliest boundary at the peak


def test_concurrency_matches_naive_count(spark):
    import random

    rng = random.Random(7)
    rows = []
    for i in range(300):
        s = rng.randrange(0, 500)
        rows.append((i % 3, s, s + rng.randrange(1, 60)))
    iv = spark.createDataFrame(rows, "k long, s long, e long")
    prof = concurrency_profile(iv, start_col="s", end_col="e", on=["k"]).collect()
    data = {}
    for k, s, e in rows:
        data.setdefault(k, []).append((s, e))
    for r in prof:
        naive = sum(1 for (s, e) in data[r.k] if s <= r.ts < e)
        assert r.active == naive, (r.k, r.ts)


def test_rolling_zscore_values_and_guards(spark):
    rows = [("a", i, float(v)) for i, v in enumerate([10, 10, 10, 10, 100])]
    df = spark.createDataFrame(rows, "g string, seq long, value double")
    out = {r.seq: (r.window_n, r.zscore, r.is_anomaly)
           for r in rolling_zscore(df, value_col="value", order_cols=["seq"],
                                   partition_cols=["g"], window=10,
                                   threshold=1.5).collect()}
    # n < 3 -> NULL; zero variance -> NULL; the spike is anomalous
    assert out[0] == (1, None, 0)
    assert out[1] == (2, None, 0)
    assert out[2] == (3, None, 0)  # variance 0
    n, z, flag = out[4]
    assert n == 5 and flag == 1
    import statistics

    vals = [1000, 1000, 1000, 1000, 10000]  # cents
    expect = (vals[-1] - statistics.mean(vals)) / statistics.stdev(vals)
    assert z == pytest.approx(round(expect, 4), abs=1e-9)


def test_rolling_zscore_layout_independent(spark):
    rows = [("g%d" % (i % 2), i, float((i * 37) % 101)) for i in range(200)]
    df = spark.createDataFrame(rows, "g string, seq long, value double")
    a = rolling_zscore(df.repartition(1), value_col="value", order_cols=["seq"],
                       partition_cols=["g"], window=20).collect()
    b = rolling_zscore(df.repartition(9), value_col="value", order_cols=["seq"],
                       partition_cols=["g"], window=20).collect()
    assert sorted(repr(tuple(r)) for r in a) == sorted(repr(tuple(r)) for r in b)


def test_rolling_zscore_validates(spark):
    df = spark.createDataFrame([("a", 1, 1.0)], "g string, seq long, value double")
    with pytest.raises(ValueError, match="window"):
        rolling_zscore(df, value_col="value", order_cols=["seq"], window=1)


def test_skew_report_shares(spark):
    rows = [("hot",)] * 70 + [("warm",)] * 20 + [("cold%d" % i,) for i in range(10)]
    df = spark.createDataFrame(rows, "k string")
    out = {r.rank: r for r in skew_report(df, "k", top_k=3).collect()}
    assert out[1].k == "hot" and out[1]["count"] == 70
    assert out[1].share_ppm == 70 * 1000000 // 100
    assert out[2].k == "warm" and out[2].share_ppm == 200000
    assert out[3]["count"] == 1  # first cold key by tie-break order
    assert out[1].total_rows == 100 and out[1].n_keys == 12
    assert out[3].cum_share_ppm == out[1].share_ppm + out[2].share_ppm + out[3].share_ppm


# ------------------------------------------------------------ CMS hh / RRF

from renkodf_spark.functions import countmin  # noqa: E402
from renkodf_spark.operators.search import rrf_fuse  # noqa: E402


def test_cms_heavy_hitters_no_false_results(spark):
    rows = [("hot",)] * 200 + [("warm",)] * 90 + [(f"k{i % 40}",) for i in range(200)]
    df = spark.createDataFrame(rows, "kk string")
    # narrow sketch forces collisions -> possible false CANDIDATES,
    # which the exact phase must eliminate
    sk = countmin.cms_build(df, "kk", width=8, depth=3)
    hh = {r.kk: (r.est_count, r.exact_count)
          for r in countmin.cms_heavy_hitters(df, sk, "kk", min_count=80,
                                              width=8, depth=3).collect()}
    exact = {r.kk: r.c for r in
             df.groupBy("kk").agg(F.count(F.lit(1)).alias("c")).collect()}
    true_hh = {k for k, c in exact.items() if c >= 80}
    assert set(hh) == true_hh  # no false positives OR negatives
    for k, (est, ex) in hh.items():
        assert est >= ex == exact[k]


def test_rrf_fuse_hand_case(spark):
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)], "doc_id long, rank int")
    out = {r.doc_id: (r.rrf_nanos, r.rank)
           for r in rrf_fuse(a, b, k=10).collect()}
    r61, r62, r63 = round(1e9 / 61), round(1e9 / 62), round(1e9 / 63)
    assert out[1][0] == r61 + r62          # rank 1 + rank 2
    assert out[3][0] == r63 + r61
    assert out[2][0] == r62
    assert out[9][0] == r63
    # ordering: doc1 (1/61+1/62) > doc3 (1/61+1/63) > doc2 > doc9
    assert [out[d][1] for d in (1, 3, 2, 9)] == [1, 2, 3, 4]
