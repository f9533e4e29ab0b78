"""Log-linear quantile sketch (functions/quantiles.py): bucket math,
rank-error guarantee, mergeability, streaming parity."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from renkodf_spark.functions import quantiles as Q


def _sketch_dict(df, gcols=("g",)):
    return {
        tuple([*[r[c] for c in gcols], r.e, r.m]): r.cnt for r in df.collect()
    }


def test_bucket_lower_bound_is_tight(spark):
    """For every v in a range spanning the e < b and e >= b regimes:
    v's bucket floor <= v, and floor(v) shares v's bucket (the floor is
    IN the bucket — the estimate the sketch returns is attainable)."""
    vals = list(range(0, 600)) + [2**40 + o for o in range(-3, 4)] + [2**62 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    e, m = Q.bucket_exprs("v", 64)
    buck = df.select("v", e, m).withColumn("lo", Q.bucket_floor_expr(64))
    rows = buck.collect()
    for r in rows:
        assert r.lo <= r.v, (r.v, r.lo)
    # the floor value itself must map to the same bucket
    lo_df = spark.createDataFrame([(r.lo,) for r in rows], "v long").select("v", e, m)
    lo_bucket = {(r.v): (r.e, r.m) for r in lo_df.collect()}
    for r in rows:
        assert lo_bucket[r.lo] == (r.e, r.m), (r.v, r.lo)


def test_relative_error_bound(spark):
    """est <= v* and (v* - est) * k <= 2^e + k — the 1/k relative-error
    guarantee (+1 integer-ceil slack) on a skewed value set."""
    k = 64
    vals = [(i * i * 7919) % 1_000_003 + 1 for i in range(5000)]
    df = spark.createDataFrame([("x", v) for v in vals], "g string, v long")
    sk = Q.quantile_sketch(df, "g", "v", k=k)
    est = {r.q_permille: (r.est, r.r) for r in Q.sketch_quantiles(sk, "g", [(1, 2), (99, 100)], k=k).collect()}
    sv = sorted(vals)
    for qp, (e_, r_) in est.items():
        v_star = sv[r_ - 1]
        assert e_ <= v_star
        assert (v_star - e_) * k <= v_star + k  # relative error <= 1/k (+ceil slack)


def test_merge_equals_direct(spark):
    """Merging finer sketches == sketching directly (counts are
    additive): the mergeability contract."""
    rows = [("a", "u", i % 97 + 1) for i in range(500)] + [
        ("a", "w", (i * 13) % 1009 + 1) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, s string, v long")
    fine = Q.quantile_sketch(df, ["g", "s"], "v", k=32)
    merged = _sketch_dict(Q.merge_sketches(fine, "g"))
    direct = _sketch_dict(Q.quantile_sketch(df, "g", "v", k=32))
    assert merged == direct


def test_zero_bucket_exact(spark):
    df = spark.createDataFrame([("z", 0)] * 5 + [("z", 3)], "g string, v long")
    sk = Q.quantile_sketch(df, "g", "v", k=16)
    d = _sketch_dict(sk)
    assert d[("z", -1, 0)] == 5
    est = Q.sketch_quantiles(sk, "g", [(1, 2)], k=16).collect()[0]
    assert est.est == 0 and est.r == 3


def test_k_validation(spark):
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    for bad in (0, 1, 3, 48, -8):
        with pytest.raises(ValueError, match="power of two"):
            Q.quantile_sketch(df, "g", "v", k=bad)
    with pytest.raises(ValueError, match="permille"):
        Q.sketch_quantiles(Q.quantile_sketch(df, "g", "v"), "g", [(1, 3)])


def test_quantile_sketch_stream_equals_batch(spark, tmp_path):
    """Streaming sketch maintenance: per-trigger deltas fold to the
    exact batch sketch of the concatenated stream, including after a
    compaction crash leaves a delta visible twice."""
    import shutil

    from renkodf_spark.streaming.curation_stream import (
        quantile_sketch_writer,
        read_quantile_sketch,
    )

    schema = "g string, v long"
    src = str(tmp_path / "src")
    os.makedirs(src)
    batches = [
        [("a", 5), ("a", 130), ("b", 7)],
        [("a", 130), ("b", 100000), ("b", 0)],
        [("a", 2**40), ("b", 7), ("a", 5)],
    ]

    def _w(name, rows):
        pd.DataFrame(rows, columns=["g", "v"]).to_parquet(os.path.join(src, name))

    _w("b1.parquet", batches[0])
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    path = str(tmp_path / "qsk")
    q = (
        stream.writeStream.foreachBatch(
            quantile_sketch_writer(path, "g", "v", k=32, n_buckets=4, compact_every=2)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        _w("b2.parquet", batches[1])
        q.processAllAvailable()
        _w("b3.parquet", batches[2])
        q.processAllAvailable()
    finally:
        q.stop()

    all_rows = spark.createDataFrame(sum(batches, []), schema)
    batch_sk = _sketch_dict(Q.quantile_sketch(all_rows, "g", "v", k=32))
    stream_sk = _sketch_dict(read_quantile_sketch(spark, path, "g"))
    assert stream_sk == batch_sk

    # compaction bound
    gens = [d for d in os.listdir(path) if d.startswith("batch_id=")]
    assert len(gens) <= 3, gens

    # crash absorption: re-expose a compacted-away generation copy
    gens = sorted(d for d in os.listdir(path) if d.startswith("batch_id="))
    shutil.copytree(os.path.join(path, gens[0]), os.path.join(path, "batch_id=97"))
    again = _sketch_dict(read_quantile_sketch(spark, path, "g"))
    assert again == batch_sk

    with pytest.raises(ValueError, match="n_buckets"):
        quantile_sketch_writer(path, "g", "v", n_buckets=0)


def test_sketch_build_plan_shape(spark, sf_dir):
    """The sketch build is counting-only Catalyst: no Python node, one
    shuffle with map-side partial aggregation (partial_count visible
    before the exchange)."""
    from renkodf_spark.plans import plan_summary
    from renkodf_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    s = plan_summary(Q.quantile_sketch(li, "l_returnflag", "cents", k=64))
    assert s.python_nodes == 0
    assert s.exchanges == 1, s.text[:2000]
    assert "partial_count" in s.text


def test_weighted_sketch_matches_python(spark):
    """Weighted sketch: bucket cnt = weight sum; the weighted median
    answers 'half the mass is below' — checked against a pure-Python
    replay on skewed weights."""
    rows = [("g", v, v) for v in [1, 1, 1, 1, 1000]]  # one heavy doc
    df = spark.createDataFrame(rows, "g string, v long, w long")
    sk = Q.quantile_sketch(df, "g", "v", k=32, weight_col="w")
    est = Q.sketch_quantiles(sk, "g", [(1, 2)], k=32).collect()[0]
    # total mass 1004, r = 502: the heavy value's bucket
    assert est.n == 1004 and est.r == 502
    e, m = Q.bucket_exprs("v", 32)
    hv = spark.createDataFrame([(1000,)], "v long").select(e, m).collect()[0]
    lo = (
        spark.createDataFrame([(hv.e, hv.m)], "e int, m long")
        .select(Q.bucket_floor_expr(32))
        .collect()[0][0]
    )
    assert est.est == lo
    # unweighted median of the same rows is the light value
    sk2 = Q.quantile_sketch(df, "g", "v", k=32)
    est2 = Q.sketch_quantiles(sk2, "g", [(1, 2)], k=32).collect()[0]
    assert est2.est == 1
