"""Tick ingestion surface: renames, epoch units, csv/json readers,
partitioned brick sink (SURVEY.md O-1, O-2, O-20)."""

import os

import pandas as pd
import pytest

from renkodf_spark.operators.renko import renko
from renkodf_spark.sources.ticks import TICK_SCHEMA, normalize_ticks, read_ticks, write_bricks


def test_normalize_bid_rename_and_epoch_ms(spark):
    pdf = pd.DataFrame(
        {"timestamp": [1700000000000, 1700000001000], "bid": [1.1, 1.2], "ask": [1.2, 1.3]}
    )
    out = normalize_ticks(spark.createDataFrame(pdf), price_col="bid", ts_unit="ms")
    row = out.orderBy("event_time").first()
    assert row["close"] == 1.1
    assert row["symbol"] == "0"
    assert str(row["event_time"]).startswith("2023-11-14")
    assert dict(out.dtypes)["event_time"] == "timestamp"


def test_normalize_missing_price_raises(spark):
    pdf = pd.DataFrame({"ts": [1, 2]})
    with pytest.raises(ValueError):
        normalize_ticks(spark.createDataFrame(pdf))


def test_csv_json_roundtrip(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "symbol": ["A"] * 4,
            "time": pd.date_range("2024-01-01", periods=4, freq="1min").astype(str),
            "price": [10.2, 11.4, 12.6, 11.9],
        }
    )
    csv_path = os.path.join(str(tmp_path), "ticks.csv")
    json_path = os.path.join(str(tmp_path), "ticks.json")
    pdf.to_csv(csv_path, index=False)
    pdf.to_json(json_path, orient="records", lines=True)

    for fmt, path in [("csv", csv_path), ("json", json_path)]:
        ticks = read_ticks(spark, path, format=fmt, price_col="price", time_col="time")
        bars = renko(ticks, 1.0).orderBy("brick_seq").toPandas()
        assert bars["close"].tolist() == [12.0], fmt  # the 11.0 brick is label-dropped


def test_write_bricks_partitioned(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "symbol": ["A"] * 5 + ["B"] * 5,
            "event_time": list(pd.date_range("2024-01-01", periods=5, freq="1min")) * 2,
            "close": [10.0, 11.2, 12.4, 13.6, 12.9] * 2,
        }
    )
    wide = renko(spark.createDataFrame(pdf), 1.0)
    out = os.path.join(str(tmp_path), "bricks")
    write_bricks(wide, out)
    assert sorted(d for d in os.listdir(out) if d.startswith("symbol=")) == ["symbol=A", "symbol=B"]
    back = spark.read.parquet(out)
    assert back.count() == wide.count()
    # partition pruning: reading one symbol touches one directory
    plan = back.filter("symbol = 'A'")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(symbol" in plan


def test_streaming_csv_reader(spark, tmp_path):
    src = os.path.join(str(tmp_path), "stream")
    os.makedirs(src)
    pd.DataFrame(
        {
            "symbol": ["A"] * 4,
            "time": pd.date_range("2024-01-01", periods=4, freq="1min").astype(str),
            "price": [10.2, 11.4, 12.6, 11.9],
        }
    ).to_csv(os.path.join(src, "a.csv"), index=False)

    import pyspark.sql.types as T

    schema = T.StructType(
        [
            T.StructField("symbol", T.StringType()),
            T.StructField("time", T.StringType()),
            T.StructField("price", T.DoubleType()),
        ]
    )
    ticks = read_ticks(
        spark, src, format="csv", streaming=True, schema=schema, price_col="price", time_col="time"
    )
    assert ticks.isStreaming
    from renkodf_spark.streaming import renko_stream

    q = (
        renko_stream(ticks, 1.0)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("csv_bricks")
        .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
        .start()
    )
    q.processAllAvailable()
    got = spark.sql("SELECT close FROM csv_bricks ORDER BY brick_seq").toPandas()
    q.stop()
    assert got["close"].tolist() == [10.0, 11.0, 12.0]  # seed + 2 bricks


def test_load_events_rejects_non_utc_session(spark, sf_dir):
    """ADVICE r4: the TIMESTAMP_NTZ->timestamp cast localizes in the
    session zone at execution time, so load_table must refuse a non-UTC
    session instead of silently shifting events.ts."""
    import pytest

    from renkodf_spark.sources.tables import load_table

    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        raw_type = dict(
            spark.read.parquet(f"{sf_dir}/events.parquet").dtypes
        ).get("ts")
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    if raw_type != "timestamp_ntz":
        pytest.skip(f"events.ts reads as {raw_type}; the guarded branch is Spark>=4.1")
    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="timeZone"):
            load_table(spark, sf_dir, "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)
    # and a UTC session still loads fine
    assert load_table(spark, sf_dir, "events").limit(1).count() == 1
