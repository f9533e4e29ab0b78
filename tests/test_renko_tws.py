"""transformWithStateInPandas operator == applyInPandasWithState
operator == RenkoLive, across micro-batches; warm start via native
initialState."""

import os

import numpy as np
import pandas as pd
import pytest

pytest.importorskip(
    "google.protobuf.descriptor",
    reason="transformWithStateInPandas needs protobuf (not in this container); "
    "renko_stream (applyInPandasWithState) covers the semantics in test_streaming",
)

from renkodf_spark.streaming.renko_tws import renko_stream_tws
from tests.test_streaming import _live_replay, _two_symbol_ticks, _us

BRICK = 1.0


def _run(spark, tmpdir, pdf, n_files=3, initial_state=None, emit_seed=True):
    src = os.path.join(tmpdir, "src")
    os.makedirs(src, exist_ok=True)
    for i, idx in enumerate(np.array_split(np.arange(len(pdf)), n_files)):
        p = os.path.join(src, f"part-{i:04d}.parquet")
        pdf.iloc[idx].to_parquet(p, index=False)
        os.utime(p, (1e9 + i, 1e9 + i))
    schema = spark.createDataFrame(pdf.head(2)).schema
    ticks = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    bricks = renko_stream_tws(ticks, BRICK, initial_state=initial_state, emit_seed=emit_seed)
    q = (
        bricks.writeStream.outputMode("append")
        .format("memory")
        .queryName("tws_out")
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    out = spark.sql("SELECT * FROM tws_out").toPandas()
    q.stop()
    return out.sort_values(["symbol", "brick_seq"]).reset_index(drop=True)


def test_tws_matches_live(spark, tmp_path):
    pdf = _two_symbol_ticks(n=800)
    out = _run(spark, str(tmp_path), pdf)
    for sym in ["AAA", "BBB"]:
        live = _live_replay(pdf, sym)
        want = live._wide_frame().reset_index(drop=True)
        got = out[out["symbol"] == sym].reset_index(drop=True)
        assert len(got) == len(want), sym
        np.testing.assert_array_equal(_us(got["event_time"]), want["timestamp"].to_numpy())
        for col in ["open", "high", "low", "close", "volume", "direction", "is_reversal",
                    "nongap_open", "fake_high"]:
            np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy(), err_msg=f"{sym}.{col}")


def test_tws_warm_start_native_initial_state(spark, tmp_path):
    from renkodf_spark.live import RenkoLive
    from renkodf_spark.operators.renko import renko, to_rws

    pdf = _two_symbol_ticks(n=800)
    split_t = pdf["event_time"].quantile(0.5)
    head, tail = pdf[pdf["event_time"] <= split_t], pdf[pdf["event_time"] > split_t]

    export_df = to_rws(renko(spark.createDataFrame(head), BRICK, drop_first=False), BRICK)
    out = _run(spark, str(tmp_path), tail, n_files=2, initial_state=export_df, emit_seed=False)

    export = export_df.toPandas()
    for sym in ["AAA", "BBB"]:
        ext = export[export["symbol"] == sym].sort_values("brick_seq")
        live = RenkoLive(external_df=ext.drop(columns=["symbol", "brick_seq"]), ts_unit="us")
        sub = tail[tail["symbol"] == sym].sort_values("event_time", kind="mergesort")
        for t, p in zip(_us(sub["event_time"]), sub["close"]):
            live.add_prices(int(t), float(p))
        want = live._wide_frame().reset_index(drop=True).iloc[len(ext):]
        got = out[out["symbol"] == sym].reset_index(drop=True)
        assert len(got) == len(want), sym
        assert got["brick_seq"].iloc[0] == ext["brick_seq"].max() + 1
        for col in ["open", "close", "volume", "direction", "is_reversal"]:
            np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy(), err_msg=f"{sym}.{col}")
