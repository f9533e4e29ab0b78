"""renko_stream_animate (update-mode forming-bar side output) must
match RenkoLive.renko_animate after every micro-batch, per mode,
including the forming-bar retrace branches and the wick quirk."""

import os

import numpy as np
import pandas as pd
import pytest

from renkodf_spark.live import RenkoLive
from renkodf_spark.streaming import renko_stream_animate
from tests.test_streaming import _two_symbol_ticks, _us

BRICK = 1.0


@pytest.mark.parametrize("mode", ["wicks", "normal", "nongap"])
def test_animate_stream_matches_live(spark, tmp_path, mode):
    pdf = _two_symbol_ticks(n=600)
    tmpdir = str(tmp_path)
    src = os.path.join(tmpdir, "src")
    os.makedirs(src)
    n_files = 3
    batches = np.array_split(np.arange(len(pdf)), n_files)
    for i, idx in enumerate(batches):
        p = os.path.join(src, f"part-{i:04d}.parquet")
        pdf.iloc[idx].to_parquet(p, index=False)
        os.utime(p, (1e9 + i, 1e9 + i))

    captured = []  # (batch_id, pandas)
    schema = spark.createDataFrame(pdf.head(2)).schema
    ticks = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(src)
    bricks = renko_stream_animate(ticks, BRICK, mode)
    q = (
        bricks.writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: captured.append((bid, df.toPandas())))
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert len(captured) >= n_files

    # replay the same prefix through RenkoLive after each batch
    seen = pd.DataFrame()
    for bid, out in captured:
        if out.empty:
            continue
        batch_rows = pdf.iloc[np.concatenate(batches[: bid + 1])]
        for sym in out["symbol"].unique():
            sub = batch_rows[batch_rows["symbol"] == sym].sort_values(
                "event_time", kind="mergesort"
            )
            ts = _us(sub["event_time"])
            live = RenkoLive(int(ts[0]), float(sub["close"].iloc[0]), brick_size=BRICK)
            for t, p in zip(ts[1:], sub["close"].iloc[1:]):
                live.add_prices(int(t), float(p))
            want = live.renko_animate(mode).iloc[-1]  # the forming bar

            got = out[(out["symbol"] == sym) & (out["is_forming"] == 1)]
            assert len(got) == 1, (bid, sym)
            got = got.iloc[0]
            for col in ["open", "high", "low", "close", "volume", "direction"]:
                assert got[col] == want[col], (bid, sym, col, got[col], want[col])
        seen = pd.concat([seen, out])

    # completed bricks accumulate densely across batches
    for sym in ["AAA", "BBB"]:
        done = (
            seen[(seen["symbol"] == sym) & (seen["is_forming"] == 0)]
            .sort_values("brick_seq")
            .reset_index(drop=True)
        )
        assert done["brick_seq"].tolist() == list(range(len(done)))
