"""Socket source coverage (the last of the declared streaming sources:
file / rate / socket): a local TCP server emits CSV tick lines; the
stream parses and runs through the Renko operator."""

import os
import socket
import threading
import time

import pyspark.sql.functions as F
import pytest

from renkodf_spark.streaming import renko_stream

LINES = [
    "A,2024-01-01 00:00:00,10.2",
    "A,2024-01-01 00:01:00,11.4",
    "A,2024-01-01 00:02:00,12.6",
    "A,2024-01-01 00:03:00,11.9",
    "A,2024-01-01 00:04:00,13.2",
]


def _serve(sock, stop):
    conn, _ = sock.accept()
    with conn:
        for line in LINES:
            conn.sendall((line + "\n").encode())
            time.sleep(0.05)
        # keep the connection open until the reader is done
        while not stop.is_set():
            time.sleep(0.1)


def test_renko_over_socket_source(spark, tmp_path):
    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    stop = threading.Event()
    t = threading.Thread(target=_serve, args=(srv, stop), daemon=True)
    t.start()

    try:
        raw = (
            spark.readStream.format("socket")
            .option("host", "127.0.0.1")
            .option("port", str(port))
            .load()
        )
        parts = F.split(F.col("value"), ",")
        ticks = raw.select(
            parts.getItem(0).alias("symbol"),
            F.to_timestamp(parts.getItem(1)).alias("event_time"),
            parts.getItem(2).cast("double").alias("close"),
        )
        q = (
            renko_stream(ticks, 1.0)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("socket_bricks")
            .option("checkpointLocation", os.path.join(str(tmp_path), "ck"))
            .start()
        )
        deadline = time.time() + 30
        closes = []
        while time.time() < deadline:
            q.processAllAvailable()
            closes = [
                r["close"]
                for r in spark.sql(
                    "SELECT close FROM socket_bricks ORDER BY brick_seq"
                ).collect()
            ]
            if len(closes) >= 4:
                break
            time.sleep(0.5)
        q.stop()
    finally:
        stop.set()
        srv.close()

    # seed 10.0 + bricks 11, 12, 13 (the 11.9 retrace emits nothing)
    assert closes[:4] == [10.0, 11.0, 12.0, 13.0]
