"""Streaming MERGE writer: keyed current-state maintenance across
triggers, intra-batch duplicate resolution, delete semantics."""

import os

import pandas as pd
from pyspark.sql import functions as F

SCHEMA = "k long, v string, seq long, del boolean"


def _write(path, name, rows):
    pdf = pd.DataFrame(rows, columns=["k", "v", "seq", "del"])
    pdf.to_parquet(os.path.join(path, name))


def test_merge_stream_state_across_triggers(spark, tmp_path):
    from renkodf_spark.streaming.merge_stream import merge_writer

    src = str(tmp_path / "src")
    os.makedirs(src)
    # trigger 1: inserts, incl. an intra-batch duplicate key (seq wins)
    _write(src, "b1.parquet", [
        (1, "a0", 1, False),
        (1, "a1", 2, False),   # same key, higher seq -> wins
        (2, "b", 3, False),
        (3, "c", 4, False),
    ])
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(src)
    )
    state = str(tmp_path / "state")
    writer = merge_writer(
        state, keys=["k"], delete_col="del"
    )
    q = (
        stream.withColumnRenamed("seq", "__seq")
        .writeStream.foreachBatch(writer)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        # trigger 2: update k=1, delete k=2, insert k=4, orphan delete k=9
        _write(src, "b2.parquet", [
            (1, "a2", 5, False),
            (2, None, 6, True),
            (4, "d", 7, False),
            (9, None, 8, True),
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    snaps = spark.read.parquet(state)
    latest = snaps.agg(F.max("batch_id")).collect()[0][0]
    cur = {r.k: r.v for r in snaps.filter(F.col("batch_id") == latest).collect()}
    assert cur == {1: "a2", 3: "c", 4: "d"}
    # trigger-1 snapshot immutable and correct
    first = {r.k: r.v for r in snaps.filter(F.col("batch_id") == 0).collect()}
    assert first == {1: "a1", 2: "b", 3: "c"}
    assert sorted(
        r.batch_id for r in snaps.select("batch_id").distinct().collect()
    ) == [0, 1]
