

def test_hard_negative_mining_flags(spark):
    """Hand-built geometry: anchor [1,0] label 0; positive [0.9, 0.1]
    label 0; a negative [1, 0.01] label 1 MORE similar than the
    positive (hard) and a negative [0, 1] label 1 less similar
    (easy). An anchor with no same-label row gets is_hard NULL."""
    from pyspark.sql import functions as F

    from renkodf_spark.operators.similarity import hard_negative_mining

    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),       # anchor
            (1, [0.9, 0.1], 0),       # positive
            (2, [1.0, 0.01], 1),      # hard negative
            (3, [0.0, 1.0], 1),       # easy negative
            (10, [0.5, 0.5], 7),      # lonely-label anchor
        ],
        "vec_id long, embedding array<float>, label int",
    )
    anchors = emb.filter(F.col("vec_id").isin(0, 10))
    out = {
        (r["anchor_id"], r["neighbor_id"]): r.asDict()
        for r in hard_negative_mining(emb, anchors, k=5).collect()
    }
    assert out[(0, 2)]["is_hard"] == 1
    assert out[(0, 3)]["is_hard"] == 0
    assert out[(0, 2)]["rank"] == 1  # most similar negative first
    # lonely label: every other row is a negative, no positive -> NULL
    assert all(
        v["is_hard"] is None for kv, v in out.items() if kv[0] == 10
    ) and any(kv[0] == 10 for kv in out)
