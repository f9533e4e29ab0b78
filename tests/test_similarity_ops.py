

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


def test_hard_negative_ann_equals_exact_when_probing_all_cells(spark, sf_dir):
    """With n_probe >= #cells every anchor probes every cell, the
    candidate pool is the full corpus, and the ANN miner must reproduce
    the exact miner row-for-row — pinning that the recall stage is the
    ONLY approximation."""
    from pyspark.sql import functions as F

    from renkodf_spark.operators.similarity import (
        embedding_centroids,
        hard_negative_mining,
        hard_negative_mining_ann,
    )
    from renkodf_spark.queries.pipeline import _emb

    emb = _emb(spark, sf_dir)
    cents = embedding_centroids(emb, dim=64).cache()
    n_cells = cents.count()
    anchors = emb.filter(F.col("vec_id") % 40 == 0)
    cols = ["anchor_id", "neighbor_id", "rank", "neg_sim", "best_positive_sim", "is_hard"]
    exact = {tuple(r) for r in hard_negative_mining(emb, anchors, k=5).collect()}
    ann = {
        tuple(r)
        for r in hard_negative_mining_ann(
            emb, anchors, cents, k=5, n_probe=n_cells
        ).collect()
    }
    assert exact == ann and len(exact) > 0


def test_hard_negative_ann_recall_rises_with_probes(spark, sf_dir):
    """The recall dial: mined-negative overlap with the exact miner
    must be non-decreasing in n_probe (and substantial even at 1)."""
    from pyspark.sql import functions as F

    from renkodf_spark.operators.similarity import (
        embedding_centroids,
        hard_negative_mining,
        hard_negative_mining_ann,
    )
    from renkodf_spark.queries.pipeline import _emb

    emb = _emb(spark, sf_dir).cache()
    cents = embedding_centroids(emb, dim=64).cache()
    anchors = emb.filter(F.col("vec_id") % 40 == 0)
    exact = {
        (r["anchor_id"], r["neighbor_id"])
        for r in hard_negative_mining(emb, anchors, k=5).collect()
    }
    rec = []
    for p in (1, 3):
        got = {
            (r["anchor_id"], r["neighbor_id"])
            for r in hard_negative_mining_ann(
                emb, anchors, cents, k=5, n_probe=p
            ).collect()
        }
        rec.append(len(got & exact) / len(exact))
    assert rec[0] > 0.1 and rec[1] > rec[0], rec
