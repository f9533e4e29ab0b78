"""Stage-level decomposition of the kNN-graph family at sf0.1 — where
do knn_graph_edges' seconds actually go? Times each sub-stage with the
noop sink (guide 1.4) so the computation is measured, not the sink.

Developer tool for the optimization round; committed numbers come from
bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from pyspark.sql import functions as F

    from renkodf_spark.operators import graph, similarity
    from renkodf_spark.queries.pipeline2 import _IVF_DIM
    from renkodf_spark.queries.pipeline8 import _KNN_K
    from renkodf_spark.session import build_session
    from renkodf_spark.sources.tables import load_table

    spark = build_session("knn-stage-profile", cores=int(CPUS), driver_memory="24g")
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up
    spark.range(1000).select(F.sum("id")).collect()

    emb = load_table(spark, SF_DIR, "embeddings")

    def timed(label, thunk, reps=3):
        samples = []
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(label)
            t0 = time.perf_counter()
            thunk()
            samples.append(round(time.perf_counter() - t0, 3))
        print(f"{label:44s} min={min(samples):7.3f}  samples={samples}")
        return min(samples)

    # stage 1: centroids alone
    cents = similarity.embedding_centroids(emb, dim=_IVF_DIM)
    timed("centroids", lambda: noop(cents))

    # stage 2: routing (nearest_centroid) on top of centroids
    def routed_df():
        c = similarity.embedding_centroids(emb, dim=_IVF_DIM)
        return similarity.nearest_centroid(emb, c).select("id", "vec", "cell")

    timed("centroids+routing", lambda: noop(routed_df()))

    # stage 3: pair join + cosine (no window) on top of routing
    def pairs_df():
        routed = routed_df()
        a, b = routed.alias("a"), routed.alias("b")
        return (
            a.join(b, "cell")
            .filter(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("lo"),
                F.col("b.id").alias("hi"),
                (
                    F.round(
                        similarity.cosine(F.col("a.vec"), F.col("b.vec")), 6
                    )
                    + F.lit(0.0)
                ).alias("cos_sim"),
            )
        )

    timed("centroids+routing+paircos", lambda: noop(pairs_df()))

    # stage 4: the full knn_graph (adds explode + top-k window)
    def full_graph():
        c = similarity.embedding_centroids(emb, dim=_IVF_DIM)
        return similarity.knn_graph(emb, c, k=_KNN_K)

    timed("full knn_graph", lambda: noop(full_graph()))

    # stage 5: graph + mutual edges
    timed(
        "graph+mutual",
        lambda: noop(similarity.mutual_knn_edges(full_graph())),
    )

    # stage 6: graph + pagerank fixpoint
    def pr():
        g = full_graph().select("src", "dst")
        nodes = emb.select(F.col("vec_id").alias("id"))
        return graph.pagerank(g, nodes, iterations=3)

    timed("graph+pagerank3", lambda: noop(pr()))

    spark.stop()


if __name__ == "__main__":
    main()
