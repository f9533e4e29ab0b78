"""Similarity search over embedding columns (array<float>).

Two paths, per the north-star contract:
- `cosine_topk`: brute-force cosine top-k — the exact baseline. All
  arithmetic is JVM-side higher-order functions (`zip_with` +
  `aggregate` folds, which evaluate left-to-right — deterministic and
  reproducible by the DuckDB oracle). The query side is broadcast so
  the big side streams: one pass over N x Q with no shuffle of the
  corpus.
- `label_blocked_pairs` / `lsh_bucket_topk`: the scale path — restrict
  comparisons to a coarse partition (IVF-style cell or random
  hyperplane LSH bucket) so the pairwise term drops from N^2 to
  sum(cell^2). Hyperplanes are derived deterministically from md5 so
  runs (and oracles) reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 4,
) -> DataFrame:
    """Exact top-k neighbors per query vector by cosine similarity.

    Plan shape: broadcast(queries) x corpus -> per-pair cosine ->
    window top-k on (query). Corpus never shuffles for the join; the
    only shuffle is the final per-query ranking, keyed by query id
    (cardinality = |queries|)."""
    from pyspark.sql.window import Window

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cvec"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qvec"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", round_digits).alias("cos_sim"))
    )


def label_blocked_pairs(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.9,
    round_digits: int = 4,
) -> DataFrame:
    """Near-duplicate vector pairs above a cosine threshold, compared
    only within a coarse block (IVF-cell-style). Equi-join on the block
    key keeps the pairwise blow-up bounded by the largest cell."""
    e = emb.select(
        F.col(block_col).alias("block"),
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, "block")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cos", cosine(F.col("a.v"), F.col("b.v")))
        .filter(F.col("cos") > threshold)
        .select(
            F.col("block"),
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round("cos", round_digits).alias("cos_sim"),
        )
    )


def rp_planes(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) =
    md5(f"{p}:{d}") scaled to [-0.5, 0.5). Plain constants, so both the
    operator and any SQL oracle can inline the identical matrix."""
    import hashlib

    return [
        [
            (int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[:8], 16) / 0xFFFFFFFF) - 0.5
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def rp_lsh_bucket(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Random-hyperplane LSH bucket id (sign pattern of dot products
    with `rp_planes` hyperplanes); deterministic across runs and
    engines. Appends `bucket` (long)."""
    planes = rp_planes(n_planes, dim)
    v = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(x) for x in planes[p]])
        dot = _dot(v, plane)
        bucket = bucket + F.when(dot > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
    return emb.withColumn("bucket", bucket)


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 6,
    dim: int = 64,
    round_digits: int = 4,
) -> DataFrame:
    """ANN top-k: compare a query only against corpus vectors in the
    same random-hyperplane bucket. Recall < 1 by construction; this is
    the scale path (equi-join on bucket instead of full cross)."""
    from pyspark.sql.window import Window

    cb = rp_lsh_bucket(corpus, vec_col=vec_col, n_planes=n_planes, dim=dim).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cvec"), "bucket"
    )
    qb = rp_lsh_bucket(queries, vec_col=vec_col, n_planes=n_planes, dim=dim).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qvec"), "bucket"
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos", round_digits).alias("cos_sim"))
    )
