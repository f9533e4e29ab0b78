"""Round-13 pipeline queries: the SIGNED-domain quantile sketch
(``functions/quantiles.py`` mirrored negative octaves — the sketch can
now summarize the engine's own negative integer micro-nat quality
scores), and persisted-graph centrality (PageRank over a stored
kNN-graph relation instead of rebuilding the graph from raw vectors
inside every centrality question).

Oracle strategy: the signed bucket/floor arithmetic is pure shifts and
integer division, replayed verbatim in DuckDB over the same
``_BG_CTES`` score relation the bigram-LM oracles already pin — the
whole chain (train -> score -> sketch -> quantile) is integer-exact
end to end, so the oracle hash-matches every bucket and estimate.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from renkodf_spark.functions import quantiles as qsk
from renkodf_spark.operators import text
from renkodf_spark.queries.pipeline import _docs
from renkodf_spark.queries.pipeline8 import _BG_CTES, _bigram_model
from renkodf_spark.queries.registry import query

_QK = 64
_QB = 6
_SGN_QS = [(1, 20), (1, 2), (19, 20)]

_GRAPH_STATE_DIR: list[str] = []


def _graph_state_path() -> str:
    """One kNN-graph state dir per process, rmtree'd at exit (ADVICE
    r13: per-invocation mkdtemp accumulated a full graph copy in /tmp
    for every indexed-centrality call across sweep/bench runs). Safe to
    share: each indexed query rewrites the graph before reading it, and
    write_knn_graph's static ``overwrite`` truncates the whole path —
    no stale cells can leak between scale factors."""
    if not _GRAPH_STATE_DIR:
        import atexit
        import shutil
        import tempfile

        path = tempfile.mkdtemp(prefix="knn_graph_state_")
        atexit.register(shutil.rmtree, path, ignore_errors=True)
        _GRAPH_STATE_DIR.append(path)
    return _GRAPH_STATE_DIR[0]


def _m_pos_sql(u: str) -> str:
    """DuckDB sub-bucket of a strictly positive BIGINT expression —
    the _QSK_CTES shift pattern, parameterized on the expression."""
    return f"""CASE WHEN length(bin({u})) - 1 >= {_QB}
        THEN ({u} - (CAST(1 AS BIGINT) << (length(bin({u})) - 1))) >> (length(bin({u})) - 1 - {_QB})
        ELSE (({u} - (CAST(1 AS BIGINT) << (length(bin({u})) - 1))) << {_QB})
             // (CAST(1 AS BIGINT) << (length(bin({u})) - 1)) END"""


def _signed_bucket_sql(v: str) -> tuple[str, str]:
    """DuckDB (e, m) for a SIGNED BIGINT expression — mirrors
    functions/quantiles.bucket_exprs: zero -> (-1, 0), positives the
    classical octaves, negatives the mirrored octaves e <= -2 with
    m = k-1 - m(-v) so (e, m) order == value order."""
    e = f"""CASE WHEN {v} = 0 THEN -1
        WHEN {v} < 0 THEN -(length(bin(-({v}))) - 1) - 2
        ELSE length(bin({v})) - 1 END"""
    m = f"""CASE WHEN {v} = 0 THEN CAST(0 AS BIGINT)
        WHEN {v} < 0 THEN {_QK - 1} - ({_m_pos_sql(f'(-({v}))')})
        ELSE {_m_pos_sql(v)} END"""
    return e, m


# bucket floor from (e, m), signed — mirrors bucket_floor_expr: the
# most-negative member of a mirrored bucket is 1 - hi_u with hi_u the
# EXCLUSIVE bound of the mirrored positive bucket (eu=-e-2, mu=k-1-m);
# (k - m) * 2^eu is exactly divisible by k when eu >= b. Reassociated
# as (1 - p) - tail (ADVICE r13): the naive 1 - hi_u forms 2^63 on the
# extreme octave (e=-64, m=0) and errors in DuckDB; this chain keeps
# every intermediate in BIGINT, matching the Spark side exactly.
_SIGNED_FLOOR_SQL = f"""CASE WHEN e = -1 THEN CAST(0 AS BIGINT)
    WHEN e < -1 THEN (CASE WHEN (-e - 2) >= {_QB}
         THEN (1 - (CAST(1 AS BIGINT) << (-e - 2)))
              - ({_QK} - m) * (CAST(1 AS BIGINT) << (-e - 2 - {_QB}))
         ELSE (1 - (CAST(1 AS BIGINT) << (-e - 2)))
              - ((({_QK} - m) * (CAST(1 AS BIGINT) << (-e - 2)) + {_QK - 1}) >> {_QB}) END)
    WHEN e >= {_QB} THEN (CAST(1 AS BIGINT) << e) + m * (CAST(1 AS BIGINT) << (e - {_QB}))
    ELSE (CAST(1 AS BIGINT) << e)
         + ((m * (CAST(1 AS BIGINT) << e) + {_QK - 1}) >> {_QB}) END"""

_SGN_E, _SGN_M = _signed_bucket_sql("v")

_SGN_CTES = (
    _BG_CTES
    + rf""",
sv AS (
  SELECT d.lang AS g, s.s AS v
  FROM scores s JOIN documents d USING (doc_id)),
sbk AS (SELECT g, v, {_SGN_E} AS e, {_SGN_M} AS m FROM sv),
ssk AS (SELECT g, e, m, CAST(COUNT(*) AS BIGINT) AS cnt FROM sbk GROUP BY 1, 2, 3),
scum AS (
  SELECT g, e, m, cnt,
         SUM(cnt) OVER (PARTITION BY g ORDER BY e, m) AS cum,
         SUM(cnt) OVER (PARTITION BY g) AS n
  FROM ssk),
sqs AS (SELECT * FROM (VALUES (1, 20, 50), (1, 2, 500), (19, 20, 950)) t(qn, qd, qp)),
ssel AS (
  SELECT g, qp, n, (qn * n + qd - 1) // qd AS r, e, m,
         ROW_NUMBER() OVER (PARTITION BY g, qp ORDER BY e, m) AS rk
  FROM scum CROSS JOIN sqs
  WHERE cum >= (qn * n + qd - 1) // qd),
sest AS (
  SELECT g, qp, n, r, e, m, {_SIGNED_FLOOR_SQL} AS est
  FROM ssel WHERE rk = 1),
sranked AS (
  SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rk FROM sv),
sexact AS (SELECT e2.g, e2.qp, r2.v AS v_star FROM sest e2 JOIN sranked r2
           ON r2.g = e2.g AND r2.rk = e2.r),
sxb AS (
  SELECT g, qp, {_signed_bucket_sql("v_star")[0]} AS xe,
         {_signed_bucket_sql("v_star")[1]} AS xm
  FROM sexact)
"""
)


@query(
    "signed_lm_score_quantiles",
    oracle=_SGN_CTES
    + """
SELECT sest.g AS lang, sest.qp AS q_permille,
       CAST(sest.n AS BIGINT) AS n, CAST(sest.r AS BIGINT) AS r, sest.est,
       (sest.e = sxb.xe AND sest.m = sxb.xm) AS bucket_contains_exact
FROM sest JOIN sxb ON sxb.g = sest.g AND sxb.qp = sest.qp
""",
    doc="SIGNED quantile sketch (r13 mirrored negative octaves) over "
    "the engine's own negative quality scores: per-language p05/p50/"
    "p95 of the bigram Stupid-Backoff doc log-probs (integer "
    "micro-nats, all < 0) read off the log-linear sketch — value "
    "domain the pre-r13 sketch rejected. est is the most-negative "
    "member of the selected bucket; bucket_contains_exact recomputes "
    "the exact rank-r score's bucket independently on both engines "
    "(the full sort is the oracle device — the sketch answers from "
    "(g, e, m, cnt) alone). At 100 TB the score relation is (id, "
    "long); the sketch collapses it to a few hundred rows per "
    "language with one map-side-combined shuffle.",
)
def signed_lm_score_quantiles(spark, sf_dir):
    docs, model = _bigram_model(spark, sf_dir)
    scores = text.bigram_logprob(docs, model)
    scored = scores.join(docs.select("doc_id", "lang"), "doc_id").select(
        F.col("lang"), F.col("sum_logp_micros").alias("v")
    )
    sk = qsk.quantile_sketch(scored, "lang", "v", k=_QK)
    est = qsk.sketch_quantiles(sk, "lang", _SGN_QS, k=_QK)
    ranked = scored.withColumn(
        "rk", F.row_number().over(Window.partitionBy("lang").orderBy("v"))
    )
    xe, xm = qsk.bucket_exprs("v", _QK)
    xb = (
        est.select("lang", "q_permille", "r")
        .join(ranked, ["lang"])
        .filter(F.col("rk") == F.col("r"))
        .select("lang", "q_permille", xe.alias("xe"), xm.alias("xm"))
    )
    return est.join(xb, ["lang", "q_permille"]).select(
        "lang",
        "q_permille",
        "n",
        "r",
        "est",
        ((F.col("e") == F.col("xe")) & (F.col("m") == F.col("xm"))).alias(
            "bucket_contains_exact"
        ),
    )


# ------------------------------------- persisted-graph centrality

from renkodf_spark.operators import graph, similarity  # noqa: E402
from renkodf_spark.queries.pipeline import _emb  # noqa: E402
from renkodf_spark.queries.pipeline2 import _IVF_DIM  # noqa: E402
from renkodf_spark.queries.pipeline8 import _KNN_K  # noqa: E402
from renkodf_spark.queries.pipeline9 import (  # noqa: E402
    _PR_DDEN,
    _PR_DNUM,
    _PR_ITERS,
    _PR_SCALE,
    _pr_oracle,
)


@query(
    "knn_pagerank_indexed",
    oracle=_pr_oracle(),
    doc="fixed-point integer PageRank over the PERSISTED kNN graph "
    "(r13): similarity.write_knn_graph stores the edge relation once "
    "per corpus snapshot (the streaming maintainer's edges/cell=... "
    "layout), and the fixpoint reads back only (src, dst) longs — "
    "same oracle as knn_pagerank because stored == inline edges "
    "(parity-pinned). Why it exists at scale: the inline query pays "
    "routing + the sum(|cell|^2) pair stage inside EVERY centrality "
    "question (~2/3 of its wall); against a 100 TB corpus snapshot "
    "asked N centrality questions, the build is paid once and each "
    "question costs only the narrow-edge fixpoint — embeddings never "
    "load again (the stored layout has no vector column at all).",
)
def knn_pagerank_indexed(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = similarity.embedding_centroids(emb, dim=_IVF_DIM)
    path = _graph_state_path()
    similarity.write_knn_graph(emb, cents, path, k=_KNN_K)
    edges = similarity.read_knn_graph(spark, path)
    nodes = emb.select(F.col("vec_id").alias("id"))
    pr = graph.pagerank(
        edges.select("src", "dst"),
        nodes,
        iterations=_PR_ITERS,
        d_num=_PR_DNUM,
        d_den=_PR_DDEN,
        scale=_PR_SCALE,
    )
    return pr.select(F.col("id").alias("vec_id"), "pr")


# ------------------------------------------- LPA communities

from renkodf_spark.queries.pipeline8 import _KNN_CTES  # noqa: E402

_LPA_ITERS = 4


def _lpa_oracle() -> str:
    head = (
        _KNN_CTES
        + f""",
mutual AS (
  SELECT a.src AS id_a, a.dst AS id_b
  FROM (SELECT src, dst FROM knn WHERE rk <= {_KNN_K}) a
  JOIN (SELECT src, dst FROM knn WHERE rk <= {_KNN_K}) b
    ON a.src = b.dst AND a.dst = b.src
  WHERE a.src < a.dst),
uedges AS (
  SELECT id_a AS s, id_b AS d FROM mutual
  UNION
  SELECT id_b AS s, id_a AS d FROM mutual),
l0 AS (SELECT vec_id AS id, vec_id AS lbl FROM embeddings)"""
    )
    iters = "".join(
        f""",
v{t} AS (
  SELECT e.d AS id, l.lbl, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM uedges e JOIN l{t - 1} l ON l.id = e.s GROUP BY 1, 2),
w{t} AS (
  SELECT id, lbl,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, lbl) AS rk
  FROM v{t}),
l{t} AS (
  SELECT p.id, COALESCE(w.lbl, p.lbl) AS lbl
  FROM l{t - 1} p LEFT JOIN (SELECT id, lbl FROM w{t} WHERE rk = 1) w USING (id))"""
        for t in range(1, _LPA_ITERS + 1)
    )
    return head + iters + f"\nSELECT id AS vec_id, lbl AS community FROM l{_LPA_ITERS}"


@query(
    "knn_communities",
    oracle=_lpa_oracle(),
    doc=f"deterministic synchronous label propagation ({_LPA_ITERS} "
    "iterations, argmax-by-count ties to smallest label) over the "
    "mutual-kNN graph — community detection one level FINER than "
    "mutual_knn_cluster_labels' connected components: two dense "
    "template families joined by one accidental near-pair stay "
    "separate communities (CC merges them). Classical LPA is "
    "randomized and never replays; this variant's fixed-iteration "
    "integer votes are bit-identical on both engines. Iteration state "
    "is (id, label) longs — one edge equi-join + one (id, label) "
    "count + one per-id argmax per step; vectors cross only the kNN "
    "cell exchange.",
)
def knn_communities(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = similarity.embedding_centroids(emb, dim=_IVF_DIM)
    g = similarity.knn_graph(emb, cents, k=_KNN_K)
    pairs = similarity.mutual_knn_edges(g)
    und = pairs.selectExpr("id_a as src", "id_b as dst").unionByName(
        pairs.selectExpr("id_b as src", "id_a as dst")
    )
    return graph.label_propagation(
        und,
        emb.select(F.col("vec_id").alias("id")),
        iterations=_LPA_ITERS,
    ).selectExpr("id as vec_id", "community")


from renkodf_spark.queries.pipeline9 import (  # noqa: E402
    _TR_SEED_LABEL,
    _trustrank_oracle,
)


@query(
    "knn_trustrank_indexed",
    oracle=_trustrank_oracle(),
    doc="TrustRank over the PERSISTED kNN graph (r13): same stored "
    "edge relation as knn_pagerank_indexed — one write_knn_graph "
    "snapshot serves every centrality question (PageRank, TrustRank, "
    "and any future seed set) without reloading vectors; the seeded "
    "fixpoint reads only (src, dst) longs plus the broadcast seed "
    "ids. Same oracle as knn_trustrank (stored == inline edges).",
)
def knn_trustrank_indexed(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cents = similarity.embedding_centroids(emb, dim=_IVF_DIM)
    path = _graph_state_path()
    similarity.write_knn_graph(emb, cents, path, k=_KNN_K)
    edges = similarity.read_knn_graph(spark, path)
    nodes = emb.select(F.col("vec_id").alias("id"))
    seeds = emb.filter(F.col("label") == _TR_SEED_LABEL).select(
        F.col("vec_id").alias("id")
    )
    pr = graph.pagerank(
        edges.select("src", "dst"),
        nodes,
        iterations=_PR_ITERS,
        d_num=_PR_DNUM,
        d_den=_PR_DDEN,
        scale=_PR_SCALE,
        seeds=seeds,
    )
    return pr.select(F.col("id").alias("vec_id"), "pr")
