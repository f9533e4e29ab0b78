"""Model-based quality filtering: a distributed Naive-Bayes document
classifier, the oracle-exact stand-in for the fastText "looks like the
target domain" filters used by the GPT-3 / LLaMA / CCNet data
pipelines (Brown et al. 2020 §A; Touvron et al. 2023 §2; Wenzek et al.
2020 §4.3).  Those pipelines train a linear classifier whose positive
class is a trusted corpus (WebText / Wikipedia-references) and keep
documents the classifier scores highly.  A multinomial Naive-Bayes
model is the counting-only member of that family: training is two
aggregations and scoring is one join, so the whole pipeline stays in
Catalyst column expressions with no Python UDF and is exactly
replayable in DuckDB.

Cross-engine exactness follows the ``unigram_logprob`` convention
(``operators/text.py:407``): the per-term log-likelihood-ratio is
rounded ONCE to integer micro-nats and every downstream aggregate is
exact long arithmetic, so distributed sums hash-match a serial replay
regardless of re-association.

Scale shape (the 100 TB lens): document text never enters an exchange.
Training shuffles only ``(term, tf-partials)`` pairs — map-side
combined, keyed by term, bounded by vocabulary, not corpus size.  The
class totals come back as ONE broadcast row.  Scoring joins the
``(doc, term, tf)`` relation with the vocabulary-bounded model on the
term key (broadcastable when the vocab fits, an equi-shuffle of narrow
rows when it does not) and reduces per doc.  No window over all docs,
no driver state, no step whose cost grows faster than corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["nb_train", "nb_score", "nb_eval"]


def nb_train(
    df: DataFrame,
    *,
    positive: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: int = 1,
) -> DataFrame:
    """Train the multinomial NB model: one row per vocabulary term with
    its class counts and the integer micro-nat log-likelihood ratio

        llr(t) = ln((cnt_pos + a) / (T_pos + a*V))
               - ln((cnt_neg + a) / (T_neg + a*V))

    with ``T_c`` the class token totals and ``V`` the joint vocabulary
    size (add-``alpha`` smoothing over the SHARED vocab, so a term seen
    only in one class still gets a finite ratio).  ``positive`` is any
    boolean Column over ``df`` defining the target class (e.g.
    ``F.col("source") == "src0"`` — the "trusted domain" of the CCNet
    recipe).  Tokenization is the whitespace convention shared with
    ``unigram_logprob``.

    Output: ``(term, cnt_pos, cnt_neg, llr_micros)``.

    Both classes must be non-empty; the prior ``ln(N_pos / N_neg)`` is
    derived by :func:`nb_score` from the same labeled frame.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    pairs = df.select(
        positive.alias("__pos"), F.explode(toks).alias("term")
    )
    counts = pairs.groupBy("term").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0)).cast("long").alias("cnt_pos"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1)).cast("long").alias("cnt_neg"),
    )
    totals = counts.agg(
        F.sum("cnt_pos").alias("__Tp"),
        F.sum("cnt_neg").alias("__Tn"),
        F.count(F.lit(1)).alias("__V"),
    )
    llr = F.round(
        (
            F.log((F.col("cnt_pos") + alpha) / (F.col("__Tp") + alpha * F.col("__V")))
            - F.log((F.col("cnt_neg") + alpha) / (F.col("__Tn") + alpha * F.col("__V")))
        )
        * 1e6
    ).cast("long")
    return counts.crossJoin(F.broadcast(totals)).select(
        "term", "cnt_pos", "cnt_neg", llr.alias("llr_micros")
    )


def nb_score(
    df: DataFrame,
    model: DataFrame,
    *,
    positive: Column | None = None,
    prior_micros: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents under a trained model:

        score(d) = prior + sum_t tf(d, t) * llr(t)

    carried entirely in integer micro-nats.  The class prior
    ``round(ln(N_pos / N_neg) * 1e6)`` is computed from the labeled
    frame when ``positive`` is given (the train-on-self gate shape), or
    passed explicitly via ``prior_micros`` for scoring an unlabeled
    corpus under a shipped model.  Out-of-vocabulary terms contribute 0
    (the standard NB deployment simplification — both smoothed class
    probabilities collapse to ``a / (T_c + a*V)`` whose ratio is near 1
    for balanced totals); the left join + coalesce keeps every doc in
    the output with its full token count.

    Output: ``(id_col, n_tokens, score_micros, predicted)`` with
    ``predicted = score_micros > 0`` — the maximum-a-posteriori rule.
    """
    if (positive is None) == (prior_micros is None):
        raise ValueError("pass exactly one of positive= or prior_micros=")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if positive is not None:
        prior = df.agg(
            F.round(
                F.log(
                    F.sum(F.when(positive, 1).otherwise(0)).cast("double")
                    / F.sum(F.when(positive, 0).otherwise(1)).cast("double")
                )
                * 1e6
            )
            .cast("long")
            .alias("__prior")
        )
    else:
        prior = df.sparkSession.range(1).select(
            F.lit(int(prior_micros)).cast("long").alias("__prior")
        )
    return (
        tf.join(model.select("term", "llr_micros"), "term", "left")
        .groupBy("id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.coalesce(F.col("llr_micros"), F.lit(0)))
            .cast("long")
            .alias("__sum"),
        )
        .crossJoin(F.broadcast(prior))
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            (F.col("__sum") + F.col("__prior")).alias("score_micros"),
            (F.col("__sum") + F.col("__prior") > 0).alias("predicted"),
        )
    )


def nb_eval(
    df: DataFrame,
    scores: DataFrame,
    *,
    positive: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Confusion matrix of the classifier against the labeling rule:
    ``(is_target, predicted, n_docs)`` — at most 4 rows, the bounded
    relation precision/recall/F1 derive from.  Train-on-self accuracy
    against the deterministic proxy label is the gate's correctness
    check, not a generalization claim.
    """
    labeled = df.select(F.col(id_col).alias("id"), positive.alias("is_target"))
    return (
        labeled.join(scores.select(F.col(id_col).alias("id"), "predicted"), "id")
        .groupBy("is_target", "predicted")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
