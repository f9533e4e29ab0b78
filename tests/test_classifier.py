"""Naive-Bayes quality classifier (operators/classifier.py): exactness
against a hand-computed model, OOV handling, the explicit-prior path,
and the no-Python-UDF plan contract."""

import math

import pytest
from pyspark.sql import functions as F

from renkodf_spark.operators import classifier


def _toy(spark):
    rows = [
        (0, "good clean prose here", "src0"),
        (1, "good good prose", "src0"),
        (2, "spam spam spam junk", "src1"),
        (3, "junk here", "src1"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def _hand_model(rows):
    """Serial replay of the documented law: shared vocab, add-1
    smoothing, round-once micro-nat LLR."""
    pos, neg = {}, {}
    for _, text, src in rows:
        tgt = pos if src == "src0" else neg
        for t in text.split():
            tgt[t] = tgt.get(t, 0) + 1
    vocab = sorted(set(pos) | set(neg))
    tp, tn, v = sum(pos.values()), sum(neg.values()), len(vocab)
    return {
        t: round(
            (
                math.log((pos.get(t, 0) + 1) / (tp + v))
                - math.log((neg.get(t, 0) + 1) / (tn + v))
            )
            * 1e6
        )
        for t in vocab
    }


def test_nb_train_matches_hand_model(spark):
    df = _toy(spark)
    rows = [(r.doc_id, r.text, r.source) for r in df.collect()]
    want = _hand_model(rows)
    got = {
        r.term: r.llr_micros
        for r in classifier.nb_train(df, positive=F.col("source") == "src0").collect()
    }
    assert got == want
    # class counts are exact
    m = {
        r.term: (r.cnt_pos, r.cnt_neg)
        for r in classifier.nb_train(df, positive=F.col("source") == "src0").collect()
    }
    assert m["good"] == (3, 0)
    assert m["spam"] == (0, 3)
    assert m["here"] == (1, 1)


def test_nb_score_map_rule_and_prior(spark):
    df = _toy(spark)
    pos = F.col("source") == "src0"
    model = classifier.nb_train(df, positive=pos)
    scores = {r.doc_id: r for r in classifier.nb_score(df, model, positive=pos).collect()}
    # balanced classes -> prior ln(2/2)=0; target docs score positive,
    # spam docs negative under the hand model
    assert scores[0].predicted and scores[1].predicted
    assert not scores[2].predicted and not scores[3].predicted
    assert scores[2].n_tokens == 4
    # explicit-prior path reproduces the labeled-frame path exactly
    explicit = {
        r.doc_id: r.score_micros
        for r in classifier.nb_score(df, model, prior_micros=0).collect()
    }
    assert explicit == {k: v.score_micros for k, v in scores.items()}


def test_nb_score_oov_contributes_zero(spark):
    df = _toy(spark)
    pos = F.col("source") == "src0"
    model = classifier.nb_train(df, positive=pos)
    unseen = spark.createDataFrame(
        [(9, "zzz zzz good")], "doc_id long, text string"
    )
    (row,) = classifier.nb_score(unseen, model, prior_micros=0).collect()
    want = {r.term: r.llr_micros for r in model.collect()}["good"]
    assert row.n_tokens == 3  # OOV tokens still counted
    assert row.score_micros == want  # but contribute 0 to the score


def test_nb_eval_confusion(spark):
    df = _toy(spark)
    pos = F.col("source") == "src0"
    model = classifier.nb_train(df, positive=pos)
    scores = classifier.nb_score(df, model, positive=pos)
    conf = {
        (r.is_target, r.predicted): r.n_docs
        for r in classifier.nb_eval(df, scores, positive=pos).collect()
    }
    assert conf == {(True, True): 2, (False, False): 2}


def test_nb_argument_contracts(spark):
    df = _toy(spark)
    pos = F.col("source") == "src0"
    with pytest.raises(ValueError, match="alpha"):
        classifier.nb_train(df, positive=pos, alpha=0)
    model = classifier.nb_train(df, positive=pos)
    with pytest.raises(ValueError, match="exactly one"):
        classifier.nb_score(df, model)
    with pytest.raises(ValueError, match="exactly one"):
        classifier.nb_score(df, model, positive=pos, prior_micros=0)


def test_nb_plan_no_python_udf(spark):
    """The whole train->score->eval DAG stays in Catalyst column
    expressions (the standing relational-surface contract)."""
    df = _toy(spark)
    pos = F.col("source") == "src0"
    model = classifier.nb_train(df, positive=pos)
    scores = classifier.nb_score(df, model, positive=pos)
    plan = classifier.nb_eval(df, scores, positive=pos)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
