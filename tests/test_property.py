"""Property-based differential testing (hypothesis): for arbitrary
price paths — including grid-exact prices, multi-brick gaps, and
immediate reversals — the kernel must equal the reference bit-for-bit,
and the incremental replay must equal the batch run on every wide
column (the reference's own equivalence contract)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from hypothesis import assume, given, settings
from hypothesis import strategies as st

from renkodf_spark.kernel import WIDE_VALUE_COLUMNS, new_output, new_state, scan_ticks
from renkodf_spark.operators.renko import renko_pandas

price_moves = st.lists(
    st.one_of(
        st.floats(min_value=-0.9, max_value=0.9, allow_nan=False),  # sub-brick noise
        st.sampled_from([1.0, -1.0, 2.5, -2.5, 7.0, -7.0, 0.0]),    # grid-exact + gaps
    ),
    min_size=2,
    max_size=300,
)


def _frame(moves):
    prices = 100.0 + np.cumsum(np.asarray(moves, dtype=np.float64))
    times = pd.date_range("2024-01-01", periods=len(prices), freq="1s").astype("datetime64[us]")
    return pd.DataFrame({"datetime": times, "close": prices}, index=times)


@settings(max_examples=40, deadline=None)
@given(price_moves)
def test_kernel_matches_reference(reference_renko, moves):
    ticks = _frame(moves)
    try:
        ref = reference_renko.Renko(ticks.copy(), 1.0, divide_by=1)
        ref_wicks = ref.renko_df("wicks")
    except IndexError:
        # the reference's own defects (characterized, deliberately not
        # inherited): array overflow when bricks > ticks/divide_by
        # (SURVEY O-6) and label-drop on an empty brick table. Our
        # engine handles these; covered by test_kernel_golden.
        assume(False)
        return
    ours = renko_pandas(ticks.rename(columns={"datetime": "event_time"}), 1.0)
    assert len(ours) == len(ref_wicks)
    for col in ["open", "high", "low", "close", "volume", "direction", "is_reversal"]:
        np.testing.assert_array_equal(ours[col].to_numpy(), ref_wicks[col].to_numpy(), err_msg=col)


@settings(max_examples=40, deadline=None)
@given(price_moves)
def test_incremental_equals_batch(moves):
    """Replaying tick-by-tick through the kernel (streaming path) equals
    one batch scan — for every wide column including mode variants."""
    prices = (100.0 + np.cumsum(np.asarray(moves, dtype=np.float64))).tolist()
    times = list(range(len(prices)))

    batch_state = new_state(prices[0], 1.0)
    batch_out = new_output()
    scan_ticks(times, prices, 1, 1.0, batch_state, batch_out)

    inc_state = new_state(prices[0], 1.0)
    inc_out = new_output()
    for i in range(1, len(prices)):
        scan_ticks(times, prices, i, 1.0, inc_state, inc_out, stop=i + 1)

    assert batch_state == inc_state
    for col in ("event_time", *WIDE_VALUE_COLUMNS):
        assert list(batch_out[col]) == list(inc_out[col]), col


@settings(max_examples=30, deadline=None)
@given(price_moves, st.integers(min_value=1, max_value=8), st.randoms(use_true_random=False))
def test_random_batch_splits_equal_batch(moves, n_splits, rnd):
    """Replaying through the kernel in ARBITRARY batch splits (the
    streaming/chunked generalization of per-tick replay) equals one
    batch scan, for any split points."""
    prices = (100.0 + np.cumsum(np.asarray(moves, dtype=np.float64))).tolist()
    times = list(range(len(prices)))
    n = len(prices)

    batch_state = new_state(prices[0], 1.0)
    batch_out = new_output()
    scan_ticks(times, prices, 1, 1.0, batch_state, batch_out)

    cuts = sorted({1, n} | {rnd.randrange(1, n) for _ in range(n_splits)})
    split_state = new_state(prices[0], 1.0)
    split_out = new_output()
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        scan_ticks(times, prices, lo, 1.0, split_state, split_out, stop=hi)
    if cuts[-1] < n:
        scan_ticks(times, prices, cuts[-1], 1.0, split_state, split_out)

    assert batch_state == split_state
    for col in ("event_time", *WIDE_VALUE_COLUMNS):
        assert list(batch_out[col]) == list(split_out[col]), col


# ---------------------------------------- bigram Stupid-Backoff LM


def _py_bigram_reference(train_texts, score_rows, alpha=1):
    """Pure-Python replay of bigram_lm_train + bigram_logprob: the
    independent arithmetic the distributed implementation must match
    bit-for-bit (integer micro-nats; HALF_UP via decimal)."""
    import decimal
    import math
    from collections import Counter

    def half_up(x):
        # Decimal(repr(.)) mirrors Spark's round(): BigDecimal.valueOf
        # goes through the double's SHORTEST decimal repr, while
        # Decimal(float) takes the exact binary expansion — on
        # repr-boundary values the two can round differently (ADVICE r11)
        return int(
            decimal.Decimal(repr(x * 1e6)).quantize(
                0, rounding=decimal.ROUND_HALF_UP
            )
        )

    def toks(t):
        import re

        return re.split(r"\s+", t.strip())

    uni = Counter()
    bi = Counter()
    for t in train_texts:
        ws = toks(t)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    T, V = sum(uni.values()), len(uni)
    lp = {w: half_up(math.log((c + alpha) / (T + alpha * V))) for w, c in uni.items()}
    oov = half_up(math.log(alpha / (T + alpha * V)))
    tr = {p: half_up(math.log(c / uni[p[0]])) for p, c in bi.items()}
    bk = half_up(math.log(0.4))
    out = {}
    for doc_id, t in score_rows:
        ws = toks(t)
        s = lp.get(ws[0], oov)
        for a, b in zip(ws, ws[1:]):
            s += tr.get((a, b), bk + lp.get(b, oov))
        out[doc_id] = (len(ws), s)
    return out


words = st.sampled_from(["a", "b", "c", "dd", "eee", "zz"])
texts = st.lists(words, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(texts, min_size=1, max_size=6),
    st.lists(texts, min_size=1, max_size=6),
)
def test_bigram_lm_matches_python_reference(spark, train_texts, score_texts):
    """Distributed bigram LM == pure-Python reference, bit-for-bit, on
    arbitrary tiny corpora: seen-transition, backoff, and OOV branches
    all land on the same integer micro-nats."""
    from renkodf_spark.operators import text as text_ops

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)], "doc_id long, text string"
    )
    score_rows = [(100 + i, t) for i, t in enumerate(score_texts)]
    score = spark.createDataFrame(score_rows, "doc_id long, text string")
    model = text_ops.bigram_lm_train(train)
    got = {
        r.doc_id: (r.n_tokens, r.sum_logp_micros)
        for r in text_ops.bigram_logprob(score, model).collect()
    }
    assert got == _py_bigram_reference(train_texts, score_rows)


@settings(max_examples=10, deadline=None)
@given(
    st.integers(min_value=1, max_value=60),
    st.lists(
        st.tuples(st.integers(0, 59), st.integers(0, 59)), max_size=80
    ),
)
def test_cluster_labels_matches_union_find(spark, n, raw_pairs):
    """Property pin for the r12 large-star/small-star rewrite: on
    arbitrary small graphs (self-loops, duplicates, isolated nodes,
    chains — whatever hypothesis builds) cluster_labels must equal a
    pure-Python union-find's min-reachable-id labeling exactly."""
    from renkodf_spark.operators import dedup

    pairs = [(a % n, b % n) for a, b in raw_pairs]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {(i, find(i)) for i in range(n)}

    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    pdf = (
        spark.createDataFrame(pairs, "id_a long, id_b long")
        if pairs
        else spark.createDataFrame([], "id_a long, id_b long")
    )
    labels = dedup.cluster_labels(ids, pdf, max_rounds=20, on_nonconverge="raise")
    assert {(r.id, r.cluster_id) for r in labels.collect()} == expected


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.sampled_from("ab cd ef gh ij kl".split()), min_size=0, max_size=40),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=1, max_value=5),
)
def test_winnow_matches_python_reference(spark, words, k, w):
    """Winnowing property pin (r12): on arbitrary token sequences and
    (k, window) settings the Spark selection equals a direct
    pure-Python implementation of robust winnowing — same md5-prefix
    hashes, same window minima, same rightmost tie-break, same
    short-doc emptiness."""
    import hashlib

    from renkodf_spark.operators import text as text_ops

    text = " ".join(words)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = {
        (r.pos, r.fp)
        for r in text_ops.winnow_fingerprints(docs, k=k, window=w).collect()
    }

    # the repo-wide tokenization convention is REGEXP split: on empty
    # text re.split/Spark split/DuckDB string_split_regex all yield
    # [''] (one empty token), unlike str.split() which yields []
    import re as _re

    toks = _re.split(r"\s+", text.strip())
    want = set()
    if len(toks) >= k:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams]
        for j in range(w - 1, len(hs)):
            lo = j - w + 1
            mh = min(hs[lo : j + 1])
            pos = max(i for i in range(lo, j + 1) if hs[i] == mh)
            want.add((pos, mh))
    assert got == want
