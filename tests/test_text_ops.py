

# --------------------------------------------------------- BPE training


def test_bpe_merges_hand_computed(spark):
    """aaab x3 + ab x2: pair counts round 1 are (a,a)=6, (a,b)=5 ->
    merge aa; round 2: (aa,a)=3, (aa,b)=0... wait aaab = [aa, a, b]
    -> pairs (aa,a)=3, (a,b)=5 -> merge ab; round 3 (aa,ab)=3."""
    from renkodf_spark.operators.text import bpe_merges

    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "aaab ab"), (3, "ab")], "doc_id long, text string"
    )
    out = [tuple(r) for r in bpe_merges(docs, k=3).collect()]
    # histogram: aaab x3, ab x2
    # r1: (a,a)=6 beats (a,b)=5 -> aa ; aaab=[aa,a,b]
    # r2: (a,b)=3+2=5 beats (aa,a)=3 -> ab ; aaab=[aa,ab], ab=[ab]
    # r3: (aa,ab)=3
    assert out == [
        (1, "a", "a", "aa", 6),
        (2, "a", "b", "ab", 5),
        (3, "aa", "ab", "aaab", 3),
    ]


def test_bpe_merge_application_left_to_right(spark):
    """'aaa' under merge (a,a) must give [aa, a] (non-overlapping,
    left-to-right), never [a, aa]."""
    from pyspark.sql import functions as F

    from renkodf_spark.operators.text import _bpe_apply_merge

    df = spark.createDataFrame([(["a", "a", "a"],)], "syms array<string>")
    got = df.select(_bpe_apply_merge(F.col("syms"), "a", "a").alias("m")).collect()[0]["m"]
    assert got == ["aa", "a"]


def test_bpe_tie_break_is_lexicographic(spark):
    from renkodf_spark.operators.text import bpe_merges

    docs = spark.createDataFrame([(1, "xy xy zw zw")], "doc_id long, text string")
    out = [tuple(r) for r in bpe_merges(docs, k=1).collect()]
    # (x,y)=2 and (z,w)=2 tie -> smallest (left, right) wins
    assert out == [(1, "x", "y", "xy", 2)]


def test_bpe_stops_when_pairs_exhaust(spark):
    from renkodf_spark.operators.text import bpe_merges

    docs = spark.createDataFrame([(1, "ab ab cd")], "doc_id long, text string")
    out = [tuple(r) for r in bpe_merges(docs, k=5).collect()]
    # after merging (a,b) no pair repeats (cd's (c,d) has count 1)
    assert out == [(1, "a", "b", "ab", 2)]


def test_bpe_encode_hand_computed(spark):
    from renkodf_spark.operators.text import bpe_encode

    docs = spark.createDataFrame([(1, "aaab ab c")], "doc_id long, text string")
    out = bpe_encode(docs, [("a", "a"), ("a", "b")]).collect()[0]
    # aaab -> [aa, ab]; ab -> [ab]; c -> [c]  => 3 words, 4 subwords
    assert (out["n_words"], out["n_subwords"]) == (3, 4)


def test_bpe_encode_is_zero_shuffle(spark, sf_dir):
    """The K rules are a driver constant baked into one expression —
    encoding must be a pure map stage: no Exchange, no Python nodes."""
    from renkodf_spark.operators.text import bpe_encode
    from renkodf_spark.plans import assert_jvm_only
    from renkodf_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = bpe_encode(docs, [("t", "h"), ("th", "e")])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert_jvm_only(df, "bpe_encode")


def test_bpe_batched_is_sequential_prefix_on_corpus(spark, sf_dir):
    """Batched election (VERDICT r8 item 6): symbol-disjoint prefix
    batching never reorders or invents rules relative to sequential
    election on this corpus — the batched output IS a prefix of the
    sequential rules (conflicts cut rounds short rather than diverge),
    and batch_m=1 reproduces sequential exactly."""
    from renkodf_spark.operators.text import bpe_merges
    from renkodf_spark.queries.pipeline import _docs

    docs = _docs(spark, sf_dir)
    seq = [tuple(r) for r in bpe_merges(docs, k=8).collect()]
    for m in (1, 4):
        got = [tuple(r) for r in bpe_merges(docs, k=8, batch_m=m).collect()]
        assert got == seq[: len(got)], (m, got, seq)
        assert len(got) >= 8 // (2 if m > 1 else 1) // 2  # batches make progress
    assert [tuple(r) for r in bpe_merges(docs, k=8, batch_m=1).collect()] == seq


def test_bpe_batched_k64_fill_and_divergence_shape(spark, sf_dir):
    """Realistic-vocab batching (VERDICT r9 item 5), pinned at k=64:

    - fill=True learns exactly k rules and the fixed-round run's output
      is a PREFIX of the same-batch_m fill run (same election, more
      rounds);
    - wherever the batched list diverges from sequential election, the
      divergence is the DOCUMENTED created-pair overtake and nothing
      else: sequential's pick at the divergence point is built from a
      symbol the batched run had already merged, and the batched pick
      did not outrank it on count (ties broken by string order are the
      boundary case). A divergence of any other shape is a bug."""
    from renkodf_spark.operators.text import bpe_merges
    from renkodf_spark.queries.pipeline import _docs

    docs = _docs(spark, sf_dir)
    seq = [tuple(r) for r in bpe_merges(docs, k=64).collect()]
    assert len(seq) == 64
    for m in (8, 16):
        fixed = [tuple(r) for r in bpe_merges(docs, k=64, batch_m=m).collect()]
        filled = [tuple(r) for r in bpe_merges(docs, k=64, batch_m=m, fill=True).collect()]
        assert len(filled) == 64 and filled[: len(fixed)] == fixed, (m, len(fixed))
        lcp = next(
            (i for i, (a, b) in enumerate(zip(filled, seq)) if a != b), len(filled)
        )
        assert lcp >= 8, (m, lcp)  # batching tracks sequential deep into the list
        if lcp < len(filled):
            # (rank, left, right, merged, count)
            _, s_left, s_right, _, s_cnt = seq[lcp]
            _, _, _, _, b_cnt = filled[lcp]
            earlier_merged = {r[3] for r in filled[:lcp]}
            assert {s_left, s_right} & earlier_merged, (m, lcp, seq[lcp])
            assert b_cnt <= s_cnt, (m, lcp, filled[lcp], seq[lcp])


def test_bpe_batched_equals_sequential_when_compatible(spark):
    """A corpus whose top pairs are pairwise symbol-disjoint: every
    batch fills, and batched election equals sequential election rule
    for rule — the 'proven identical when compatible' pin."""
    import pandas as pd

    from renkodf_spark.operators.text import bpe_merges

    # four disjoint digrams with strictly descending counts
    docs = []
    for i, (w, n) in enumerate([("ab", 50), ("cd", 40), ("ef", 30), ("gh", 20)]):
        docs.extend((i * 1000 + j, w) for j in range(n))
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf)
    seq = [tuple(r) for r in bpe_merges(df, k=4).collect()]
    b4 = [tuple(r) for r in bpe_merges(df, k=4, batch_m=4).collect()]
    assert len(seq) == 4 and b4 == seq, (b4, seq)


def test_bpe_batched_validates_args(spark):
    import pytest

    from renkodf_spark.operators.text import bpe_merges

    with pytest.raises(ValueError, match="batch_m"):
        bpe_merges(spark.range(1).selectExpr("'x' as text"), k=4, batch_m=0)


def test_winnow_guarantee_and_tiebreak(spark):
    """Winnowing contract (Schleimer et al. 2003): (a) two docs sharing
    a contiguous run of >= window+k-1 tokens share at least one
    fingerprint hash; (b) on within-window hash ties the RIGHTMOST
    position is selected (robust winnowing); (c) short docs (< w+k-1
    tokens) yield no fingerprints."""
    from renkodf_spark.operators import text as text_ops

    k, w = 3, 4
    shared = "quick brown foxes jump over lazy dogs"  # 7 tokens >= w+k-1=6
    docs = spark.createDataFrame(
        [
            (1, "alpha beta " + shared + " gamma"),
            (2, shared + " delta epsilon zeta"),
            (3, "one two three four five"),  # 5 tokens < 6: no fingerprints
            (4, "a b a b a b a b"),  # heavy ties: selections must be unique
        ],
        "doc_id long, text string",
    )
    fps = text_ops.winnow_fingerprints(docs, k=k, window=w).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    assert 3 not in by_doc
    f1 = {fp for _, fp in by_doc[1]}
    f2 = {fp for _, fp in by_doc[2]}
    assert f1 & f2, "shared >= w+k-1 run must share a fingerprint"

    # doc 4: grams alternate between TWO hash values ('a b a' / 'b a b');
    # rightmost tie-break must pick, per window, the LAST occurrence of
    # the smaller hash — verify against a pure-Python replay
    import hashlib

    toks = "a b a b a b a b".split()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams]
    want = set()
    for j in range(w - 1, len(hs)):
        lo = j - w + 1
        mh = min(hs[lo : j + 1])
        pos = max(i for i in range(lo, j + 1) if hs[i] == mh)
        want.add((pos, mh))
    assert by_doc[4] == want


# ------------------------------------------------ vocabulary growth

def test_vocab_growth_matches_python_replay(spark):
    from renkodf_spark.operators.text import vocab_growth

    rows = [
        (0, "a b a"),
        (1, "b c"),
        (4, "c d d"),
        (7, "e"),
        (9, "a e f"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    B = 4
    got = {r.bucket: (r.n_docs, r.bucket_tokens, r.cum_tokens, r.new_terms, r.cum_vocab)
           for r in vocab_growth(docs, n_buckets=B).collect()}

    mx = max(d for d, _ in rows)
    buckets = {}
    first = {}
    for d, text in rows:
        b = (d * B) // (mx + 1)
        toks = text.split()
        nd, nt = buckets.get(b, (set(), 0))
        nd = nd | {d}
        buckets[b] = (nd, nt + len(toks))
        for t in toks:
            first[t] = min(first.get(t, b), b)
    new = {}
    for t, b in first.items():
        new[b] = new.get(b, 0) + 1
    want, cum_t, cum_v = {}, 0, 0
    for b in sorted(buckets):
        nd, nt = buckets[b]
        cum_t += nt
        nb = new.get(b, 0)
        cum_v += nb
        want[b] = (len(nd), nt, cum_t, nb, cum_v)
    assert got == want
    # sparse id ranges leave holes: bucket 1 (ids 3-4 -> 4 only) exists,
    # but not every bucket index must
    assert set(got) == {(d * B) // (mx + 1) for d, _ in rows}


def test_vocab_growth_validates(spark):
    import pytest as _pytest

    from renkodf_spark.operators.text import vocab_growth

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="n_buckets"):
        vocab_growth(docs, n_buckets=0)


def test_vocab_growth_exhausted_source_flattens(spark):
    """A corpus that repeats the same vocabulary in every slice shows a
    flat curve after bucket 0 — the signal the operator exists for."""
    from renkodf_spark.operators.text import vocab_growth

    docs = spark.createDataFrame(
        [(i, "same three words") for i in range(12)],
        "doc_id long, text string",
    )
    out = sorted(vocab_growth(docs, n_buckets=3).collect(), key=lambda r: r.bucket)
    assert [r.new_terms for r in out] == [3, 0, 0]
    assert [r.cum_vocab for r in out] == [3, 3, 3]
