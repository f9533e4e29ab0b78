"""Unit tests for the corpus-curation operators (operators/corpus.py):
dedup filtering, chunking, PII redaction, hash splits, quota sampling.

The properties pinned here are the ones the gate's value-hash compare
can't see: boundary behavior (short docs, empty text), determinism
across partition layouts, and quota/size invariants.
"""

import pytest
from pyspark.sql import functions as F

from renkodf_spark.operators import corpus


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ----------------------------------------------------------- dedup_filter


def test_dedup_filter_keeps_canonical_with_cluster_size(spark):
    docs = _docs_df(spark, [(i, f"doc {i}") for i in range(6)])
    # clusters: {0,1,2} -> 0, {3} singleton, {4,5} -> 4
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 4), (5, 4)], "id long, cluster_id long"
    )
    out = corpus.dedup_filter(docs, labels).orderBy("doc_id").collect()
    assert [(r.doc_id, r.cluster_size) for r in out] == [(0, 3), (3, 1), (4, 2)]
    # all original columns survive the filter
    assert out[0].text == "doc 0"


# -------------------------------------------------------------- chunking


def test_chunk_boundaries_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(10))
    out = (
        corpus.chunk_documents(_docs_df(spark, [(1, words)]), chunk_size=4, stride=3)
        .orderBy("chunk_id")
        .collect()
    )
    # starts 0,3,6,9 over 10 tokens
    assert [(r.chunk_id, r.n_tokens, r.chunk_text) for r in out] == [
        (0, 4, "w0 w1 w2 w3"),
        (1, 4, "w3 w4 w5 w6"),
        (2, 4, "w6 w7 w8 w9"),
        (3, 1, "w9"),
    ]


def test_chunk_short_and_empty_doc_emit_one_chunk(spark):
    out = corpus.chunk_documents(
        _docs_df(spark, [(1, "just three words"), (2, "")]), chunk_size=64, stride=48
    ).collect()
    by_id = {r.doc_id: r for r in out}
    assert len(out) == 2
    assert by_id[1].n_tokens == 3 and by_id[1].chunk_text == "just three words"
    # split('') yields [''] — one empty-token chunk, never zero rows
    assert by_id[2].n_tokens == 1 and by_id[2].chunk_text == ""


def test_chunk_rejects_nonpositive_params(spark):
    df = _docs_df(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        corpus.chunk_documents(df, chunk_size=0, stride=3)
    with pytest.raises(ValueError):
        corpus.chunk_documents(df, chunk_size=4, stride=0)


# -------------------------------------------------------------- PII


def test_redact_pii_counts_and_text(spark):
    df = _docs_df(
        spark,
        [
            (1, "mail bob.smith+x@corp.example.org or 192.168.0.1 call 555-123-4567"),
            (2, "no pii here at all"),
            (3, "two mails a@b.io c@d.net and 10.0.0.255"),
        ],
    )
    out = {r.doc_id: r for r in corpus.redact_pii(df).collect()}
    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (1, 1, 1)
    assert (out[2].n_email, out[2].n_ipv4, out[2].n_phone) == (0, 0, 0)
    assert (out[3].n_email, out[3].n_ipv4, out[3].n_phone) == (2, 1, 0)
    redacted = df.select("doc_id", corpus.redacted_text().alias("t")).collect()
    txt = {r.doc_id: r.t for r in redacted}
    assert txt[1] == "mail <EMAIL> or <IPV4> call <PHONE>"
    assert txt[2] == "no pii here at all"
    assert txt[3] == "two mails <EMAIL> <EMAIL> and <IPV4>"


def test_redact_pii_counts_follow_redaction_order(spark):
    # a phone-shaped string inside an email local-part is redacted AS
    # the email, so it must be counted as email only: counts run on the
    # progressively-redacted text, not independently on the raw text
    df = _docs_df(spark, [(1, "reach 555-123-4567@corp.example.com today")])
    r = corpus.redact_pii(df).collect()[0]
    assert (r.n_email, r.n_ipv4, r.n_phone) == (1, 0, 0)
    txt = df.select(corpus.redacted_text().alias("t")).collect()[0].t
    assert txt == "reach <EMAIL> today"


def test_redact_version_string_not_an_ip(spark):
    # 4-part dotted numbers with a >3-digit part must not match ipv4
    df = _docs_df(spark, [(1, "release 1.2.3.4 vs build 10.20.300.4000")])
    r = corpus.redact_pii(df).collect()[0]
    assert r.n_ipv4 == 1  # only 1.2.3.4


# ---------------------------------------------------------- hash_split


def test_hash_split_deterministic_across_layouts(spark):
    docs = _docs_df(spark, [(i, f"d{i}") for i in range(200)])
    a = corpus.hash_split(docs.repartition(1)).select("doc_id", "bucket", "split")
    b = corpus.hash_split(docs.repartition(7)).select("doc_id", "bucket", "split")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    frac = {r.split: r.n for r in a.groupBy("split").agg(F.count("*").alias("n")).collect()}
    # 90/5/5 within loose tolerance on 200 ids
    assert frac["train"] > 150 and frac["valid"] > 0 and frac["test"] > 0
    assert sum(frac.values()) == 200


def test_hash_split_rejects_bad_cuts(spark):
    docs = _docs_df(spark, [(1, "x")])
    with pytest.raises(ValueError):
        corpus.hash_split(docs, cuts={"train": 50, "test": 80})  # != buckets


def test_hash_split_salt_changes_assignment(spark):
    docs = _docs_df(spark, [(i, f"d{i}") for i in range(100)])
    a = corpus.hash_split(docs, salt="s1").select("doc_id", "bucket")
    b = corpus.hash_split(docs, salt="s2").select("doc_id", "bucket")
    assert a.exceptAll(b).count() > 0  # different salt, different buckets


# -------------------------------------------------------- quota_sample


def test_quota_sample_quota_and_determinism(spark):
    rows = [(i, "g" + str(i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = corpus.quota_sample(df, "grp", per_group=10)
    sizes = {r.grp: r.n for r in out.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"g0": 10, "g1": 10, "g2": 10}
    # identical selection on a different partition layout
    out2 = corpus.quota_sample(df.repartition(9), "grp", per_group=10)
    assert out.select("doc_id").exceptAll(out2.select("doc_id")).count() == 0


def test_quota_sample_high_cardinality_groups_unhinted(spark):
    """quota_admitted's per-group stat joins must not FORCE a broadcast:
    with high-cardinality group_col the stats relation is one row per
    group — as big as the distinct-key space — and a forced broadcast
    bypasses the size threshold. The joins are unhinted (AQE decides);
    this pins both the no-hint plan property and exactness when nearly
    every row is its own group."""
    rows = [(i, "g" + str(i // 2)) for i in range(400)]  # 200 groups of 2
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = corpus.quota_sample(df, "grp", per_group=1)
    assert out.count() == 200
    # identical to the exact full-window path
    ref = corpus.quota_sample(df, "grp", per_group=1, admit_factor=None)
    assert out.select("doc_id").exceptAll(ref.select("doc_id")).count() == 0
    # no ResolvedHint/broadcast hint survives in the analyzed plan
    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "BROADCAST" not in analyzed


def test_quota_sample_small_group_kept_whole(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], "doc_id long, grp string")
    out = corpus.quota_sample(df, "grp", per_group=10)
    assert out.count() == 3
    ranks = {r.doc_id: r.sample_rank for r in out.collect()}
    assert ranks[3] == 1


def test_quota_admitted_bounds_hot_group_window_input(spark):
    """VERDICT r4 item 1: on a corpus where one group holds 90% of the
    rows, the rank window's input for that group must be ~admit_factor
    x quota, not the whole group — and the sample itself must be
    bit-identical to the unfiltered full-group ranking."""
    rows = [(i, "hot" if i < 9000 else f"g{i % 10}") for i in range(10000)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    k = 25
    admitted = corpus.quota_admitted(df, "grp", per_group=k, admit_factor=2)
    sizes = {r.grp: r.n for r in admitted.groupBy("grp").agg(F.count("*").alias("n")).collect()}
    # hot group: Binomial(9000, 50/9000) — mean 50, sd ~7; 4x quota is
    # a >7-sigma ceiling on a deterministic hash, so this never flakes
    assert sizes["hot"] <= 4 * k, sizes
    assert sizes["hot"] >= k  # and the admitted prefix can satisfy the quota
    filtered = corpus.quota_sample(df, "grp", per_group=k, admit_factor=2)
    full = corpus.quota_sample(df, "grp", per_group=k, admit_factor=None)
    assert filtered.exceptAll(full).count() == 0
    assert full.exceptAll(filtered).count() == 0


def test_rate_sample_nested_deterministic_and_zero_shuffle(spark):
    """rate_sample: layout-independent, NESTED across rates (the 10%
    sample is a subset of the 20% under one salt), approximately
    calibrated, and a single narrow filter (no Exchange)."""
    df = spark.createDataFrame([(i,) for i in range(5000)], "doc_id long")
    ten = corpus.rate_sample(df, 0.10)
    twenty = corpus.rate_sample(df, 0.20)
    n10, n20 = ten.count(), twenty.count()
    assert abs(n10 - 500) < 100 and abs(n20 - 1000) < 150
    assert ten.exceptAll(twenty).count() == 0  # nested
    again = {r.doc_id for r in corpus.rate_sample(df.repartition(9), 0.10).collect()}
    assert {r.doc_id for r in ten.collect()} == again  # layout-independent
    assert "Exchange" not in ten._jdf.queryExecution().executedPlan().toString()


def test_rate_sample_per_group_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else ("de" if i % 4 == 1 else None)) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = corpus.rate_sample(
        df, {"en": 0.05, "de": 0.5}, group_col="lang", default_rate=1.0
    )
    got = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(got["en"] - 100) < 60  # 2000 * 0.05
    assert abs(got["de"] - 500) < 100  # 1000 * 0.5
    assert got[None] == 1000  # unlisted (NULL) group keeps default rate 1.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        corpus.rate_sample(df, {"en": 1.5}, group_col="lang")
    with _pytest.raises(ValueError):
        corpus.rate_sample(df, {"en": 0.5})  # dict rates need group_col


def test_quota_sample_null_group_sampled_identically(spark):
    """Self-review r5: a NULL group is a legitimate window partition —
    the pre-filtered path must sample it exactly like the full ranking,
    not drop it through a non-null-safe join."""
    rows = [(i, None if i % 3 == 0 else f"g{i % 2}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    filtered = corpus.quota_sample(df, "grp", per_group=7)
    full = corpus.quota_sample(df, "grp", per_group=7, admit_factor=None)
    assert filtered.exceptAll(full).count() == 0
    assert full.exceptAll(filtered).count() == 0
    assert filtered.filter(F.col("grp").isNull()).count() == 7


def test_assemble_bins_ignores_zero_token_chunks(spark):
    """Self-review r5: a zero-token chunk on a bin boundary must not
    emit a descending sequence (phantom empty bins)."""
    chunks = spark.createDataFrame(
        [(1, 0, 4, "a b c d"), (1, 1, 0, ""), (2, 0, 2, "e f")],
        "doc_id long, chunk_id long, n_tokens long, chunk_text string",
    )
    packed = corpus.pack_sequences(chunks, budget=4, shards=1)
    bins = {r.bin_id: r for r in corpus.assemble_bins(packed, budget=4).collect()}
    assert set(bins) == {0, 1}
    assert bins[0].bin_text == "a b c d" and bins[1].bin_text == "e f"


def test_quota_sample_under_admission_fallback_is_exact(spark):
    """admit_factor=1 puts the admitted count AT the quota in
    expectation, so ~half of these 40 groups under-admit — the safety
    check must route exactly those groups through full ranking and the
    result must still equal the unfiltered sample bit-for-bit."""
    rows = [(i, f"g{i % 40}") for i in range(1600)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    tight = corpus.quota_sample(df, "grp", per_group=20, admit_factor=1)
    full = corpus.quota_sample(df, "grp", per_group=20, admit_factor=None)
    assert tight.exceptAll(full).count() == 0
    assert full.exceptAll(tight).count() == 0
    assert tight.count() == 40 * 20


# ------------------------------------------------------- sequence packing


def test_assemble_bins_splits_straddlers_and_pads(spark):
    """Bin assembly: chunk token streams laid end-to-end per shard, cut
    every `budget` tokens; straddling chunks split at the boundary so
    every non-terminal bin is exactly full."""
    chunks = spark.createDataFrame(
        [(1, 0, 3, "a b c"), (1, 1, 2, "d e"), (2, 0, 4, "f g h i")],
        "doc_id long, chunk_id long, n_tokens long, chunk_text string",
    )
    packed = corpus.pack_sequences(chunks, budget=4, shards=1)
    bins = {
        r.bin_id: r for r in corpus.assemble_bins(packed, budget=4).collect()
    }
    assert bins[0].bin_text == "a b c d" and bins[0].bin_tokens == 4
    assert bins[1].bin_text == "e f g h" and bins[1].bin_tokens == 4
    assert bins[2].bin_text == "i" and bins[2].bin_tokens == 1
    padded = {
        r.bin_id: r
        for r in corpus.assemble_bins(packed, budget=4, pad_token="<pad>").collect()
    }
    assert padded[2].bin_text == "i <pad> <pad> <pad>"
    assert padded[2].bin_tokens == 1  # pre-pad count
    assert padded[0].bin_text == "a b c d"  # full bins untouched


def test_assemble_bins_layout_independent(spark):
    """collect_list order is partition-dependent; the offset sort key
    must make the assembled text identical across layouts."""
    docs = _docs_df(
        spark,
        [(i, " ".join(f"t{i}_{j}" for j in range(i % 13 + 1))) for i in range(60)],
    )
    chunks = corpus.chunk_documents(docs, chunk_size=5, stride=5)
    packed = corpus.pack_sequences(chunks, budget=8, shards=2)
    a = corpus.assemble_bins(packed, budget=8)
    b = corpus.assemble_bins(packed.repartition(7), budget=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # non-terminal bins are exactly full: at most one short bin per shard
    short = a.filter(F.col("bin_tokens") < 8).groupBy("shard").count().collect()
    assert all(r["count"] == 1 for r in short)


def test_pack_sequences_bins_and_straddles(spark):
    # one shard (shards=1) so the packing order is fully predictable
    chunks = spark.createDataFrame(
        [(1, 0, 60), (1, 1, 60), (2, 0, 100), (2, 1, 30)],
        "doc_id long, chunk_id long, n_tokens long",
    )
    out = {
        (r["doc_id"], r["chunk_id"]): r
        for r in corpus.pack_sequences(chunks, budget=128, shards=1).collect()
    }
    # cumulative starts: 0, 60, 120, 220
    assert (out[(1, 0)]["bin_id"], out[(1, 0)]["bin_offset"]) == (0, 0)
    assert (out[(1, 1)]["bin_id"], out[(1, 1)]["bin_offset"]) == (0, 60)
    assert (out[(2, 0)]["bin_id"], out[(2, 0)]["bin_offset"]) == (0, 120)
    assert (out[(2, 1)]["bin_id"], out[(2, 1)]["bin_offset"]) == (1, 92)
    # 60+60 fits bin 0 exactly up to 120; chunk (2,0) starts at offset
    # 120 with 100 tokens -> crosses into bin 1; (2,1) fits
    assert not out[(1, 0)]["spans_bins"] and not out[(1, 1)]["spans_bins"]
    assert out[(2, 0)]["spans_bins"] and not out[(2, 1)]["spans_bins"]


def test_pack_sequences_layout_independent(spark):
    import hashlib

    docs = [(d, c, 10 + (d * 7 + c) % 23) for d in range(20) for c in range(3)]
    df = spark.createDataFrame(docs, "doc_id long, chunk_id long, n_tokens long")
    runs = []
    for nparts in (1, 16):
        rows = corpus.pack_sequences(
            df.repartition(nparts), budget=64, shards=4
        ).collect()
        runs.append(sorted((r["doc_id"], r["chunk_id"], r["shard"], r["bin_id"], r["bin_offset"]) for r in rows))
    assert runs[0] == runs[1]
    # shard is the salted doc hash, independent of chunk layout
    for r in runs[0]:
        expect = int(hashlib.md5(f"pack:{r[0]}".encode()).hexdigest()[:12], 16) % 4
        assert r[2] == expect


def test_pack_sequences_validation(spark):
    df = spark.createDataFrame([(1, 0, 5)], "doc_id long, chunk_id long, n_tokens long")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        corpus.pack_sequences(df, budget=0)
    with _pytest.raises(ValueError):
        corpus.pack_sequences(df, shards=-1)


def test_packing_pipeline_randomized_invariants(spark):
    """Seeded-random corpora through chunk -> pack -> assemble: token
    conservation (sum of bin tokens == sum of chunk tokens), every
    non-terminal bin exactly full, exactly one short-or-full terminal
    bin per shard, and bin text round-trips the chunk token stream."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        docs = _docs_df(
            spark,
            [
                (i, " ".join(f"w{i}_{j}" for j in range(rng.randint(0, 40))))
                for i in range(rng.randint(30, 80))
            ],
        )
        budget = rng.choice([8, 16, 32])
        chunks = corpus.chunk_documents(docs, chunk_size=7, stride=5)
        packed = corpus.pack_sequences(chunks, budget=budget, shards=3)
        bins = corpus.assemble_bins(packed, budget=budget).collect()
        total_chunk_tokens = packed.agg(F.sum("n_tokens")).collect()[0][0]
        assert sum(r.bin_tokens for r in bins) == total_chunk_tokens, f"trial {trial}"
        by_shard = {}
        for r in bins:
            by_shard.setdefault(r.shard, []).append(r)
        for shard, rows in by_shard.items():
            rows.sort(key=lambda r: r.bin_id)
            assert [r.bin_id for r in rows] == list(range(len(rows)))  # contiguous
            for r in rows[:-1]:
                assert r.bin_tokens == budget, f"trial {trial} shard {shard}"
            assert 0 < rows[-1].bin_tokens <= budget
            # concatenated bin text == the shard's chunk stream in order
            stream = " ".join(r.bin_text for r in rows)
            want = " ".join(
                r.chunk_text
                for r in packed.filter(F.col("shard") == shard)
                .orderBy("doc_id", "chunk_id")
                .collect()
                if r.n_tokens > 0
            )
            assert stream == want, f"trial {trial} shard {shard}"


# --------------------------------------------------------- decontamination


def test_contamination_flags_verbatim_overlap(spark):
    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "eval_id long, text string"
    )
    train = _docs_df(
        spark,
        [
            (1, "intro words the quick brown fox jumps over it"),  # contains the 5-gram
            (2, "totally unrelated content about spark plans here"),
        ],
    )
    rep = corpus.contamination(train, eval_df, n=5).collect()
    assert [(r.doc_id, r.n_hit_grams, r.n_eval_docs) for r in rep] == [(1, 1, 1)]
    kept = corpus.decontaminate(train, eval_df, n=5).select("doc_id").collect()
    assert sorted(r.doc_id for r in kept) == [2]


def test_contamination_normalizes_case_and_punct(spark):
    eval_df = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "eval_id long, text string"
    )
    train = _docs_df(spark, [(7, "x Alpha, BETA: gamma; delta! y")])
    rep = corpus.contamination(train, eval_df, n=4).collect()
    assert [(r.doc_id, r.n_hit_grams) for r in rep] == [(7, 1)]


def test_contamination_counts_distinct_grams_and_eval_docs(spark):
    # two eval docs share one doc's grams; repeated occurrences in the
    # train doc count once (distinct-gram semantics)
    eval_df = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e")], "eval_id long, text string"
    )
    train = _docs_df(spark, [(9, "a b c d e a b c d e")])
    rep = corpus.contamination(train, eval_df, n=4).collect()
    # train 4-grams: {a b c d, b c d e, c d e a, d e a b, e a b c}
    # hits: "a b c d" (eval 1), "b c d e" (eval 2)
    assert [(r.doc_id, r.n_hit_grams, r.n_eval_docs) for r in rep] == [(9, 2, 2)]


def test_contamination_short_docs_never_flagged(spark):
    eval_df = spark.createDataFrame([(1, "a b c")], "eval_id long, text string")
    train = _docs_df(spark, [(1, "a b"), (2, "")])
    assert corpus.contamination(train, eval_df, n=3).count() == 0
    assert corpus.decontaminate(train, eval_df, n=3).count() == 2


def test_decontaminate_min_hit_threshold(spark):
    eval_df = spark.createDataFrame([(1, "a b c d e")], "eval_id long, text string")
    train = _docs_df(spark, [(1, "a b c z z z"), (2, "a b c d e f")])
    # doc 1 shares one 3-gram, doc 2 shares three 3-grams
    kept = corpus.decontaminate(train, eval_df, n=3, min_hit_grams=2).collect()
    assert sorted(r.doc_id for r in kept) == [1]


def test_contamination_rejects_bad_n(spark):
    eval_df = spark.createDataFrame([(1, "a b")], "eval_id long, text string")
    with pytest.raises(ValueError, match="n must be positive"):
        corpus.contamination(_docs_df(spark, [(1, "a b")]), eval_df, n=0)


# ---------------------------------------------------- temperature sampling


def test_temperature_rates_math_and_cap(spark):
    import math

    df = spark.createDataFrame(
        [(i, "hot" if i < 80 else "cold") for i in range(100)], "doc_id long, lang string"
    )
    rates = {r.lang: r for r in corpus.temperature_rates(
        df, alpha=0.5, target_total=60
    ).collect()}
    w_hot = round(math.sqrt(80) * 1e6)
    w_cold = round(math.sqrt(20) * 1e6)
    W = w_hot + w_cold
    assert rates["hot"].n_rows == 80 and rates["cold"].n_rows == 20
    assert rates["hot"].rate == pytest.approx(60 * w_hot / W / 80, abs=1e-12)
    # cold group: 60 * 0.3333 / 20 = 1.0009... -> capped at 1.0
    assert rates["cold"].rate == 1.0


def test_temperature_sample_flattens_skew_and_is_layout_stable(spark):
    rows = [(i, "hot" if i < 900 else "cold") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = corpus.temperature_sample(df, alpha=0.3, target_total=200).collect()
    by = {}
    for r in kept:
        by[r.lang] = by.get(r.lang, 0) + 1
    # natural ratio 9:1; alpha=0.3 flattens it to under 3:1
    assert by["hot"] / by["cold"] < 3.0
    # deterministic hash: exact same set under a different layout
    kept2 = corpus.temperature_sample(df.repartition(17), alpha=0.3, target_total=200).collect()
    assert sorted(r.doc_id for r in kept) == sorted(r.doc_id for r in kept2)


def test_temperature_sample_nested_in_target(spark):
    rows = [(i, f"l{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    small = {r.doc_id for r in corpus.temperature_sample(df, target_total=60).collect()}
    big = {r.doc_id for r in corpus.temperature_sample(df, target_total=150).collect()}
    assert small <= big


def test_temperature_sample_null_group_and_validation(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "en"), (3, None)], "doc_id long, lang string"
    )
    out = corpus.temperature_sample(df, alpha=1.0, target_total=3).collect()
    # alpha=1, target=total -> every rate is 1.0, everything kept (nulls too)
    assert sorted(r.doc_id for r in out) == [1, 2, 3]
    with pytest.raises(ValueError, match="alpha"):
        corpus.temperature_rates(df, alpha=0.0)
    with pytest.raises(ValueError, match="target_total"):
        corpus.temperature_rates(df, target_total=0)


# ------------------------------------------- boilerplate line removal


def test_remove_boilerplate_lines_basic(spark):
    docs = _docs_df(
        spark,
        [
            (1, "SHARED\nunique one\ntail"),
            (2, "shared  \nunique two\ntail"),  # normalization collapses
            (3, " Shared\nunique three\ntail"),
            (4, "SHARED\ntail"),  # every line is boilerplate
        ],
    )
    out = {
        r.doc_id: r
        for r in corpus.remove_boilerplate_lines(docs, max_docs=2).collect()
    }
    # 'shared' (4 docs) and 'tail' (4 docs) removed; bodies kept
    assert out[1].clean_text == "unique one"
    assert out[2].clean_text == "unique two"
    assert out[3].clean_text == "unique three"
    assert out[4].clean_text == ""  # fully-boilerplate doc survives, empty
    assert (out[4].n_lines_kept, out[4].n_lines_removed) == (0, 2)
    assert (out[1].n_lines_kept, out[1].n_lines_removed) == (1, 2)


def test_remove_boilerplate_lines_threshold_is_inclusive(spark):
    docs = _docs_df(
        spark,
        [(1, "pair\nmine 1"), (2, "pair\nmine 2"), (3, "solo\nmine 3")],
    )
    out = {
        r.doc_id: r.clean_text
        for r in corpus.remove_boilerplate_lines(docs, max_docs=2).collect()
    }
    # 'pair' appears in exactly max_docs=2 docs -> kept
    assert out[1] == "pair\nmine 1"
    assert out[3] == "solo\nmine 3"


def test_remove_boilerplate_lines_order_and_within_doc_repeats(spark):
    # a line repeated WITHIN one doc counts that doc once; order survives
    docs = _docs_df(
        spark,
        [(1, "x\na\nx\nb\nx"), (2, "c\nd")],
    )
    out = {
        r.doc_id: r
        for r in corpus.remove_boilerplate_lines(docs, max_docs=1).collect()
    }
    assert out[1].clean_text == "x\na\nx\nb\nx"  # x in 1 doc only: kept
    assert out[1].n_lines_kept == 5


def test_line_doc_frequencies_distinct_docs(spark):
    docs = _docs_df(spark, [(1, "x\nx\ny"), (2, "x\nz")])
    freq = {
        r.line_key: r.n_docs
        for r in corpus.line_doc_frequencies(docs).collect()
    }
    import hashlib

    assert freq[hashlib.md5(b"x").hexdigest()] == 2  # not 3
    assert freq[hashlib.md5(b"y").hexdigest()] == 1


def test_remove_boilerplate_lines_layout_independent(spark):
    rows = [(i, f"header\nbody {i}\nfooter {i % 3}") for i in range(30)]
    docs = _docs_df(spark, rows)
    a = corpus.remove_boilerplate_lines(docs.repartition(1), max_docs=2)
    b = corpus.remove_boilerplate_lines(docs.repartition(7, "doc_id"), max_docs=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
