"""Unit tests for the round-7 phase-4 operators: quality-aware dedup
keep, CCNet perplexity buckets, Bloom membership sketches, DSIR
importance weights, per-source curation stats.

Expectations are computed independently on the driver (hashlib / math /
collections), not with the operators' own Spark expressions.
"""

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from renkodf_spark.functions import bloom
from renkodf_spark.operators import corpus, dedup, text


def _round_half_up(x: float) -> int:
    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------- cluster_representatives


def test_cluster_representatives_elects_best(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 7), (4, 30), (5, 5)], "doc_id long, n_chars long"
    )
    labels = spark.createDataFrame(
        # {1,2,4} one cluster, 3 and 5 singletons
        [(1, 1), (2, 1), (4, 1), (3, 3), (5, 5)], "id long, cluster_id long"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.cluster_representatives(docs, labels).collect()
    }
    assert len(out) == 5
    # cluster 1: scores 10/30/30 — tie between 2 and 4 -> smallest id 2
    for d in (1, 2, 4):
        assert out[d]["keep_id"] == 2 and out[d]["cluster_size"] == 3
    assert [out[d]["is_kept"] for d in (1, 2, 4)] == [0, 1, 0]
    for d in (3, 5):
        assert out[d]["keep_id"] == d and out[d]["cluster_size"] == 1
        assert out[d]["is_kept"] == 1


def test_cluster_representatives_string_ids_tie_break(spark):
    """ADVICE r7: string ids must tie-break in their natural
    (lexicographic) order — the old `-F.col(id)` negation cast strings
    to double (NULL ordering = nondeterministic election, or an ANSI
    error). Also covers numeric-LOOKING strings: '10' < '9' lexically."""
    docs = spark.createDataFrame(
        [("url-b", 30), ("url-a", 30), ("url-c", 7), ("10", 9), ("9", 9)],
        "doc_id string, n_chars long",
    )
    labels = spark.createDataFrame(
        [("url-b", 1), ("url-a", 1), ("url-c", 1), ("10", 2), ("9", 2)],
        "id string, cluster_id long",
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.cluster_representatives(docs, labels).collect()
    }
    # score tie 30/30 -> lexicographically smallest id wins
    assert all(out[d]["keep_id"] == "url-a" for d in ("url-a", "url-b", "url-c"))
    assert out["url-a"]["is_kept"] == 1 and out["url-b"]["is_kept"] == 0
    # numeric-looking strings stay lexicographic: '10' < '9'
    assert out["10"]["keep_id"] == "10" and out["9"]["keep_id"] == "10"


def test_cluster_representatives_end_to_end(spark):
    """Through cluster_labels: the pair graph {1-2, 2-6} merges into one
    cluster; the longest member wins."""
    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "a a a b"), (6, "a a"), (3, "zzz")],
        "doc_id long, text string",
    ).withColumn("n_chars", F.length("text"))
    pairs = spark.createDataFrame([(1, 2), (2, 6)], "id_a long, id_b long")
    labels = dedup.cluster_labels(docs, pairs)
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.cluster_representatives(docs, labels).collect()
    }
    assert all(out[d]["cluster_id"] == 1 for d in (1, 2, 6))
    assert all(out[d]["keep_id"] == 2 for d in (1, 2, 6))  # longest text
    assert out[3]["is_kept"] == 1 and out[3]["cluster_size"] == 1


# --------------------------------------------------------- logprob buckets


def _unigram_scores(rows):
    """Independent integer micro-nat replay of text.unigram_logprob."""
    tfs = {i: Counter(t.strip().split() if t.strip() else [""]) for i, t in rows}
    # NB: Spark splits on \s+ after trim; empty text -> one "" token
    counts = Counter()
    for tf in tfs.values():
        counts.update(tf)
    T, V = sum(counts.values()), len(counts)
    lp = {w: _round_half_up(math.log((c + 1) / (T + V)) * 1e6) for w, c in counts.items()}
    return {
        i: (sum(tf.values()), sum(n * lp[w] for w, n in tf.items()))
        for i, tf in tfs.items()
    }


def test_logprob_buckets_exact_and_tiered(spark):
    rows = [
        (1, "a a a a"),      # most typical (all 'a')
        (2, "a a a b"),
        (3, "a a b b"),
        (4, "a b c d"),
        (5, "x y z q"),      # least typical
        (6, "a a b c"),
    ]
    df = spark.createDataFrame(
        [(i, t, "en") for i, t in rows], "doc_id long, text string, lang string"
    )
    out = {r["doc_id"]: r.asDict() for r in text.logprob_buckets(df).collect()}
    exp = _unigram_scores(rows)
    for i, (n, s) in exp.items():
        assert out[i]["n_tokens"] == n
        # Spark F.round is HALF_UP; s/n is exact here (n = 4), so the
        # micro-nat mean rounds exactly
        assert out[i]["avg_logp"] == pytest.approx(_round_half_up(s / n) / 1e6, abs=1e-9)
    # manual ntile(3) over score desc, id asc: 6 docs -> 2 per tier
    order = sorted(exp, key=lambda i: (-(exp[i][1] / exp[i][0]), i))
    tiers = {i: ["head", "middle", "tail"][j // 2] for j, i in enumerate(order)}
    for i in exp:
        assert out[i]["tier"] == tiers[i], (i, out[i], tiers)
    assert sorted(out[i]["bucket"] for i in exp) == [1, 1, 2, 2, 3, 3]


def test_logprob_buckets_per_language_and_validation(spark):
    df = spark.createDataFrame(
        [(i, f"w{i % 3} common", "en" if i % 2 else "de") for i in range(12)],
        "doc_id long, text string, lang string",
    )
    out = text.logprob_buckets(df).collect()
    by_lang = Counter((r["lang"], r["bucket"]) for r in out)
    # equal-population per language: 6 docs per lang -> 2 per bucket
    assert all(v == 2 for v in by_lang.values()) and len(by_lang) == 6
    with pytest.raises(ValueError, match="n_buckets"):
        text.logprob_buckets(df, n_buckets=0)


# ------------------------------------------------------------------ bloom


def _positions_py(key: str, n_bits: int, k: int):
    d = _md5(key)
    h1, h2 = int(d[:8], 16), int(d[8:16], 16)
    return [(h1 + i * h2) % n_bits for i in range(k)]


def test_bloom_matches_python_replay(spark):
    n_bits, k = 256, 3
    keys = [f"key-{i}" for i in range(40)]
    df = spark.createDataFrame([(s,) for s in keys], "key string")
    sketch = {
        r["word_idx"]: r["bits"]
        for r in bloom.bloom_build(df, "key", n_bits=n_bits, k=k).collect()
    }
    words = {}
    for s in keys:
        for p in _positions_py(s, n_bits, k):
            words[p // 32] = words.get(p // 32, 0) | (1 << (p % 32))
    assert sketch == words

    probe_keys = keys[:5] + [f"other-{i}" for i in range(200)]
    probes = spark.createDataFrame(list(enumerate(probe_keys)), "doc_id long, key string")
    got = {
        r["doc_id"]: r["might_contain"]
        for r in bloom.bloom_might_contain(
            probes, bloom.bloom_build(df, "key", n_bits=n_bits, k=k), "key",
            n_bits=n_bits, k=k,
        ).collect()
    }
    expected = {
        i: int(all((words.get(p // 32, 0) >> (p % 32)) & 1
                   for p in _positions_py(s, n_bits, k)))
        for i, s in enumerate(probe_keys)
    }
    assert got == expected
    # one-sided error: the 5 member probes are always positive
    assert all(got[i] == 1 for i in range(5))
    # and the sketch is small enough that SOME of the 200 non-members
    # collide (fill ~0.37, fpp ~5%) while most do not
    fps = sum(got[i] for i in range(5, 205))
    assert 0 < fps < 100


def test_bloom_merge_and_stats(spark):
    n_bits, k = 256, 3
    a = spark.createDataFrame([(f"a{i}",) for i in range(20)], "key string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(20)], "key string")
    merged = (
        bloom.bloom_build(a, "key", n_bits=n_bits, k=k)
        .union(bloom.bloom_build(b, "key", n_bits=n_bits, k=k))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    whole = bloom.bloom_build(a.union(b), "key", n_bits=n_bits, k=k)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))

    stats = bloom.bloom_stats(whole, n_bits=n_bits, k=k).collect()[0]
    set_bits = sum(bin(r["bits"]).count("1") for r in whole.collect())
    assert stats["set_bits"] == set_bits
    assert stats["fill_frac"] == pytest.approx(round(set_bits / n_bits, 6))
    assert stats["est_fpp"] == pytest.approx(round((set_bits / n_bits) ** k, 6))


def test_bloom_validation(spark):
    df = spark.createDataFrame([("x",)], "key string")
    with pytest.raises(ValueError, match="n_bits"):
        bloom.bloom_build(df, "key", n_bits=100, k=2)  # not a multiple of 32
    with pytest.raises(ValueError, match="k must"):
        bloom.bloom_build(df, "key", n_bits=64, k=0)


# ------------------------------------------------------------------- DSIR


def _norm_tokens(t: str):
    import re

    s = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", " ", t.lower())).strip()
    return s.split(" ")


def _dsir_py(raw_rows, target_rows, n_buckets, alpha=1):
    def grams(t):
        toks = _norm_tokens(t)
        gs = [_md5(w) for w in toks]
        gs += [_md5(f"{a} {b}") for a, b in zip(toks, toks[1:])]
        return [int(g[:8], 16) % n_buckets for g in gs]

    raw_b = {i: grams(t) for i, t in raw_rows}
    cr, ct = Counter(), Counter()
    for bs in raw_b.values():
        cr.update(bs)
    for _, t in target_rows:
        ct.update(grams(t))
    Tr, Tt = sum(cr.values()), sum(ct.values())
    B = alpha * n_buckets
    lr = {
        b: _round_half_up(
            (math.log((ct.get(b, 0) + alpha) / (Tt + B)) - math.log((c + alpha) / (Tr + B)))
            * 1e6
        )
        for b, c in cr.items()
    }
    return {i: (len(bs), sum(lr[b] for b in bs)) for i, bs in raw_b.items()}


def test_dsir_weights_match_python_replay(spark):
    raw_rows = [
        (1, "the target style text"),
        (2, "the target style text again"),
        (3, "totally unrelated noise tokens"),
        (4, "Mixed, CASE text; with punct!"),
    ]
    target_rows = [(10, "the target style text"), (11, "target style")]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    n_buckets = 512
    out = {
        r["doc_id"]: r.asDict()
        for r in corpus.dsir_weights(raw, target, n_buckets=n_buckets).collect()
    }
    exp = _dsir_py(raw_rows, target_rows, n_buckets)
    assert set(out) == set(exp)
    for i, (n, w) in exp.items():
        assert out[i]["n_grams"] == n, (i, out[i], (n, w))
        assert out[i]["weight_micros"] == w, (i, out[i], (n, w))
        assert out[i]["avg_weight"] == pytest.approx(round(w / (n * 1e6), 6), abs=1e-9)
    # target-like docs outrank the unrelated one
    assert exp[1][1] > exp[3][1] and exp[2][1] > exp[3][1]

    top = corpus.dsir_top_sample(raw, target, 2, n_buckets=n_buckets).collect()
    want = sorted(exp, key=lambda i: (-exp[i][1], i))[:2]
    assert [r["doc_id"] for r in top] == want


def test_dsir_validation(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n_buckets"):
        corpus.dsir_weights(df, df, n_buckets=0)
    with pytest.raises(ValueError, match="alpha"):
        corpus.dsir_weights(df, df, alpha=0)
    with pytest.raises(ValueError, match="keep"):
        corpus.dsir_top_sample(df, df, 0)


# --------------------------------------------------- source quality report


def test_source_quality_report(spark):
    rows = [
        (1, "dup text", "en", "sA"),
        (2, "dup text", "en", "sA"),      # dup within sA
        (3, "unique one", "de", "sA"),
        (4, "dup text", "fr", "sB"),      # dup of sA's text, lives in sB
        (5, "unique two", "en", "sB"),
        (6, "unique three", "en", "sB"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r["source"]: r.asDict() for r in corpus.source_quality_report(df).collect()}
    assert out["sA"]["n_docs"] == 3 and out["sA"]["n_langs"] == 2
    assert out["sB"]["n_docs"] == 3 and out["sB"]["n_langs"] == 2
    # 'dup text' appears 3x corpus-wide: 2 of sA's 3 docs, 1 of sB's 3
    assert out["sA"]["dup_frac"] == pytest.approx(round(2 / 3, 6))
    assert out["sB"]["dup_frac"] == pytest.approx(round(1 / 3, 6))
    lens_a = sorted(len(t) for _, t, _, s in [(r[0], r[1], r[2], r[3]) for r in rows] if s == "sA")
    assert out["sA"]["avg_chars"] == pytest.approx(round(sum(lens_a) / 3, 4))
    assert out["sA"]["p50_chars"] == pytest.approx(float(lens_a[1]))


# -------------------------------------------------- JL random projection


def test_random_project_matches_python_replay(spark):
    import numpy as np

    from renkodf_spark.operators import similarity

    rng = np.random.default_rng(7)
    vecs = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(6)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: list(r["proj"])
        for r in similarity.random_project(df, out_dim=3, dim=8).collect()
    }
    planes = similarity.rp_planes(3, 8)
    for i, v in vecs:
        exp = [_round_half_up(sum(a * b for a, b in zip(v, p)) * 1e6) for p in planes]
        assert out[i] == exp

    with pytest.raises(ValueError, match="out_dim"):
        similarity.random_project(df, out_dim=9, dim=8)


def test_projected_topk_ranks_in_reduced_space(spark):
    import numpy as np

    from renkodf_spark.operators import similarity

    rng = np.random.default_rng(11)
    vecs = [(i, [float(x) for x in rng.normal(0, 1, 16)]) for i in range(30)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    got = similarity.projected_cosine_topk(
        df, df.filter("vec_id < 2"), k=3, out_dim=6, dim=16
    ).collect()
    # replay: project with the same planes, rank by cosine desc, id
    planes = similarity.rp_planes(6, 16)
    proj = {
        i: [_round_half_up(sum(a * b for a, b in zip(v, p)) * 1e6) for p in planes]
        for i, v in vecs
    }

    def cos(a, b):
        import math

        num = sum(x * y for x, y in zip(a, b))
        return num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

    for qid in (0, 1):
        order = sorted(
            (i for i, _ in vecs if i != qid),
            key=lambda i: (-cos(proj[qid], proj[i]), i),
        )[:3]
        rows = sorted(
            ((r["rank"], r["neighbor_id"]) for r in got if r["query_id"] == qid)
        )
        assert [n for _, n in rows] == order


# -------------------------------------------------- exact-k uniform sample


def test_uniform_sample_exact_k(spark):
    from renkodf_spark.operators import corpus

    df = spark.createDataFrame([(i, f"d{i}") for i in range(100)], "doc_id long, text string")
    got = [r["doc_id"] for r in corpus.uniform_sample_exact(df, 10, salt="s").collect()]
    exp = sorted(range(100), key=lambda i: (_md5(f"s:{i}"), i))[:10]
    assert got == exp
    # layout-independent: same draw under a different partitioning
    got2 = [
        r["doc_id"]
        for r in corpus.uniform_sample_exact(df.repartition(7), 10, salt="s").collect()
    ]
    assert got2 == exp
    # different salt -> different draw; k > n -> whole set
    assert [r["doc_id"] for r in corpus.uniform_sample_exact(df, 10, salt="t").collect()] != exp
    assert len(corpus.uniform_sample_exact(df, 500, salt="s").collect()) == 100
    with pytest.raises(ValueError, match="k must"):
        corpus.uniform_sample_exact(df, 0)


# ------------------------------------------ exact-substring discovery


def test_shared_ngram_pairs(spark):
    from renkodf_spark.operators import dedup as dd

    shared = "one two three four five"
    docs = [
        (1, f"{shared} alpha beta gamma"),
        (2, f"delta {shared} epsilon"),          # shares the 5-gram with 1
        (3, "totally unrelated words here now"),
        (4, f"{shared} alpha beta gamma"),        # exact dup of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["n_shared_grams"]
        for r in dd.shared_ngram_pairs(df, n=5).collect()
    }
    assert set(got) == {(1, 2), (1, 4), (2, 4)}
    assert got[(1, 2)] == 1  # only the shared 5-gram window itself
    assert got[(1, 4)] == 4  # all 4 distinct 5-grams of the 8-token doc
    # a gram cap of 2 drops the 3-doc boilerplate gram: only the
    # 2-doc-exclusive grams of the exact dup survive
    capped = {
        (r["id_a"], r["id_b"]): r["n_shared_grams"]
        for r in dd.shared_ngram_pairs(df, n=5, max_gram_docs=2).collect()
    }
    assert set(capped) == {(1, 4)} and capped[(1, 4)] == 3
    with pytest.raises(ValueError, match="max_gram_docs"):
        dd.shared_ngram_pairs(df, n=5, max_gram_docs=1)


# ---------------------------------------------- seeded randomized sweeps
# (house style of the chunk-boundary fuzz: one seeded sweep over many
# randomized cases per Spark job, instead of hypothesis-per-example
# round trips)


def test_bloom_randomized_sweep(spark):
    import random

    rng = random.Random(427)
    alphabet = ["a", "b", "Z", "0", " ", "é", "中", "-", ".", ""]
    keys = list({  # distinct, adversarial: empty, spaces, unicode
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        for _ in range(120)
    })
    df = spark.createDataFrame([(s,) for s in keys], "key string")
    probes = spark.createDataFrame(list(enumerate(keys * 2)), "doc_id long, key string")
    for n_bits, k in [(64, 2), (256, 3), (1024, 5)]:
        words = {}
        for s in keys:
            for p in _positions_py(s, n_bits, k):
                words[p // 32] = words.get(p // 32, 0) | (1 << (p % 32))
        sketch = bloom.bloom_build(df, "key", n_bits=n_bits, k=k)
        assert {r["word_idx"]: r["bits"] for r in sketch.collect()} == words
        got = {
            r["doc_id"]: r["might_contain"]
            for r in bloom.bloom_might_contain(
                probes, sketch, "key", n_bits=n_bits, k=k
            ).collect()
        }
        # every member key probes positive under every geometry
        assert all(v == 1 for v in got.values())


def test_dsir_randomized_sweep(spark):
    import random

    rng = random.Random(91)
    vocab = ["alpha", "beta", "Gamma!", "delta", "x1", "中文", "", "e e"]
    def doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 15)))

    raw_rows = [(i, doc()) for i in range(40)]
    target_rows = [(100 + i, doc()) for i in range(10)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    for n_buckets in (64, 1024):
        out = {
            r["doc_id"]: (r["n_grams"], r["weight_micros"])
            for r in corpus.dsir_weights(raw, target, n_buckets=n_buckets).collect()
        }
        exp = _dsir_py(raw_rows, target_rows, n_buckets)
        full = {i: exp.get(i, (0, 0)) for i, _ in raw_rows}
        assert out == full, n_buckets


def test_uniform_sample_randomized_sweep(spark):
    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    for salt in ("a", "b", "long-salt-string"):
        for k in (1, 7, 250, 500):
            got = [
                r["doc_id"]
                for r in corpus.uniform_sample_exact(df, k, salt=salt).collect()
            ]
            exp = sorted(range(500), key=lambda i: (_md5(f"{salt}:{i}"), i))[:k]
            assert got == exp, (salt, k)


def test_remove_duplicated_spans(spark):
    from renkodf_spark.operators import dedup as dd

    shared = "one two three four five"
    docs = [
        (1, f"{shared} alpha beta"),           # first owner: keeps everything
        (2, f"gamma {shared} delta"),          # loses the 5-token span
        (3, "no overlap at all here"),
        (4, f"{shared} alpha beta"),           # exact dup of 1: loses all
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r.asDict()
        for r in dd.remove_duplicated_spans(df, n=5).collect()
    }
    assert out[1]["n_tokens_dropped"] == 0
    assert out[1]["clean_digest"] == _md5(f"{shared} alpha beta")
    assert out[2]["n_tokens_dropped"] == 5
    assert out[2]["clean_digest"] == _md5("gamma delta")
    assert out[3]["n_tokens_dropped"] == 0
    assert out[4]["n_tokens"] == 7 and out[4]["n_tokens_dropped"] == 7
    assert out[4]["clean_digest"] == _md5("")
    with pytest.raises(ValueError, match="n must"):
        dd.remove_duplicated_spans(df, n=0)


# ------------------------------------------------- corpus shard export


def test_write_corpus_shards_roundtrip(spark, tmp_path):
    import os

    from renkodf_spark.operators import corpus as co

    df = spark.createDataFrame(
        [
            (i, f"doc number {i} body", "en" if i % 3 else "de",
             "train" if i % 10 < 8 else "test")
            for i in range(200)
        ],
        "doc_id long, text string, lang string, split string",
    )
    path = str(tmp_path / "corpus")
    co.write_corpus_shards(df, path, shards_per_group=3)
    # layout: split/lang/shard dirs, each shard exactly ONE data file
    for split in ("train", "test"):
        for lang in ("en", "de"):
            leaf = os.path.join(path, f"split={split}", f"lang={lang}")
            shards = sorted(d for d in os.listdir(leaf) if d.startswith("shard="))
            assert shards == ["shard=0", "shard=1", "shard=2"], (leaf, shards)
            for sh in shards:
                files = [
                    f
                    for f in os.listdir(os.path.join(leaf, sh))
                    if f.endswith(".parquet")
                ]
                assert len(files) == 1, (leaf, sh, files)
    # roundtrip: nothing lost, nothing duplicated
    back = spark.read.parquet(path)
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(200))
    # manifest counts match direct aggregation
    man = {
        (r["split"], r["lang"]): (r["n_docs"], r["n_tokens"])
        for r in co.corpus_manifest(spark, path).collect()
    }
    from pyspark.sql import functions as FF

    exp = {
        (r["split"], r["lang"]): (r["n"], r["t"])
        for r in df.groupBy("split", "lang")
        .agg(
            FF.count(FF.lit(1)).cast("long").alias("n"),
            FF.sum(FF.size(FF.split(FF.trim("text"), r"\s+"))).cast("long").alias("t"),
        )
        .collect()
    }
    assert man == exp
    # determinism: rewriting yields byte-identical shard membership
    co.write_corpus_shards(df, path, shards_per_group=3)
    again = spark.read.parquet(path)
    assert sorted(r["doc_id"] for r in again.collect()) == list(range(200))
    with pytest.raises(ValueError, match="shards_per_group"):
        co.write_corpus_shards(df, path, shards_per_group=0)
