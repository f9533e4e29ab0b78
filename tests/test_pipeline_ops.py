"""Unit tests for the LLM-pipeline operators (dedup / similarity /
text / multimodal) on small fixed fixtures with independently computed
expectations (hashlib / numpy on the driver — not the operators' own
Spark expressions).

VERDICT r1 item 5: these operators previously had zero dedicated pytest
coverage and sat outside the driver's correctness window.
"""

import hashlib
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from renkodf_spark.operators import dedup, multimodal, similarity, text

# ---------------------------------------------------------------- fixtures

D1 = "the quick brown fox jumps over the lazy dog"
D2 = "the quick brown fox jumps over the lazy cat"  # near-dup of D1
D3 = "completely different content words appear here entirely"
D4 = "too short"  # < 3 tokens: no shingles
D5 = ""  # empty text
D6 = D1  # exact duplicate of D1

DOCS = [(1, D1), (2, D2), (3, D3), (4, D4), (5, D5), (6, D6)]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def py_shingles(text: str, n: int = 3) -> set[str]:
    toks = re.split(r"\s+", text.strip())
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def py_minhash_sig(text: str, num_hashes: int, n: int = 3) -> list[str] | None:
    sh = py_shingles(text, n)
    if not sh:
        return None
    return [
        min(hashlib.md5(f"{s}:{x}".encode()).hexdigest() for x in sh)
        for s in range(num_hashes)
    ]


# ---------------------------------------------------------------- dedup


def test_exact_dedup(spark, docs_df):
    out = {r["content_hash"]: r for r in dedup.exact_dedup(docs_df).collect()}
    assert len(out) == 5  # D1==D6 collapse
    h1 = hashlib.md5(D1.encode()).hexdigest()
    assert out[h1]["keeper_id"] == 1
    assert out[h1]["n_dupes"] == 2
    h4 = hashlib.md5(D4.encode()).hexdigest()
    assert out[h4]["n_dupes"] == 1


def test_minhash_signatures_match_python(spark, docs_df):
    rows = dedup.minhash_signatures(docs_df, num_hashes=4).collect()
    got = {r["id"]: [r[f"h{s}"] for s in range(4)] for r in rows}
    # docs without shingles (D4: 2 tokens, D5: empty) have no signature row
    assert set(got) == {1, 2, 3, 6}
    for doc_id, txt in [(1, D1), (2, D2), (3, D3), (6, D6)]:
        assert got[doc_id] == py_minhash_sig(txt, 4), f"doc {doc_id}"


def test_minhash_lsh_pairs_match_python_banding(spark, docs_df):
    num_hashes, band_size = 4, 2
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            docs_df, num_hashes=num_hashes, band_size=band_size
        ).collect()
    }
    # independent replay of the banding in plain Python
    sigs = {i: py_minhash_sig(t, num_hashes) for i, t in DOCS if py_minhash_sig(t, num_hashes)}
    expected = set()
    ids = sorted(sigs)
    for i_pos, a in enumerate(ids):
        for b in ids[i_pos + 1 :]:
            for band in range(num_hashes // band_size):
                lo = band * band_size
                if sigs[a][lo : lo + band_size] == sigs[b][lo : lo + band_size]:
                    expected.add((a, b))
                    break
    assert pairs == expected
    assert (1, 6) in pairs, "identical docs must collide in every band"


def test_ngram_jaccard_values(spark, docs_df):
    pairs_df = spark.createDataFrame([(1, 2), (1, 6)], "id_a long, id_b long")
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs_df, pairs_df).collect()
    }
    sh1, sh2 = py_shingles(D1), py_shingles(D2)
    expect_12 = round(len(sh1 & sh2) / len(sh1 | sh2), 4)
    assert out[(1, 2)] == expect_12
    assert out[(1, 6)] == 1.0


def test_simhash_matches_python(spark, docs_df):
    bits = 16
    got = {r["id"]: r["simhash"] for r in dedup.simhash(docs_df, bits=bits).collect()}

    def py_simhash(txt: str) -> int:
        toks = list(dict.fromkeys(re.split(r"\s+", txt.strip())))
        hashes = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) for t in toks]
        val = 0
        for j in range(bits):
            s = sum(((h >> j) & 1) * 2 - 1 for h in hashes)
            if s > 0:
                val |= 1 << j
        return val

    for doc_id, txt in DOCS:
        assert got[doc_id] == py_simhash(txt), f"doc {doc_id}"
    assert got[1] == got[6]


def test_short_docs_do_not_crash_shingle_ops(spark):
    """ADVICE r1: sub-n-token docs used to raise
    INVALID_PARAMETER_VALUE.START in F.slice via a descending sequence."""
    shorts = spark.createDataFrame(
        [(1, "one two"), (2, "single"), (3, ""), (4, "a b c d")],
        "doc_id long, text string",
    )
    sigs = dedup.minhash_signatures(shorts, num_hashes=2)
    assert {r["id"] for r in sigs.collect()} == {4}
    assert dedup.minhash_lsh_pairs(shorts, num_hashes=2, band_size=1).count() == 0
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    jac = dedup.ngram_jaccard_pairs(shorts, pairs).collect()
    assert len(jac) == 1 and jac[0]["jaccard"] is None  # 0/0 -> null, not a crash


# ---------------------------------------------------------------- text


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a friend"),
            (2, "der hund und die katze das ist gut"),
            (3, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in text.lang_id(df).collect()}
    assert got[1]["pred_lang"] == "en"
    assert got[1]["score_en"] == 5  # the, and, the, of, a
    assert got[2]["pred_lang"] == "de"
    assert got[3]["pred_lang"] == "und"


def test_quality_score_hand_computed(spark):
    df = spark.createDataFrame([(1, "a bb ccc"), (2, "No way!! Really, stop; now. Yes!")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.quality_score(df).collect()}
    r1 = got[1]
    assert r1["n_chars_m"] == 8
    assert r1["n_words"] == 3
    assert r1["avg_word_len"] == 2.0  # (8 - 3 + 1) / 3
    assert r1["punct_ratio"] == 0.0
    assert r1["stopword_ratio"] == round(1 / 3, 4)  # 'a' is an en marker
    assert r1["quality_bucket"] == "too_short"
    r2 = got[2]
    # "No way!! Really, stop; now. Yes!" = 32 chars, 6 words, 6 punct
    assert r2["n_chars_m"] == 32
    assert r2["n_words"] == 6
    assert r2["punct_ratio"] == round(6 / 32, 4)
    assert r2["quality_bucket"] == "punct_heavy"


def test_token_counts_hand_computed(spark):
    df = spark.createDataFrame([(1, "ab 12 c!d"), (2, "hello")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in text.token_counts(df).collect()}
    assert got[1]["ws_tokens"] == 3
    assert got[1]["bpe_tokens"] == 5  # ab | 12 | c | ! | d
    assert got[2]["ws_tokens"] == 1
    assert got[2]["bpe_tokens"] == 1


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "something else")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(df).collect()}
    assert got[1] == got[2] == hashlib.md5(b"hello world").hexdigest()
    assert got[3] != got[1]


# ---------------------------------------------------------------- similarity

VECS = [
    (0, [1.0, 0.0, 0.0, 0.0], "a"),
    (1, [0.9, 0.1, 0.0, 0.0], "a"),
    (2, [0.0, 1.0, 0.0, 0.0], "a"),
    (3, [0.0, 0.0, 1.0, 0.5], "b"),
    (4, [0.0, 0.0, 0.9, 0.6], "b"),
]


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(VECS, "vec_id long, embedding array<double>, label string")


def np_cos(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_cosine_topk_exact(spark, emb_df):
    out = similarity.cosine_topk(emb_df, emb_df.filter(F.col("vec_id") == 0), k=2).collect()
    got = [(r["rank"], r["neighbor_id"], r["cos_sim"]) for r in sorted(out, key=lambda r: r["rank"])]
    # ties break by ascending neighbor_id (the operator's window order)
    sims = sorted(((-np_cos(VECS[0][1], v), i) for i, v, _ in VECS if i != 0))
    expect = [(rank + 1, i, round(-negc, 4)) for rank, (negc, i) in enumerate(sims[:2])]
    assert got == expect


def test_label_blocked_pairs(spark, emb_df):
    out = {
        (r["id_a"], r["id_b"]): (r["block"], r["cos_sim"])
        for r in similarity.label_blocked_pairs(emb_df, threshold=0.9).collect()
    }
    # within-block pairs above 0.9: (0,1) in 'a', (3,4) in 'b'; the
    # cross-block near-pair possibilities are never compared at all
    assert set(out) == {(0, 1), (3, 4)}
    assert out[(0, 1)] == ("a", round(np_cos(VECS[0][1], VECS[1][1]), 4))
    assert out[(3, 4)] == ("b", round(np_cos(VECS[3][1], VECS[4][1]), 4))


def test_rp_lsh_bucket_matches_numpy(spark, emb_df):
    n_planes, dim = 3, 4
    planes = np.array(similarity.rp_planes(n_planes, dim))
    got = {r["vec_id"]: r["bucket"] for r in
           similarity.rp_lsh_bucket(emb_df, n_planes=n_planes, dim=dim).collect()}
    for vec_id, v, _ in VECS:
        dots = planes @ np.asarray(v)
        expect = sum(1 << p for p in range(n_planes) if dots[p] > 0)
        assert got[vec_id] == expect, f"vec {vec_id}"


def test_lsh_bucket_topk_respects_buckets(spark, emb_df):
    n_planes, dim = 3, 4
    planes = np.array(similarity.rp_planes(n_planes, dim))
    buckets = {
        i: sum(1 << p for p in range(n_planes) if (planes @ np.asarray(v))[p] > 0)
        for i, v, _ in VECS
    }
    out = similarity.lsh_bucket_topk(emb_df, emb_df, k=5, n_planes=n_planes, dim=dim).collect()
    assert len(out) > 0
    for r in out:
        assert buckets[r["query_id"]] == buckets[r["neighbor_id"]], "cross-bucket pair leaked"
        expect = round(np_cos(VECS[r["query_id"]][1], VECS[r["neighbor_id"]][1]), 4)
        assert r["cos_sim"] == expect


def test_lsh_hot_bucket_cap_bounds_degenerate_corpus(spark):
    """VERDICT r2 item 6: 10k identical docs share every band bucket —
    un-capped that's an O(n^2) self-join (~400M comparisons across 8
    bands). The deterministic cap keeps the N smallest ids per bucket,
    bounding pairs at C(N,2), and lsh_bucket_stats reports the true
    (pre-cap) bucket sizes so the cap is never silent."""
    n, cap = 10_000, 50
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("the exact same document text repeated verbatim").alias("text"),
    )
    pairs = dedup.minhash_lsh_pairs(docs, max_bucket_size=cap)
    assert pairs.count() == cap * (cap - 1) // 2
    # kept ids are the smallest ones — deterministic, oracle-replayable
    assert pairs.agg(F.max("id_b")).first()[0] == cap - 1

    stats = dedup.lsh_bucket_stats(docs).collect()
    assert len(stats) == 8  # 16 hashes / band_size 2
    for r in stats:
        assert r["max_bucket"] == n
        assert r["n_over_default_cap"] == 1


def test_lsh_hot_bucket_cap_loses_neardup_recall(spark):
    """ADVICE r3: the hot-bucket cap is a recall/cost tradeoff, not a
    free bound — docs in one (band, key) bucket agree only on that
    band's hashes, so in a hot bucket of templated NEAR-dups (all texts
    distinct) docs past the cap silently lose candidate pairs that
    exact_dedup cannot recover. This pins (a) that the loss is real and
    (b) that the un-capped default returns the full pairing — the
    reason the cap is opt-in."""
    template = " ".join(f"w{i}" for i in range(50))
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(template + " uniq"), F.col("id")).alias("text"),
    )
    # every pair shares the template-dominated band buckets
    uncapped = dedup.minhash_lsh_pairs(docs)  # default: no cap
    assert uncapped.count() == 200 * 199 // 2

    capped = dedup.minhash_lsh_pairs(docs, max_bucket_size=10)
    ids_with_pairs = {
        r[0]
        for r in capped.select(F.explode(F.array("id_a", "id_b"))).distinct().collect()
    }
    lost = set(range(200)) - ids_with_pairs
    assert len(lost) >= 150, "cap should drop most docs from all buckets here"
    # and exact dedup does NOT catch them: all texts are distinct
    assert dedup.exact_dedup(docs).filter(F.col("n_dupes") > 1).count() == 0


# ---------------------------------------------------------------- multimodal


def test_multimodal_meta_deterministic(spark, docs_df):
    media = multimodal.documents_as_media(docs_df.filter(F.col("doc_id").isin(1, 4)))
    got = {r["media_id"]: r for r in multimodal.decode_image_meta(media).collect()}
    for doc_id, txt in [(1, D1), (4, D4)]:
        d = hashlib.md5(txt.encode()).hexdigest()
        r = got[doc_id]
        assert r["media_type"] == "image/fake"
        assert r["n_bytes"] == len(txt.encode())
        assert r["digest"] == d
        assert r["format"] == "unknown"
        assert r["width"] == int(d[0:2], 16) + 1
        assert r["height"] == int(d[2:4], 16) + 1


def test_image_header_parsing_all_formats():
    """Pure-python check of the struct-based header parsers against the
    synthetic payload builders, plus truncation/garbage robustness."""
    cases = [
        (multimodal.synth_png, "png"),
        (multimodal.synth_gif, "gif"),
        (multimodal.synth_bmp, "bmp"),
        (multimodal.synth_jpeg, "jpeg"),
    ]
    for fn, fmt in cases:
        for w, h in [(1, 1), (7, 200), (640, 480), (65535, 65535)]:
            assert multimodal.parse_image_header(fn(w, h)) == (fmt, w, h)
        # truncated below any format's minimal header -> None, never a crash
        payload = fn(64, 48)
        for cut in range(9):
            assert multimodal.parse_image_header(payload[:cut]) is None
    assert multimodal.parse_image_header(b"just some text bytes") is None
    assert multimodal.parse_image_header(b"\xff\xd8\xff\xd9") is None  # JPEG, no SOF
    # BMP top-down (negative height) normalizes to abs
    import struct as _s

    bmp = (
        b"BM" + _s.pack("<IHHI", 54, 0, 0, 54) + _s.pack("<Iii", 40, 33, -44) + _s.pack("<HH", 1, 24)
    )
    assert multimodal.parse_image_header(bmp) == ("bmp", 33, 44)


def test_synthetic_media_roundtrip(spark):
    """decode_image_meta over synthetic_media recovers exactly the
    (format, width, height) the id arithmetic prescribes."""
    ids = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    meta = multimodal.decode_image_meta(multimodal.synthetic_media(ids)).collect()
    assert len(meta) == 40
    fmts = ["png", "gif", "bmp", "jpeg"]
    for r in meta:
        i = r["media_id"]
        assert r["format"] == fmts[i % 4]
        assert r["width"] == i % 200 + 1
        assert r["height"] == i * 7 % 200 + 1
        assert r["media_type"] == f"image/{fmts[i % 4]}"


def test_sniffing_gated_on_media_type(spark):
    """ADVICE r3: a text payload whose bytes start with an image magic
    ('BM', 'GIF89a') must NOT parse as an image when its declared
    media_type says it isn't one — documents_as_media marks payloads
    'image/fake', so they always take the md5-pseudo-metadata path."""
    texts = ["BM this text opens like a bitmap header padded long enough",
             "GIF89a pretender that is really prose and not pixels at all"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = multimodal.decode_image_meta(multimodal.documents_as_media(docs)).collect()
    for r in got:
        d = hashlib.md5(texts[r["media_id"]].encode()).hexdigest()
        assert r["format"] == "unknown"
        assert (r["width"], r["height"]) == (int(d[0:2], 16) + 1, int(d[2:4], 16) + 1)
    # but the same bytes with a declared image type DO get sniffed
    bm_payload = multimodal.synth_bmp(12, 34)
    media = spark.createDataFrame(
        [(0, "image/bmp", bytearray(bm_payload))], multimodal.MEDIA_SCHEMA
    )
    r = multimodal.decode_image_meta(media).collect()[0]
    assert (r["format"], r["width"], r["height"]) == ("bmp", 12, 34)


def test_multimodal_unknown_payloads_report_status(spark, docs_df):
    """r10: the former NotImplementedError stubs are real decoders now
    — text-as-bytes payloads flow through them as per-row 'unsupported'
    statuses (pixels) and zero rows (frames), never exceptions."""
    media = multimodal.documents_as_media(docs_df)
    rows = multimodal.decode_image_pixels(media).collect()
    assert rows and all(r["status"].startswith("unsupported") for r in rows)
    assert multimodal.frame_sample(media).count() == 0


# ---------------------------------------------------------------- sketches


def test_hll_sketches_merge_without_rescan(spark):
    """Mergeable-sketch property: per-group HLL sketches merged via
    hll_union_agg give (approximately) the global distinct count with
    no second pass over the raw data, and a coarser rollup of the
    sketch column matches re-sketching at that granularity."""
    from pyspark.sql import functions as F

    from renkodf_spark.functions import sketches

    df = spark.range(20_000).select(
        (F.col("id") % 4).alias("g"),
        (F.col("id") % 2).alias("g2"),
        (F.col("id") % 5000).alias("v"),  # 5000 distinct values overall
    )
    per = sketches.group_sketches(df, "g", "v")
    assert per.count() == 4
    for r in per.collect():
        assert abs(r["estimate"] - 1250) <= 1250 * 0.1  # ids mod 4 x mod 5000
    total = sketches.rollup_sketches(per).collect()[0]["estimate"]
    assert abs(total - 5000) <= 5000 * 0.1
    # rollup to a coarser key using only the sketch column
    per2 = df.withColumn("grp", F.col("g") % 2).select("grp", "v")
    direct = {
        r["grp"]: r["estimate"]
        for r in sketches.group_sketches(per2, "grp", "v").collect()
    }
    merged = {
        r["grp"]: r["estimate"]
        for r in sketches.rollup_sketches(
            per.withColumn("grp", F.col("g") % 2), "grp"
        ).collect()
    }
    assert direct == merged  # identical sketches -> identical estimates


# ---------------------------------------------------------------- IVF ANN


def test_embedding_centroids_match_numpy(spark, emb_df):
    out = {
        r["cell"]: (r["centroid"], r["n_vectors"])
        for r in similarity.embedding_centroids(emb_df, dim=4).collect()
    }
    assert set(out) == {"a", "b"}
    for lbl in ("a", "b"):
        vs = np.array([v for i, v, l in VECS if l == lbl])
        cent, n = out[lbl]
        assert n == len(vs)
        assert np.allclose(cent, vs.mean(axis=0))


def np_ivf_assign(vecs, cents, round_digits=6):
    """Replay nearest_centroid's rounded argmax (ties -> smallest cell)."""
    out = {}
    for vid, v, _ in vecs:
        keyed = sorted(
            (-round(np_cos(v, c), round_digits), cell) for cell, c in cents.items()
        )
        out[vid] = keyed[0][1]
    return out


def test_nearest_centroid_routing_layout_independent(spark, emb_df):
    cents_df = similarity.embedding_centroids(emb_df, dim=4)
    cents = {
        r["cell"]: np.array(r["centroid"]) for r in cents_df.collect()
    }
    expect = np_ivf_assign(VECS, cents)
    got = {}
    for nparts in (1, 4):
        assigned = similarity.nearest_centroid(
            emb_df.repartition(nparts), cents_df
        ).collect()
        got[nparts] = {r["id"]: r["cell"] for r in assigned}
        assert got[nparts] == expect, f"nparts={nparts}"
    assert got[1] == got[4]


def test_nearest_centroid_plan_corpus_never_shuffles(spark, emb_df):
    """The corpus side of the assignment must stream: with a literal
    centroid table the whole plan is one global-agg exchange (packing
    centroids into the single broadcast row) + the broadcast itself —
    the corpus reaches its argmax through zero data exchanges."""
    from renkodf_spark.plans.audit import plan_summary

    cents_df = spark.createDataFrame(
        [("a", [1.0, 0.0, 0.0, 0.0]), ("b", [0.0, 0.0, 1.0, 0.5])],
        "cell string, centroid array<double>",
    )
    s = plan_summary(similarity.nearest_centroid(emb_df, cents_df))
    assert s.exchanges == 2 and s.nested_loop_joins == 1 and s.python_nodes == 0, str(s)


def test_ivf_topk_within_cell_matches_bruteforce(spark, emb_df):
    cents_df = similarity.embedding_centroids(emb_df, dim=4)
    cents = {r["cell"]: np.array(r["centroid"]) for r in cents_df.collect()}
    cell_of = np_ivf_assign(VECS, cents)
    out = similarity.ivf_topk(emb_df, emb_df, cents_df, k=3).collect()
    # expected: per query, brute-force cosine over same-cell neighbors
    expect = []
    for qid, qv, _ in VECS:
        same = sorted(
            (-round(np_cos(qv, v), 10), nid)
            for nid, v, _ in VECS
            if nid != qid and cell_of[nid] == cell_of[qid]
        )
        expect += [
            (qid, nid, rank + 1, round(-negc, 4))
            for rank, (negc, nid) in enumerate(same[:3])
        ]
    got = sorted((r["query_id"], r["neighbor_id"], r["rank"], r["cos_sim"]) for r in out)
    assert got == sorted(expect)


def test_train_ivf_centroids_layout_independent_and_partitions(spark, emb_df):
    """Unlabeled IVF training must be a pure function of the data: the
    same (cell, centroid, n_vectors) set on any partition layout, cells
    partitioning the corpus, and every member closer (rounded argmax)
    to its own cell's centroid than to any other."""
    a = similarity.train_ivf_centroids(emb_df, dim=4, n_planes=2, iters=2)
    b = similarity.train_ivf_centroids(emb_df.repartition(5), dim=4, n_planes=2, iters=2)
    rows_a = sorted(
        (r["cell"], tuple(r["centroid"]), r["n_vectors"]) for r in a.collect()
    )
    rows_b = sorted(
        (r["cell"], tuple(r["centroid"]), r["n_vectors"]) for r in b.collect()
    )
    assert rows_a == rows_b
    assert sum(n for _, _, n in rows_a) == len(VECS)  # cells partition the corpus
    # each final centroid must be the (rounded) mean of the members that
    # produced it: replay the full seed -> assign -> mean chain in numpy
    planes = np.array(similarity.rp_planes(2, 4))
    seed_of = {
        vid: sum(1 << p for p in range(2) if np.dot(planes[p], v) > 0)
        for vid, v, _ in VECS
    }
    cents = {
        c: np.array([round(x, 6) + 0.0 for x in np.mean([v for vid, v, _ in VECS if seed_of[vid] == c], axis=0)])
        for c in set(seed_of.values())
    }
    for _ in range(2):
        assign = np_ivf_assign(VECS, cents)
        cents = {
            c: np.array([round(x, 6) + 0.0 for x in np.mean([v for vid, v, _ in VECS if assign[vid] == c], axis=0)])
            for c in set(assign.values())
        }
    expect = sorted(
        (c, tuple(v), sum(1 for a in assign.values() if a == c)) for c, v in cents.items()
    )
    assert rows_a == expect


# ------------------------------------------------------ repetition signals


def test_repetition_signals_known_repeats(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    out = {
        (r["doc_id"], r["n"]): r
        for r in text.repetition_signals(df, ngram_ns=(2, 3)).collect()
    }
    assert set(out) == {(1, 2), (1, 3), (2, 2), (2, 3), (3, 2), (3, 3)}
    r = out[(1, 2)]  # grams: "a b" x3, "b a" x2
    assert (r["total_ngrams"], r["distinct_ngrams"]) == (5, 2)
    assert r["dup_ngram_frac"] == round(1 - 2 / 5, 6)
    assert (r["top_gram"], r["top_count"]) == ("a b", 3)
    assert r["top_gram_char_frac"] == round(3 * 3 / 11, 6)
    r = out[(1, 3)]  # "a b a" x2 ties "b a b" x2 -> lexicographic min
    assert (r["top_gram"], r["top_count"]) == ("a b a", 2)
    assert r["dup_ngram_frac"] == 0.5
    for doc in (2, 3):  # too short for any n-gram: zero totals, null fracs
        for n in (2, 3):
            r = out[(doc, n)]
            assert (r["total_ngrams"], r["distinct_ngrams"]) == (0, 0)
            assert r["dup_ngram_frac"] is None and r["top_gram"] is None


# ------------------------------------------------------- int8 quantization


def test_quantize_embeddings_matches_numpy(spark, emb_df):
    out = {r["id"]: r["qvec"] for r in similarity.quantize_embeddings(emb_df).collect()}
    for vid, v, _ in VECS:
        expect = [int(np.floor(np.clip(x, -1, 1) * 127 + 0.5)) if x >= 0
                  else -int(np.floor(-np.clip(x, -1, 1) * 127 + 0.5)) for x in v]
        assert out[vid] == expect, f"vec {vid}"
    # clamping: out-of-range components saturate at +-127
    big = spark.createDataFrame(
        [(9, [2.0, -3.0, 0.5, 0.0], "z")],
        "vec_id long, embedding array<double>, label string",
    )
    assert similarity.quantize_embeddings(big).collect()[0]["qvec"] == [127, -127, 64, 0]


def test_ivf_topk_n_probe_recall(spark, emb_df):
    """n_probe widens the searched cells: probe-2 results must be a
    superset-or-equal ranking vs probe-1, and with n_probe = n_cells
    IVF equals exact brute force."""
    cents_df = similarity.embedding_centroids(emb_df, dim=4)
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.cosine_topk(emb_df, emb_df, k=4).collect()
    }
    full_probe = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.ivf_topk(emb_df, emb_df, cents_df, k=4, n_probe=2).collect()
    }
    assert full_probe == exact  # 2 cells total: probing both == exact
    p1 = similarity.ivf_topk(emb_df, emb_df, cents_df, k=4, n_probe=1).collect()
    p1_pairs = {(r["query_id"], r["neighbor_id"]) for r in p1}
    assert p1_pairs <= {(q, n) for (q, _), n in full_probe.items()} | {
        (q, n) for (q, n) in p1_pairs
    }
    # probe-1 searches a subset of cells, so it can't return MORE rows
    assert len(p1) <= len(full_probe)


# ----------------------------------------------------------------- TF-IDF


def test_tfidf_top_terms_matches_math(spark):
    import math

    df = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "apple")],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"], r["score"])
        for r in text.tfidf_top_terms(df, k=2).collect()
    }
    idf = lambda dfreq: math.log(4 / (dfreq + 1)) + 1  # N=3, smoothed
    assert out[(1, 1)] == ("apple", 2, 2, round(2 * idf(2), 6))
    assert out[(1, 2)] == ("banana", 1, 2, round(1 * idf(2), 6))
    assert out[(2, 1)] == ("cherry", 1, 1, round(1 * idf(1), 6))  # rarer wins
    assert out[(2, 2)] == ("banana", 1, 2, round(1 * idf(2), 6))
    assert out[(3, 1)] == ("apple", 1, 2, round(1 * idf(2), 6))
    assert (3, 2) not in out  # only one term in doc 3


def test_edit_distance_verify(spark, docs_df):
    pairs = spark.createDataFrame(
        [(1, 2), (1, 6), (4, 5)], "id_a long, id_b long"
    )
    out = {
        (r["id_a"], r["id_b"]): (r["edit_dist"], r["edit_sim"])
        for r in dedup.edit_distance_verify(docs_df, pairs).collect()
    }
    # D1 vs D2 differ only in 'dog' -> 'cat': distance 3
    assert out[(1, 2)] == (3, round(1 - 3 / len(D1), 4))
    assert out[(1, 6)] == (0, 1.0)  # exact duplicates
    # D4='too short' vs D5='': distance = len(D4), similarity 0
    assert out[(4, 5)] == (len(D4), 0.0)


def test_incremental_lsh_equals_filtered_full_pairs(spark, docs_df):
    full = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(docs_df, max_bucket_size=None).collect()
    }
    split = 4
    nb = dedup.band_table(docs_df.filter(F.col("doc_id") >= split))
    ob = dedup.band_table(docs_df.filter(F.col("doc_id") < split))
    incr = {
        (r["id_a"], r["id_b"])
        for r in dedup.incremental_lsh_pairs(nb, ob).collect()
    }
    assert incr == {(a, b) for a, b in full if b >= split}
    assert (1, 6) in incr  # D6 duplicates D1 across the split boundary
    # without within-new pairs, only cross-boundary candidates remain
    cross_only = {
        (r["id_a"], r["id_b"])
        for r in dedup.incremental_lsh_pairs(nb, ob, include_within_new=False).collect()
    }
    assert cross_only == {(a, b) for a, b in incr if a < split <= b}


# ---------------------------------------------------------- empty inputs


def test_all_pipeline_operators_handle_empty_inputs(spark):
    """Every pipeline operator must return an empty, well-schemaed
    DataFrame on 0-row input — a daily increment can legitimately be
    empty, and a scheduled pipeline must not crash on it."""
    from renkodf_spark.operators import corpus

    edocs = spark.createDataFrame([], "doc_id long, text string")
    eemb = spark.createDataFrame([], "vec_id long, embedding array<double>, label string")
    epairs = spark.createDataFrame([], "id_a long, id_b long")
    echunks = spark.createDataFrame([], "doc_id long, chunk_id long, n_tokens long")
    elabels = spark.createDataFrame([], "id long, cluster_id long")  # cluster_labels schema
    cents = spark.createDataFrame(
        [("a", [1.0, 0.0, 0.0, 0.0])], "cell string, centroid array<double>"
    )

    cases = {
        "exact_dedup": lambda: dedup.exact_dedup(edocs),
        "minhash_signatures": lambda: dedup.minhash_signatures(edocs),
        "minhash_lsh_pairs": lambda: dedup.minhash_lsh_pairs(edocs),
        "simhash": lambda: dedup.simhash(edocs),
        "band_table": lambda: dedup.band_table(edocs),
        "incremental_lsh_pairs": lambda: dedup.incremental_lsh_pairs(
            dedup.band_table(edocs), dedup.band_table(edocs)
        ),
        "ngram_jaccard_pairs": lambda: dedup.ngram_jaccard_pairs(edocs, epairs),
        "edit_distance_verify": lambda: dedup.edit_distance_verify(edocs, epairs),
        "cluster_labels": lambda: dedup.cluster_labels(edocs, epairs),
        "lang_id": lambda: text.lang_id(edocs),
        "quality_score": lambda: text.quality_score(edocs),
        "token_counts": lambda: text.token_counts(edocs),
        "fingerprint": lambda: text.fingerprint(edocs),
        "repetition_signals": lambda: text.repetition_signals(edocs),
        "tfidf_top_terms": lambda: text.tfidf_top_terms(edocs),
        "chunk_documents": lambda: corpus.chunk_documents(edocs),
        "redact_pii": lambda: corpus.redact_pii(edocs),
        "hash_split": lambda: corpus.hash_split(edocs),
        "quota_sample": lambda: corpus.quota_sample(
            text.lang_id(edocs).select("doc_id", "pred_lang"), "pred_lang", per_group=5
        ),
        "pack_sequences": lambda: corpus.pack_sequences(echunks),
        "dedup_filter": lambda: corpus.dedup_filter(edocs, elabels),
        "cosine_topk": lambda: similarity.cosine_topk(eemb, eemb),
        "label_blocked_pairs": lambda: similarity.label_blocked_pairs(eemb),
        "lsh_bucket_topk": lambda: similarity.lsh_bucket_topk(eemb, eemb, dim=4),
        "embedding_centroids": lambda: similarity.embedding_centroids(eemb, dim=4),
        "nearest_centroid": lambda: similarity.nearest_centroid(eemb, cents),
        "ivf_topk": lambda: similarity.ivf_topk(eemb, eemb, cents),
        "quantize_embeddings": lambda: similarity.quantize_embeddings(eemb),
        # round-5 additions
        "quota_admitted": lambda: corpus.quota_admitted(
            text.lang_id(edocs).select("doc_id", "pred_lang"), "pred_lang", per_group=5
        ),
        "rate_sample": lambda: corpus.rate_sample(edocs, 0.5),
        "assemble_bins": lambda: corpus.assemble_bins(
            corpus.pack_sequences(
                spark.createDataFrame(
                    [], "doc_id long, chunk_id long, n_tokens long, chunk_text string"
                )
            )
        ),
        "train_ivf_centroids": lambda: similarity.train_ivf_centroids(
            eemb, dim=4, n_planes=2, iters=1
        ),
        # round-7 phase-3 additions
        "gopher_rules": lambda: text.gopher_rules(edocs),
        "build_vocab": lambda: text.build_vocab(edocs),
        "encode_with_vocab": lambda: text.encode_with_vocab(
            edocs, text.build_vocab(edocs)
        ),
        "line_doc_frequencies": lambda: corpus.line_doc_frequencies(edocs),
        "remove_boilerplate_lines": lambda: corpus.remove_boilerplate_lines(edocs),
    }
    failures = {}
    for name, build in cases.items():
        try:
            df = build()
            assert len(df.columns) > 0
            assert df.count() == 0, f"{name}: expected 0 rows"
        except AssertionError as e:
            failures[name] = str(e)
        except Exception as e:  # noqa: BLE001 - collecting all failures
            failures[name] = f"{type(e).__name__}: {e}"
    assert not failures, failures


# ---------------------------------------------------- persisted IVF index


def test_ivf_index_parity_and_partition_pruning(spark, emb_df, tmp_path):
    """write_ivf_index + ivf_topk_indexed must return exactly ivf_topk's
    results with the same centroids, and the indexed read must touch
    only the probed cells' partitions (static partition pruning)."""
    cents = similarity.embedding_centroids(emb_df, dim=4)
    path = str(tmp_path / "ivf_index")
    similarity.write_ivf_index(emb_df, cents, path)

    direct = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["cos_sim"])
        for r in similarity.ivf_topk(emb_df, emb_df, cents, k=3).collect()
    }
    q1 = emb_df.limit(2)
    indexed_all = similarity.ivf_topk_indexed(spark, path, emb_df, k=3)
    got = {
        (r["query_id"], r["neighbor_id"], r["rank"], r["cos_sim"])
        for r in indexed_all.collect()
    }
    assert got == direct

    # pruning: the probed-cell set must reach the index scan as a
    # DYNAMIC partition filter (reusing the query-side broadcast) —
    # no driver collect builds a static IN list, and no job runs at
    # plan time (VERDICT r5 item 4)
    one = similarity.ivf_topk_indexed(spark, path, q1, n_probe=1)
    plan = one._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[[^\]]*dynamicpruning", plan)
    assert m, plan


def test_hard_negative_indexed_parity_and_dynamic_pruning(spark, emb_df, tmp_path):
    """hard_negative_mining_ann_indexed over a write_ivf_index layout
    (r10): identical results to the in-line ANN miner, and the index
    scan is dynamically pruned to the anchors' probed cells (the
    ivf_topk_indexed DPP rule — no driver collect, no job at plan
    time)."""
    cents = similarity.embedding_centroids(emb_df, dim=4)
    path = str(tmp_path / "hn_ivf")
    similarity.write_ivf_index(emb_df, cents, path, carry=("label",))

    anchors = emb_df.filter(F.col("vec_id") % 2 == 0)
    direct = {
        tuple(r)
        for r in similarity.hard_negative_mining_ann(
            emb_df, anchors, cents, k=3, n_probe=2
        ).collect()
    }
    mined = similarity.hard_negative_mining_ann_indexed(
        spark, path, anchors, k=3, n_probe=2
    )
    assert {tuple(r) for r in mined.collect()} == direct

    one = similarity.hard_negative_mining_ann_indexed(
        spark, path, anchors.limit(2), k=3, n_probe=1
    )
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*dynamicpruning", plan), plan

    # the shuffle fallback returns the same rows
    sh = similarity.hard_negative_mining_ann_indexed(
        spark, path, anchors, k=3, n_probe=2, broadcast_anchors=False
    )
    assert {tuple(r) for r in sh.collect()} == direct


def test_hard_negative_bucketed_index_parity_and_zero_corpus_exchange(spark, emb_df):
    """write_ivf_index_bucketed + hard_negative_mining_ann_bucketed
    (r10, the repeated-mining / unbounded-anchor shape): results must be
    identical to the in-line ANN miner with the same centroids, and the
    candidate join must read the corpus straight out of its cell buckets
    — a SortMergeJoin where the ONLY vector-bearing exchange is the
    anchors' probe rows; the corpus vectors cross zero exchanges."""
    import shutil

    from renkodf_spark.plans import shuffle_inputs

    cents = similarity.embedding_centroids(emb_df, dim=4)
    spark.sql("DROP TABLE IF EXISTS hn_ivf_b")
    spark.sql("DROP TABLE IF EXISTS hn_ivf_b__centroids")
    for orphan in ("hn_ivf_b", "hn_ivf_b__centroids"):
        shutil.rmtree(f"/tmp/renkodf-spark-test-warehouse/{orphan}", ignore_errors=True)
    similarity.write_ivf_index_bucketed(
        emb_df, cents, "hn_ivf_b", n_buckets=4, carry=("label",)
    )

    anchors = emb_df.filter(F.col("vec_id") % 2 == 0)
    direct = {
        tuple(r)
        for r in similarity.hard_negative_mining_ann(
            emb_df, anchors, cents, k=3, n_probe=2
        ).collect()
    }
    mined = similarity.hard_negative_mining_ann_bucketed(
        spark, "hn_ivf_b", anchors, k=3, n_probe=2
    )
    assert {tuple(r) for r in mined.collect()} == direct

    plan = mined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan and "CartesianProduct" not in plan
    vec_shuffles = {
        tuple(cols) for cols in shuffle_inputs(mined) if {"cvec", "avec"} & set(cols)
    }
    # r14: the anchor side also carries its precomputed norm (__an);
    # the corpus side still crosses ZERO exchanges (no cvec tuple here)
    assert vec_shuffles == {
        ("anchor_id", "avec", "__alabel", "cell", "__an")
    }, vec_shuffles


# ------------------------------------------------------- unigram LM quality


def test_unigram_logprob_exact_micros(spark):
    from renkodf_spark.operators import text as text_ops
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in text_ops.unigram_logprob(df).collect()}
    # corpus: a:2 b:2 c:1 -> T=5, V=3, alpha=1
    lp_a = round(math.log(3 / 8) * 1e6)  # == lp_b
    lp_c = round(math.log(2 / 8) * 1e6)
    assert out[1].n_tokens == 3
    assert out[1].sum_logp_micros == 3 * lp_a
    assert out[2].sum_logp_micros == lp_a + lp_c
    assert out[2].avg_logp == pytest.approx((lp_a + lp_c) / 2e6, abs=1e-6)


def test_unigram_logprob_layout_independent(spark):
    from renkodf_spark.operators import text as text_ops

    rows = [(i, f"w{i % 7} w{i % 3} common") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = text_ops.unigram_logprob(df).orderBy("doc_id").collect()
    b = text_ops.unigram_logprob(df.repartition(13)).orderBy("doc_id").collect()
    # integer micro-nat sums are exact under any partial-agg order
    assert [(r.doc_id, r.sum_logp_micros) for r in a] == [
        (r.doc_id, r.sum_logp_micros) for r in b
    ]


def test_unigram_logprob_rejects_bad_alpha(spark):
    from renkodf_spark.operators import text as text_ops

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="alpha must be positive"):
        text_ops.unigram_logprob(df, alpha=0)


# ---------------------------------------------------------- semantic dedup


def _sem_fixture(spark):
    from pyspark.sql import Row

    emb = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.999, 0.01]),  # near-dup of 1
            Row(vec_id=3, embedding=[0.7, 0.7]),  # routes to cell 0 on tie
            Row(vec_id=4, embedding=[0.0, 1.0]),
        ]
    )
    cents = spark.createDataFrame(
        [Row(cell=0, centroid=[1.0, 0.0]), Row(cell=1, centroid=[0.0, 1.0])]
    )
    return emb, cents


def test_semantic_dedup_drops_higher_id_neighbor(spark):
    from renkodf_spark.operators import similarity

    emb, cents = _sem_fixture(spark)
    kept = similarity.semantic_dedup(emb, cents, threshold=0.95).collect()
    assert sorted((r.vec_id, r.cell) for r in kept) == [(1, 0), (3, 0), (4, 1)]


def test_semantic_dedup_threshold_is_inclusive_on_rounded_cos(spark):
    import math

    from pyspark.sql import Row

    from renkodf_spark.operators import similarity

    emb = spark.createDataFrame(
        [
            Row(vec_id=1, embedding=[1.0, 0.0]),
            Row(vec_id=2, embedding=[0.5, math.sqrt(3) / 2]),  # cos = 0.5 exactly
        ]
    )
    cents = spark.createDataFrame([Row(cell=0, centroid=[1.0, 0.0])])
    at = similarity.semantic_dedup(emb, cents, threshold=0.5).collect()
    assert sorted(r.vec_id for r in at) == [1]  # 2 dropped at the boundary
    above = similarity.semantic_dedup(emb, cents, threshold=0.500001).collect()
    assert sorted(r.vec_id for r in above) == [1, 2]


def test_semantic_dedup_layout_independent(spark):
    from renkodf_spark.operators import similarity

    emb, cents = _sem_fixture(spark)
    a = similarity.semantic_dedup(emb, cents, threshold=0.95).collect()
    b = similarity.semantic_dedup(emb.repartition(5), cents, threshold=0.95).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ------------------------------------------------------ product quantization


def _pq_fixture(spark):
    from pyspark.sql import Row

    # dim=4, m=2 (dsub=2); two groups with obvious subspace structure
    emb = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0, 0.0, 1.0], label=0),
            Row(vec_id=1, embedding=[1.0, 0.2, 0.2, 1.0], label=0),
            Row(vec_id=2, embedding=[0.0, 1.0, 1.0, 0.0], label=1),
            Row(vec_id=3, embedding=[0.2, 1.0, 1.0, 0.2], label=1),
        ]
    )
    return emb


def test_pq_codebooks_are_subspace_means(spark):
    from renkodf_spark.operators import pq

    books = pq.pq_codebooks(_pq_fixture(spark), dim=4, m=2).collect()
    got = {(r.sub, r.code): (r.subcentroid, r.n_vectors) for r in books}
    assert got[(0, 0)] == ([1.0, 0.1], 2)
    assert got[(1, 0)] == ([0.1, 1.0], 2)
    assert got[(0, 1)] == ([0.1, 1.0], 2)
    assert got[(1, 1)] == ([1.0, 0.1], 2)


def test_pq_encode_assigns_nearest_code(spark):
    from renkodf_spark.operators import pq

    emb = _pq_fixture(spark)
    books = pq.pq_codebooks(emb, dim=4, m=2)
    codes = {r.id: r.codes for r in pq.pq_encode(emb, books, dim=4, m=2).collect()}
    # group-0 vectors encode as [0, 0]; group-1 vectors as [1, 1]
    assert codes[0] == [0, 0] and codes[1] == [0, 0]
    assert codes[2] == [1, 1] and codes[3] == [1, 1]


def test_pq_adc_scores_are_exact_lut_sums(spark):
    from renkodf_spark.operators import pq

    emb = _pq_fixture(spark)
    books = pq.pq_codebooks(emb, dim=4, m=2)
    codes = pq.pq_encode(emb, books, dim=4, m=2)
    out = pq.pq_adc_topk(codes, emb.filter("vec_id = 0"), books, dim=4, m=2, k=3).collect()
    # query 0 = [1,0,0,1]: LUT[s0][c0] = <(1,0),(1,0.1)> = 1.0 -> 1_000_000
    # LUT[s1][c0] = <(0,1),(0.1,1)> = 1.0; LUT[s0][c1] = <(1,0),(0.1,1)> = 0.1
    # LUT[s1][c1] = <(0,1),(1,0.1)> = 0.1
    got = {r.neighbor_id: (r.rank, r.score_micros) for r in out}
    assert got[1] == (1, 2_000_000)  # codes [0,0]
    # neighbors 2, 3 (codes [1,1]): 0.1 + 0.1 -> 200_000; tie broken by id
    assert got[2] == (2, 200_000) and got[3] == (3, 200_000)


def test_pq_validation_and_layout_independence(spark):
    import pytest as _pytest

    from renkodf_spark.operators import pq

    emb = _pq_fixture(spark)
    with _pytest.raises(ValueError, match="divisible"):
        pq.pq_codebooks(emb, dim=4, m=3)
    with _pytest.raises(ValueError, match="k must be positive"):
        pq.pq_adc_topk(None, None, None, dim=4, m=2, k=0)
    books = pq.pq_codebooks(emb, dim=4, m=2)
    a = pq.pq_encode(emb, books, dim=4, m=2).collect()
    b = pq.pq_encode(emb.repartition(7), books, dim=4, m=2).collect()
    assert sorted((r.id, tuple(r.codes)) for r in a) == sorted(
        (r.id, tuple(r.codes)) for r in b
    )


# ------------------------------------------------------------ gopher rules


def test_gopher_rules_features_match_python(spark):
    docs = [
        (1, "the cat ran to the hill and sat there with a dog now"),
        (2, "- bullet one\n- bullet two\nplain line ends here..."),
        (3, "## code ## symbols ## here … and more… trailing"),
        (4, "1234 5678 %% && !!"),
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in text.gopher_rules(df).collect()}

    for doc_id, t in docs:
        toks = re.split(r"\s+", t.strip())
        lines = t.split("\n")
        r = out[doc_id]
        assert r.n_words == len(toks)
        assert r.avg_word_len == round(sum(len(w) for w in toks) / len(toks), 6)
        symbols = t.count("#") + t.count("...") + t.count("…")
        assert r.symbol_word_ratio == round(symbols / len(toks), 6)
        assert r.bullet_line_frac == round(
            sum(bool(re.match(r"^\s*[-*•]", ln)) for ln in lines) / len(lines), 6
        )
        assert r.ellipsis_line_frac == round(
            sum(bool(re.search(r"(\.\.\.|…)\s*$", ln)) for ln in lines) / len(lines), 6
        )
        assert r.alpha_word_frac == round(
            sum(bool(re.search("[A-Za-z]", w)) for w in toks) / len(toks), 6
        )
        assert r.stopword_hits == sum(w in toks for w in text.GOPHER_STOPWORDS)


def test_gopher_rules_each_threshold_trips(spark):
    base = "the words keep flowing here with good shape and real text today fine"
    cases = {
        1: (base, 1),  # healthy: 13 words, stopwords the/with/and
        2: ("the and with", 0),  # too few words
        3: ("a b c d e f g h i j k l m the of", 0),  # mean word len < 3
        4: (" ".join(["the and with okay fine"] + ["##"] * 9), 0),  # symbols
        5: ("nice long words entirely missing stopwords here today", 0),
    }
    df = spark.createDataFrame(
        [(k, v[0]) for k, v in cases.items()], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.gopher_pass
        for r in text.gopher_rules(df, min_words=10, min_stop_hits=2).collect()
    }
    assert out == {k: v[1] for k, v in cases.items()}


# ----------------------------------------------------- vocab build + encode


def test_build_vocab_order_ties_and_truncation(spark):
    df = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a d c")], "doc_id long, text string"
    )
    # counts: a=3, b=3, c=2, d=1; ties break lexicographically
    rows = text.build_vocab(df, size=3).orderBy("token_id").collect()
    assert [(r.term, r.cnt, r.token_id) for r in rows] == [
        ("a", 3, 0),
        ("b", 3, 1),
        ("c", 2, 2),
    ]
    assert text.build_vocab(df, size=100).count() == 4  # no padding
    with pytest.raises(ValueError):
        text.build_vocab(df, size=0)


def test_build_vocab_min_count(spark):
    df = spark.createDataFrame([(1, "a a b")], "doc_id long, text string")
    rows = text.build_vocab(df, size=10, min_count=2).collect()
    assert [(r.term, r.token_id) for r in rows] == [("a", 0)]


def test_encode_with_vocab_order_and_unk(spark):
    df = spark.createDataFrame(
        [(1, "b a zz a"), (2, "zz yy")], "doc_id long, text string"
    )
    vocab = text.build_vocab(df, size=2)  # counts: a=2, zz=2, b=1, yy=1 -> a=0, zz=1
    out = {r.doc_id: r for r in text.encode_with_vocab(df, vocab, unk_id=-1).collect()}
    assert out[1].token_ids == [-1, 0, 1, 0]
    assert (out[1].n_tokens, out[1].n_unk) == (4, 1)
    assert out[2].token_ids == [1, -1]
    assert (out[2].n_tokens, out[2].n_unk) == (2, 1)


def test_encode_with_vocab_layout_independent(spark):
    rows = [(i, f"w{i % 5} w{(i + 1) % 7} w{i % 3} common") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = text.build_vocab(df, size=6)
    a = text.encode_with_vocab(df.repartition(1), vocab)
    b = text.encode_with_vocab(df.repartition(13, "doc_id"), vocab)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ivfpq_probe_all_equals_plain_adc(spark):
    """With every cell probed, IVF routing prunes nothing and IVF-PQ
    must reproduce plain PQ ADC exactly (same scores, same ranks)."""
    from renkodf_spark.operators import pq

    emb = _pq_fixture(spark)
    cents = similarity.embedding_centroids(emb, dim=4)
    books = pq.pq_codebooks(emb, dim=4, m=2)
    q = emb.filter(F.col("vec_id") < 2)
    full = pq.ivfpq_topk(emb, q, cents, books, dim=4, m=2, k=4, n_probe=2)
    codes = pq.pq_encode(emb, books, dim=4, m=2)
    plain = pq.pq_adc_topk(codes, q, books, dim=4, m=2, k=4)
    assert sorted(map(tuple, full.collect())) == sorted(map(tuple, plain.collect()))


def test_ivfpq_neighbors_come_only_from_probed_cells(spark):
    from renkodf_spark.operators import pq
    from renkodf_spark.operators.similarity import _probe_cells, nearest_centroid

    emb = _pq_fixture(spark)
    cents = similarity.embedding_centroids(emb, dim=4)
    books = pq.pq_codebooks(emb, dim=4, m=2)
    q = emb.filter(F.col("vec_id") == 0)
    out = pq.ivfpq_topk(emb, q, cents, books, dim=4, m=2, k=5, n_probe=1)
    probed = {
        r.cell
        for r in _probe_cells(
            q, cents, id_col="vec_id", vec_col="embedding", n_probe=1, round_digits=6
        ).collect()
    }
    corpus_cells = {r.id: r.cell for r in nearest_centroid(emb, cents).collect()}
    neighbors = [r.neighbor_id for r in out.collect()]
    assert neighbors  # the probed cell is non-trivial
    assert all(corpus_cells[n] in probed for n in neighbors)
    # vec 0 (cell 0 with n_probe=1) must not see the cell-1 members
    assert set(neighbors) == {1}


def test_ivfpq_validation(spark):
    from renkodf_spark.operators import pq

    emb = _pq_fixture(spark)
    cents = similarity.embedding_centroids(emb, dim=4)
    books = pq.pq_codebooks(emb, dim=4, m=2)
    with pytest.raises(ValueError):
        pq.ivfpq_topk(emb, emb, cents, books, dim=4, m=2, k=0)
    with pytest.raises(ValueError):
        pq.ivfpq_topk(emb, emb, cents, books, dim=4, m=2, n_probe=0)


# ----------------------------------------- hot-cell guards (r11)


def test_semantic_dedup_max_cell_size_guard(spark):
    """VERDICT r10 item 4: the SemDeDup hot-cell spill. A cap at or
    above the cell size is EXACT (identical output); a small cap splits
    the hot cell round-robin by id and only ever misses drops (capped
    keep-set is a strict superset here, by construction of the groups),
    never invents them; the split is deterministic."""
    # 18 vectors, 3 exact-duplicate groups (one-hot axes -> cross-group
    # cosine 0), all one label -> one hot cell
    vecs = [
        (i, [1.0 if j == i % 3 else 0.0 for j in range(4)], "hot") for i in range(18)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>, label string")
    cents = similarity.embedding_centroids(emb, dim=4)
    thr = 0.99

    kept_exact = {
        r["vec_id"] for r in similarity.semantic_dedup(emb, cents, threshold=thr).collect()
    }
    assert kept_exact == {0, 1, 2}  # min id per duplicate group

    # cap >= cell size: no split, identical to exact
    same = similarity.semantic_dedup(emb, cents, threshold=thr, max_cell_size=18)
    assert {r["vec_id"] for r in same.collect()} == kept_exact

    # cap 9 -> n_sub = 2, sub-cell = id % 2; each group {g, g+3, ...}
    # splits across parities, so each parity keeps its own minimum:
    # recall loss = exactly the cross-sub-cell drops, nothing else
    capped = similarity.semantic_dedup(emb, cents, threshold=thr, max_cell_size=9)
    kept_capped = {r["vec_id"] for r in capped.collect()}
    assert kept_capped == {0, 1, 2, 3, 4, 5}
    assert kept_exact < kept_capped  # superset: only drops are missed
    # deterministic: a second run is identical
    again = similarity.semantic_dedup(emb, cents, threshold=thr, max_cell_size=9)
    assert {r["vec_id"] for r in again.collect()} == kept_capped

    with pytest.raises(ValueError):
        similarity.semantic_dedup(emb, cents, threshold=thr, max_cell_size=0)


def test_ivf_topk_max_cell_size_guard(spark, emb_df):
    """VERDICT r10 item 4, the IVF twin: a cap at or above every cell
    size leaves ivf_topk untouched; max_cell_size=1 restricts the
    candidate pool to each cell's member nearest its centroid (rounded
    routing cosine, tie to smaller id) — the documented recall trade."""
    cents_df = similarity.embedding_centroids(emb_df, dim=4)
    q = emb_df.filter(F.col("vec_id") < 2)

    exact = sorted(
        map(tuple, similarity.ivf_topk(emb_df, q, cents_df, k=3, n_probe=2).collect())
    )
    same = sorted(
        map(
            tuple,
            similarity.ivf_topk(
                emb_df, q, cents_df, k=3, n_probe=2, max_cell_size=10_000
            ).collect(),
        )
    )
    assert exact and exact == same

    # allowed pool under cap=1: per cell, the member with the highest
    # rounded routing cosine (tie -> smaller id)
    nc = similarity.nearest_centroid(emb_df, cents_df).collect()
    best = {}
    for r in nc:
        key = r["cell"]
        cand = (-round(r["cell_cos"], 6), r["id"])
        if key not in best or cand < best[key]:
            best[key] = cand
    allowed = {v[1] for v in best.values()}
    capped = similarity.ivf_topk(
        emb_df, q, cents_df, k=3, n_probe=2, max_cell_size=1
    ).collect()
    assert capped and all(r["neighbor_id"] in allowed for r in capped)

    with pytest.raises(ValueError):
        similarity.ivf_topk(emb_df, q, cents_df, max_cell_size=-1)


# ------------------------------------------- bigram Stupid-Backoff LM


def _half_up_micros(x: float) -> int:
    import decimal

    # Decimal(repr(.)) mirrors Spark round()'s BigDecimal.valueOf (the
    # double's shortest repr), not the exact binary expansion — the two
    # disagree on repr-boundary values (ADVICE r11)
    return int(
        decimal.Decimal(repr(x * 1e6)).quantize(0, rounding=decimal.ROUND_HALF_UP)
    )


def test_bigram_lm_hand_computed(spark):
    """Every branch checked against hand arithmetic: seen transition,
    backoff to an in-vocab unigram, backoff to OOV, OOV first token,
    single-token doc."""
    import math

    from renkodf_spark.operators import text as text_ops

    train = spark.createDataFrame(
        [(1, "a b a"), (2, "b c")], "doc_id long, text string"
    )
    uni, bi, oov = text_ops.bigram_lm_train(train)
    # corpus: a:2 b:2 c:1 -> T=5, V=3; bigrams (a,b) (b,a) (b,c) once each
    lp_a = _half_up_micros(math.log(3 / 8))
    lp_c = _half_up_micros(math.log(2 / 8))
    oov_exp = _half_up_micros(math.log(1 / 8))
    tr = _half_up_micros(math.log(1 / 2))
    bk = _half_up_micros(math.log(0.4))
    assert oov == oov_exp
    assert sorted(map(tuple, uni.collect())) == [
        ("a", 2, lp_a),
        ("b", 2, lp_a),
        ("c", 1, lp_c),
    ]
    assert sorted(map(tuple, bi.collect())) == [
        ("a", "b", 1, tr),
        ("b", "a", 1, tr),
        ("b", "c", 1, tr),
    ]
    score = spark.createDataFrame(
        [(10, "a b x c"), (11, "q")], "doc_id long, text string"
    )
    out = {
        r.doc_id: (r.n_tokens, r.sum_logp_micros, r.avg_logp)
        for r in text_ops.bigram_logprob(score, (uni, bi, oov)).collect()
    }
    # doc 10: first=lp(a); (a,b) seen; (b,x) backoff->OOV; (x,c) backoff->lp(c)
    s10 = lp_a + tr + (bk + oov_exp) + (bk + lp_c)
    assert out[10][:2] == (4, s10)
    # Spark's round(col, 6) = BigDecimal.valueOf(double).setScale(HALF_UP):
    # replicate via the double's shortest decimal repr, not banker's round()
    import decimal

    want_avg = float(
        decimal.Decimal(repr(s10 / 4e6)).quantize(
            decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
        )
    )
    assert out[10][2] == want_avg
    # doc 11: single unseen token -> pure OOV mass, no transitions
    assert out[11] == (1, oov_exp, round(oov_exp / 1e6, 6))


def test_bigram_logprob_layout_independent(spark):
    from renkodf_spark.operators import text as text_ops

    rows = [(i, f"w{i % 7} w{i % 3} common w{i % 5}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = text_ops.bigram_lm_train(df.filter("doc_id % 2 = 0"))
    a = text_ops.bigram_logprob(df, model).orderBy("doc_id").collect()
    b = text_ops.bigram_logprob(df.repartition(13), model).orderBy("doc_id").collect()
    assert [(r.doc_id, r.sum_logp_micros) for r in a] == [
        (r.doc_id, r.sum_logp_micros) for r in b
    ]


def test_bigram_lm_rejects_bad_alpha(spark):
    from renkodf_spark.operators import text as text_ops

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="alpha must be positive"):
        text_ops.bigram_lm_train(df, alpha=0)


# ------------------------------------------- kNN graph + stat barrier


def test_knn_graph_hand_computed(spark):
    """k=1 graph over two hand-built cells: each vector's single
    neighbor is its most-cosine-similar cell-mate, ties to smaller id;
    singleton cells emit no edges."""
    from renkodf_spark.operators import similarity

    # cell 0 around +x, cell 1 around +y, one singleton near -x
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (3, [0.8, 0.3], 0),
            (4, [0.0, 1.0], 1),
            (5, [0.1, 0.9], 1),
            (6, [-1.0, 0.0], 2),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    cents = similarity.embedding_centroids(emb, dim=2)
    g = {
        (r.src, r.dst)
        for r in similarity.knn_graph(emb, cents, k=1).collect()
    }
    # within cell {1,2,3}: 1's best is 2 (cos .9939 > .9487 for 3);
    # 2's best is 3 (.9734 vs .9939 for 1 -> actually 1); compute:
    # cos(2,1)=0.9939, cos(2,3)=0.9734 -> best 1. 3: cos(3,1)=.9363? vs
    # cos(3,2)=.9734 -> best 2. cell {4,5}: mutual. singleton 6: none.
    assert g == {(1, 2), (2, 1), (3, 2), (4, 5), (5, 4)}


def test_mutual_knn_edges_symmetric_only(spark):
    from renkodf_spark.operators import similarity

    graph = spark.createDataFrame(
        [(1, 2, 0.9), (2, 1, 0.9), (3, 1, 0.8)],
        "src long, dst long, cos_sim double",
    )
    out = [tuple(r) for r in similarity.mutual_knn_edges(graph).collect()]
    # (1,2) mutual; (3,1) one-way -> dropped
    assert out == [(1, 2, 0.9)]


def test_knn_graph_capped_contract(spark):
    """Hot-cell cap on the kNN graph: every capped edge is a true
    same-cell pair carrying its exact cosine (capping substitutes
    within-sub-cell candidates, never invents cross-cell ones), the
    per-source degree bound still holds, and a cap larger than every
    cell is a no-op."""
    from renkodf_spark.operators import similarity

    rows = [
        (i, [float((i * 7 + j) % 5) + 0.5 for j in range(4)], i % 2)
        for i in range(30)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    cents = similarity.embedding_centroids(emb, dim=4)
    exact = {
        (r.src, r.dst) for r in similarity.knn_graph(emb, cents, k=3).collect()
    }
    # all within-cell pairs with their exact rounded cosines (k huge)
    all_pairs = {
        (r.src, r.dst): r.cos_sim
        for r in similarity.knn_graph(emb, cents, k=10**6).collect()
    }
    capped = similarity.knn_graph(emb, cents, k=3, max_cell_size=5).collect()
    assert capped, "capped graph unexpectedly empty"
    degrees = {}
    for r in capped:
        assert (r.src, r.dst) in all_pairs  # true cell-mate pair
        assert r.cos_sim == all_pairs[(r.src, r.dst)]  # exact cosine kept
        degrees[r.src] = degrees.get(r.src, 0) + 1
    assert max(degrees.values()) <= 3
    uncapped = {
        (r.src, r.dst)
        for r in similarity.knn_graph(
            emb, cents, k=3, max_cell_size=1000
        ).collect()
    }
    assert uncapped == exact


def test_cluster_labels_long_chain_stat_barrier(spark):
    """Regression for the r11 statistics-snowball diagnosis plus the
    r12 round-count pin: a 300-node path graph is the worst shape for
    label propagation (r11's pointer jumping took 11 rounds on it);
    alternating large-star/small-star must converge in O(log n) rounds
    (<= 10 incl. the fixpoint-observation round). The periodic parquet
    barrier must (a) fire when forced onto a short cadence, (b) keep
    the final plan's sizeInBytes statistic at a sane magnitude — the
    carried join-product stats otherwise make each round exponentially
    slower (BigInteger.multiply dominating the driver) — and (c) not
    change the labels."""
    from renkodf_spark.operators import dedup

    ids = spark.range(300).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(299)], "id_a long, id_b long"
    )
    stats = {}
    labels = dedup.cluster_labels(
        ids, pairs, max_rounds=30, stats=stats, stat_barrier_every=4
    )
    # O(log n): star contraction halves path diameter per round
    assert 2 < stats["rounds"] <= 10, stats
    assert stats["stat_barriers"] >= 1
    got = {(r.id, r.cluster_id) for r in labels.collect()}
    assert got == {(i, 0) for i in range(300)}
    # the barrier caps the statistic at a constant digit count
    # (BigInteger ops on it are microseconds); without it each round
    # compounds the carried sizeInBytes and the driver would spend
    # minutes inside stats estimation on deep graphs
    digits = len(
        str(labels._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    assert digits < 50_000, f"sizeInBytes statistic re-snowballed: {digits} digits"


def test_cluster_labels_nonconverge_raises(spark):
    """on_nonconverge='raise' (ADVICE r11): gated queries must fail
    loudly instead of silently returning under-merged labels; 'warn'
    keeps the legacy RuntimeWarning and still returns well-formed
    (one-row-per-id) labels."""
    from renkodf_spark.operators import dedup

    ids = spark.range(64).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.cluster_labels(ids, pairs, max_rounds=1, on_nonconverge="raise")
    with pytest.warns(RuntimeWarning, match="did not converge"):
        labels = dedup.cluster_labels(ids, pairs, max_rounds=1)
    rows = labels.collect()
    assert len(rows) == 64  # one row per id even when under-merged
    assert len({r.id for r in rows}) == 64
    with pytest.raises(ValueError, match="on_nonconverge"):
        dedup.cluster_labels(ids, pairs, on_nonconverge="explode")


def test_cluster_labels_rejects_bad_barrier(spark):
    from renkodf_spark.operators import dedup

    ids = spark.range(3).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="stat_barrier_every"):
        dedup.cluster_labels(ids, pairs, stat_barrier_every=0)


def test_knn_density_hand_computed(spark):
    from renkodf_spark.operators import similarity

    graph = spark.createDataFrame(
        [(1, 2, 0.5), (1, 3, 0.25), (2, 1, 0.5)],
        "src long, dst long, cos_sim double",
    )
    out = {r.vec_id: tuple(r)[1:] for r in similarity.knn_density(graph).collect()}
    # src 1: mean of (500000, 250000) = 375000; src 2: single edge
    assert out[1] == (2, 375000, 500000)
    assert out[2] == (1, 500000, 500000)


def test_knn_density_cap_parity(spark):
    """VERDICT r11 item 6: density tiers from a CAPPED kNN graph.
    When no cell exceeds the cap, capped and exact density aggregates
    are identical (the cap is a no-op); at a small cap the aggregates
    stay well-formed substitution — every source keeps n_neighbors <=
    k, max_cos never exceeds the exact max (the exact graph's top-1 is
    cell-wide), and every aggregated edge was a true cell-mate pair."""
    from renkodf_spark.operators import similarity

    vecs = [
        (i, [float((i * 5 + j * 7) % 13) for j in range(4)], "abc"[i % 3])
        for i in range(30)
    ]
    labeled = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>, label string"
    )
    emb = labeled.drop("label")
    cents = similarity.embedding_centroids(labeled, dim=4)

    exact = similarity.knn_graph(emb, cents, k=3)
    exact_d = {r.vec_id: tuple(r)[1:] for r in similarity.knn_density(exact).collect()}

    # cap larger than every cell: bit-identical density rows
    loose = similarity.knn_graph(emb, cents, k=3, max_cell_size=1000)
    loose_d = {r.vec_id: tuple(r)[1:] for r in similarity.knn_density(loose).collect()}
    assert loose_d == exact_d

    # small cap: documented substitution, still well-formed
    capped = similarity.knn_graph(emb, cents, k=3, max_cell_size=4)
    capped_d = {
        r.vec_id: tuple(r)[1:] for r in similarity.knn_density(capped).collect()
    }
    assert capped_d, "capped density unexpectedly empty"
    for vec_id, (n, mean_c, max_c) in capped_d.items():
        assert n <= 3
        if vec_id in exact_d:
            assert max_c <= exact_d[vec_id][2]  # exact top-1 is cell-wide


def test_idf_weighted_jaccard_hand_computed(spark):
    """Weighted Jaccard with hand-checkable IDF mass: stopword-only
    overlap scores near zero while a shared rare term dominates."""
    import math

    from renkodf_spark.operators import dedup

    docs = spark.createDataFrame(
        [
            (1, "the quick zebra"),
            (2, "the quick otter"),
            (3, "the lazy zebra"),
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    out = {
        (r.id_a, r.id_b): r
        for r in dedup.idf_weighted_jaccard_pairs(docs, pairs).collect()
    }
    # N=3; df: the=3, quick=2, zebra=2, otter=1, lazy=1
    w = lambda dfq: _half_up_micros(math.log(4 / (dfq + 1)) + 1)
    shared_12 = w(3) + w(2)            # the, quick
    union_12 = shared_12 + w(2) + w(1)  # + zebra, otter
    r12 = out[(1, 2)]
    assert (r12.shared_idf_micros, r12.union_idf_micros) == (shared_12, union_12)
    shared_13 = w(3) + w(2)            # the, zebra
    union_13 = shared_13 + w(2) + w(1)  # + quick, lazy
    r13 = out[(1, 3)]
    assert (r13.shared_idf_micros, r13.union_idf_micros) == (shared_13, union_13)
    assert r12.wjaccard == pytest.approx(shared_12 / union_12, abs=5e-5)
    assert r13.wjaccard == pytest.approx(shared_13 / union_13, abs=5e-5)
    # layout independence of the exact long sums
    out2 = {
        (r.id_a, r.id_b): (r.shared_idf_micros, r.union_idf_micros)
        for r in dedup.idf_weighted_jaccard_pairs(
            docs.repartition(7), pairs
        ).collect()
    }
    assert out2 == {
        k: (v.shared_idf_micros, v.union_idf_micros) for k, v in out.items()
    }


def test_cluster_labels_shared_checkpoint_dir_no_collision(spark, tmp_path):
    """ADVICE r11: two cluster_labels runs sharing a checkpoint_dir
    must not overwrite each other's barrier files — barriers go in a
    uuid-unique per-invocation subdirectory, the returned labels are
    detached from the files, and the subdirectory is removed after."""
    import os

    from renkodf_spark.operators import dedup

    ckpt = str(tmp_path / "shared_ckpt")
    os.makedirs(ckpt)
    ids = spark.range(120).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(119)], "id_a long, id_b long"
    )
    stats1, stats2 = {}, {}
    l1 = dedup.cluster_labels(
        ids, pairs, stat_barrier_every=2, checkpoint_dir=ckpt, stats=stats1
    )
    l2 = dedup.cluster_labels(
        ids, pairs, stat_barrier_every=2, checkpoint_dir=ckpt, stats=stats2
    )
    assert stats1["stat_barriers"] >= 1 and stats2["stat_barriers"] >= 1
    want = {(i, 0) for i in range(120)}
    # both results readable and exact AFTER both runs finished — a
    # shared-path overwrite would corrupt the first run's lazy reads
    assert {(r.id, r.cluster_id) for r in l1.collect()} == want
    assert {(r.id, r.cluster_id) for r in l2.collect()} == want
    # per-invocation subdirs were cleaned up (local fs)
    left = [d for d in os.listdir(ckpt) if d.startswith("cluster_labels_")]
    assert left == [], left


def test_cluster_labels_shuffled_id_path_logarithmic(spark):
    """The O(log n) round pin on the ADVERSARIAL id layout: a 256-node
    path whose ids are a deterministic permutation (monotone paths are
    star contraction's easy case — halving is geometric there; a
    shuffled layout exercises the general Kiveris bound). Rounds must
    stay logarithmic, labels exact."""
    import random

    from renkodf_spark.operators import dedup

    rng = random.Random(1234)
    ids = list(range(256))
    rng.shuffle(ids)
    pairs = [(ids[i], ids[i + 1]) for i in range(255)]
    docs = spark.range(256).select(F.col("id").alias("doc_id"))
    stats = {}
    labels = dedup.cluster_labels(
        docs,
        spark.createDataFrame(pairs, "id_a long, id_b long"),
        max_rounds=20,
        stats=stats,
        on_nonconverge="raise",
    )
    assert stats["rounds"] <= 12, stats  # ~log2(256)=8 + slack + obs round
    got = {(r.id, r.cluster_id) for r in labels.collect()}
    assert got == {(i, 0) for i in range(256)}


def test_reliable_session_conf_through_pretrain_end_to_end(spark, sf_dir, tmp_path):
    """VERDICT r14 item 2: the persist_block reliability choice must
    reach every call site. Rather than thread reliable= through every
    query-level composition, persist_block(reliable=None) now resolves
    the session conf spark.renkodf.persist.reliable — one switch routes
    ALL lineage-truncation points of a DAG through the fault-tolerant
    checkpoint store. Prove it end-to-end on the deepest composed DAG
    (pretrain_end_to_end: 5+ persist sites across dedup/gopher/decon/
    temperature stages) with identical rows, and prove the conf is
    actually consulted (reliable checkpoints land in the checkpoint
    dir)."""
    import renkodf_spark.queries as q

    builder = q.queries()["pretrain_end_to_end"]
    base = sorted(map(tuple, builder(spark, sf_dir).collect()))

    ckpt = tmp_path / "reliable-ckpt"
    had_dir = spark.sparkContext.getCheckpointDir()
    spark.sparkContext.setCheckpointDir(str(ckpt))
    spark.conf.set("spark.renkodf.persist.reliable", "true")
    try:
        rel = sorted(map(tuple, builder(spark, sf_dir).collect()))
    finally:
        spark.conf.unset("spark.renkodf.persist.reliable")
        if had_dir is not None:
            spark.sparkContext.setCheckpointDir(had_dir)
    assert rel == base
    # the reliable path really ran: checkpoint RDD dirs were written
    import os as _os

    written = [
        f for _r, _d, fs in _os.walk(str(ckpt)) for f in fs
    ]
    assert written, "reliable=true session conf produced no checkpoint files"


def test_persist_block_conf_default_resolution(spark, tmp_path):
    """persist_block(reliable=None) consults spark.renkodf.persist.
    reliable; an explicit argument always wins over the conf."""
    from renkodf_spark.plans.persist import persist_block

    df = spark.range(10)
    # conf unset -> local (no checkpoint dir needed)
    assert persist_block(df).count() == 10
    spark.conf.set("spark.renkodf.persist.reliable", "true")
    try:
        if spark.sparkContext.getCheckpointDir() is None:
            with pytest.raises(ValueError, match="setCheckpointDir"):
                persist_block(df)
        # explicit False overrides the conf: no checkpoint dir required
        assert persist_block(df, reliable=False).count() == 10
    finally:
        spark.conf.unset("spark.renkodf.persist.reliable")
