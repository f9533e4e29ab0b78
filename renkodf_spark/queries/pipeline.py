"""Training-data pipeline queries (north-star extensions): dedup family,
similarity search, text analysis, multimodal plumbing.

The oracles are generated DuckDB SQL that replays the exact md5-based
arithmetic of the Spark operators (see operators/dedup.py docstring for
why md5 instead of engine-private hash functions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from renkodf_spark.operators import dedup, multimodal, similarity, text
from renkodf_spark.plans.persist import persist_block
from renkodf_spark.queries.registry import query
from renkodf_spark.sources.tables import load_table

NUM_HASHES = 16
BAND_SIZE = 2
SHINGLE_N = 3
SIMHASH_BITS = 16
# The gate queries opt into the hot-bucket cap explicitly (the operator
# default is None since ADVICE r3): the capped path is the declared
# 100 TB posture and the oracles mirror it via QUALIFY, so Spark and
# DuckDB must apply the same cap.
MAX_BUCKET = 1000  # = dedup.DEFAULT_MAX_BUCKET


def _docs(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, "documents")


# One materialized LSH pairs table shared by the downstream dedup gate
# queries (VERDICT r3 item 2): in a production pipeline the candidate
# pairs are persisted once and both the verify stage (jaccard) and the
# apply stage (cluster labels) read that table — rebuilding the
# signatures->bands->self-join chain per consumer doubles the most
# expensive stage. dedup_minhash_lsh deliberately does NOT use the
# memo: it *is* the benchmark of the pairs build itself, so the bench
# accounting stays honest (build cost appears exactly once, under the
# query that builds it; jaccard/cluster report their incremental cost).
# Keyed by (applicationId, sf_dir): a checkpointed DataFrame dies with
# its session, and the eager localCheckpoint keeps the table alive
# independent of spark.catalog.clearCache(). Capacity 1 (VERDICT r4
# item 3): a long-lived process cycling sessions or sf_dirs evicts the
# previous entry instead of accumulating checkpoints forever.
_PAIRS_MEMO: dict[tuple[str, str], "object"] = {}


def _evict_pairs_memo() -> None:
    # best-effort: drop the evicted checkpoint's storage blocks now
    # instead of waiting for py4j GC + ContextCleaner (which remains
    # the backstop if the RDD handle is already gone)
    for df in _PAIRS_MEMO.values():
        try:
            df.rdd.unpersist(False)
        except Exception:
            pass
    _PAIRS_MEMO.clear()


def clear_shared_pairs() -> None:
    """Drop the memoized pairs table (e.g. between benchmark phases)."""
    _evict_pairs_memo()


def _shared_pairs(spark, sf_dir):
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _PAIRS_MEMO:
        pairs = dedup.minhash_lsh_pairs(
            _docs(spark, sf_dir),
            num_hashes=NUM_HASHES,
            band_size=BAND_SIZE,
            shingle_n=SHINGLE_N,
            max_bucket_size=MAX_BUCKET,
        )
        _evict_pairs_memo()
        _PAIRS_MEMO[key] = pairs.localCheckpoint(eager=True)
    return _PAIRS_MEMO[key]


def _emb(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return load_table(spark, sf_dir, "embeddings")


# ------------------------------------------------------------------ dedup

@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_id, COUNT(*) AS n_dupes
    FROM documents GROUP BY 1
    """,
    doc="exact dedup: content-hash groupBy, keeper = min id.",
)
def dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(_docs(spark, sf_dir))


# shared oracle CTE: word-3-gram shingles per doc
_SHINGLE_CTE = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
),
shingled AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
                                      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS sh
  FROM toks
)
"""

_SIG_EXPRS = ",\n           ".join(
    f"list_min(list_transform(sh, x -> md5(concat('{s}:', x)))) AS h{s}" for s in range(NUM_HASHES)
)
_BAND_STRUCTS = ", ".join(
    f"struct_pack(band := {b}, key := concat_ws('|', h{b * BAND_SIZE}, h{b * BAND_SIZE + 1}))"
    for b in range(NUM_HASHES // BAND_SIZE)
)

# shared CTE chain: shingles -> signatures -> bands (hot-bucket capped,
# exactly mirroring the operator's deterministic guard) -> candidate pairs
_PAIRS_CTES = f"""
{_SHINGLE_CTE},
sig AS (
  -- len(sh) > 0 mirrors the Spark side: explode() of an empty shingle
  -- array drops the doc, so sub-n-token docs have no signature row
  SELECT doc_id,
           {_SIG_EXPRS}
  FROM shingled WHERE len(sh) > 0
),
bands_all AS (
  SELECT doc_id, unnest([{_BAND_STRUCTS}], recursive := true)
  FROM sig
),
bands AS (
  SELECT doc_id, band, key FROM bands_all
  QUALIFY ROW_NUMBER() OVER (PARTITION BY band, key ORDER BY doc_id) <= {MAX_BUCKET}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
)"""

_MINHASH_ORACLE = f"{_PAIRS_CTES}\nSELECT id_a, id_b FROM pairs"


@query(
    "dedup_minhash_lsh",
    oracle=_MINHASH_ORACLE,
    doc="MinHash (16 md5-lexmin perms) + LSH banding (8 bands x 2) candidate pairs.",
)
def dedup_minhash_lsh(spark, sf_dir):
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir),
        num_hashes=NUM_HASHES,
        band_size=BAND_SIZE,
        shingle_n=SHINGLE_N,
        max_bucket_size=MAX_BUCKET,
    )


_JACCARD_ORACLE = f"""
{_PAIRS_CTES}
SELECT p.id_a, p.id_b,
       ROUND(len(list_intersect(sa.sh, sb.sh))::DOUBLE
             / len(list_distinct(list_concat(sa.sh, sb.sh))), 4) AS jaccard
FROM pairs p JOIN shingled sa ON sa.doc_id = p.id_a
             JOIN shingled sb ON sb.doc_id = p.id_b
"""


@query(
    "dedup_ngram_jaccard",
    oracle=_JACCARD_ORACLE,
    doc="exact 3-gram Jaccard verification of the LSH candidate pairs.",
)
def dedup_ngram_jaccard(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(docs, _shared_pairs(spark, sf_dir), shingle_n=SHINGLE_N)


_INCR_SPLIT = 250

_INCR_ORACLE = f"""
{_PAIRS_CTES}
SELECT id_a, id_b FROM pairs WHERE id_b >= {_INCR_SPLIT}
"""


@query(
    "dedup_incremental_lsh",
    oracle=_INCR_ORACLE,
    doc="incremental LSH dedup: docs >= 250 are 'today's increment', "
    "docs < 250 the persisted baseline band index — candidate pairs "
    "touching the increment only. Oracle: full-corpus pairs filtered "
    "to id_b >= split (id_a < id_b makes that 'at least one new').",
)
def dedup_incremental_lsh(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    new_bands = dedup.band_table(
        docs.filter(F.col("doc_id") >= _INCR_SPLIT),
        num_hashes=NUM_HASHES,
        band_size=BAND_SIZE,
        shingle_n=SHINGLE_N,
    )
    baseline_bands = dedup.band_table(
        docs.filter(F.col("doc_id") < _INCR_SPLIT),
        num_hashes=NUM_HASHES,
        band_size=BAND_SIZE,
        shingle_n=SHINGLE_N,
    )
    return dedup.incremental_lsh_pairs(new_bands, baseline_bands)


_EDIT_ORACLE = f"""
{_PAIRS_CTES}
SELECT p.id_a, p.id_b,
       levenshtein(da.text, db.text) AS edit_dist,
       CASE WHEN len(da.text) = 0 AND len(db.text) = 0 THEN 1.0
            ELSE ROUND(1.0 - levenshtein(da.text, db.text)::DOUBLE
                       / greatest(len(da.text), len(db.text)), 4) END AS edit_sim
FROM pairs p JOIN documents da ON da.doc_id = p.id_a
             JOIN documents db ON db.doc_id = p.id_b
"""


@query(
    "dedup_edit_distance",
    oracle=_EDIT_ORACLE,
    doc="character-level Levenshtein verification of the LSH candidate "
    "pairs (integer distance - exact cross-engine; normalized "
    "similarity rounded).",
)
def dedup_edit_distance(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return dedup.edit_distance_verify(docs, _shared_pairs(spark, sf_dir))


# connected components as a recursive min-label walk: walk(id, node)
# enumerates every node reachable from id through the symmetric pair
# graph; cluster_id = MIN(reachable node). Components from LSH pairs are
# shallow, so the transitive closure stays small at gate scale.
_CLUSTER_ORACLE = (
    _PAIRS_CTES.replace("WITH toks", "WITH RECURSIVE toks", 1)
    + """,
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
walk(id, node) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT w.id, e.dst FROM walk w JOIN edges e ON e.src = w.node
)
SELECT id, MIN(node) AS cluster_id FROM walk GROUP BY id
"""
)


@query(
    "dedup_cluster_labels",
    oracle=_CLUSTER_ORACLE,
    doc="connected components over LSH candidate pairs (alternating "
    "large-star/small-star contraction, Kiveris et al. 2014) — the apply stage of dedup-at-scale; oracle "
    "is a DuckDB recursive-CTE transitive closure (VERDICT r2 item 7).",
)
def dedup_cluster_labels(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return dedup.cluster_labels(
        docs, _shared_pairs(spark, sf_dir), on_nonconverge="raise"
    )


_BITSUM = ",\n         ".join(
    f"list_sum(list_transform(th, h -> ((h >> {j}) & 1) * 2 - 1)) AS s{j}"
    for j in range(SIMHASH_BITS)
)
_SIMSUM = " + ".join(f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(SIMHASH_BITS))

_SIMHASH_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, list_distinct(string_split_regex(trim(text), '\s+')) AS t FROM documents
),
hashed AS (
  SELECT doc_id, list_transform(t, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS th FROM toks
),
bitsums AS (
  SELECT doc_id,
         {_BITSUM}
  FROM hashed
)
SELECT doc_id AS id, ({_SIMSUM})::BIGINT AS simhash FROM bitsums
"""


@query(
    "dedup_simhash",
    oracle=_SIMHASH_ORACLE,
    doc="16-bit SimHash over distinct word unigrams (md5-derived token hashes).",
)
def dedup_simhash(spark, sf_dir):
    return dedup.simhash(_docs(spark, sf_dir), bits=SIMHASH_BITS)


# ------------------------------------------------------------------ similarity

_COS = "list_dot_product(qv, cv) / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))"

_TOPK_ORACLE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {_COS} AS cos
  FROM c, q WHERE neighbor_id <> query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, ROUND(cos, 4) AS cos_sim FROM ranked WHERE rank <= 5
"""


@query(
    "similarity_cosine_topk",
    oracle=_TOPK_ORACLE,
    doc="brute-force cosine top-5 for query vectors vec_id < 5 (broadcast x corpus).",
)
def similarity_cosine_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return similarity.cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


_BLOCKED_ORACLE = f"""
WITH e AS (SELECT label AS block, vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.block, a.id AS id_a, b.id AS id_b,
       ROUND(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4) AS cos_sim
FROM e a JOIN e b ON a.block = b.block AND a.id < b.id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) > 0.3
"""


@query(
    "similarity_blocked_neardup",
    oracle=_BLOCKED_ORACLE,
    doc="embedding near-dup pairs (cos > 0.3; synthetic vectors are near-orthogonal) blocked by label (IVF-cell shape).",
)
def similarity_blocked_neardup(spark, sf_dir):
    return similarity.label_blocked_pairs(_emb(spark, sf_dir), threshold=0.3)


def _rp_bucket_sql(n_planes: int = 6, dim: int = 64) -> str:
    """bucket expression over a DOUBLE[] column named v — inlines the
    exact plane constants the operator uses."""
    planes = similarity.rp_planes(n_planes, dim)
    terms = []
    for p, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in plane) + "]"
        terms.append(f"(CASE WHEN list_dot_product(v, {lit}) > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")::BIGINT"


_LSH_ANN_ORACLE = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, {_rp_bucket_sql()} AS bucket FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < 20),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_dot_product(qv, c.v)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(c.v, c.v))) AS cos
  FROM b c JOIN q ON c.bucket = q.bucket AND c.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank, ROUND(cos, 4) AS cos_sim FROM ranked WHERE rank <= 5
"""


@query(
    "similarity_lsh_ann_topk",
    oracle=_LSH_ANN_ORACLE,
    doc="ANN top-5 within random-hyperplane LSH buckets (scale path; recall<1). "
    "Oracle inlines the operator's deterministic md5-derived plane constants.",
)
def similarity_lsh_ann_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return similarity.lsh_bucket_topk(emb, emb.filter(F.col("vec_id") < 20), k=5)


# ------------------------------------------------------------------ text

def _count_word_sql(word: str) -> str:
    needle = f" {word} "
    return (
        f"CAST((length(' ' || text || ' ') - length(replace(' ' || text || ' ', '{needle}', '')))"
        f" / {len(needle)} AS BIGINT)"
    )


_LANG_SCORES = ",\n       ".join(
    "(" + " + ".join(_count_word_sql(w) for w in words) + f") AS score_{lang}"
    for lang, words in text.LANG_MARKERS.items()
)
_LANG_BEST = "GREATEST(" + ", ".join(f"score_{lang}" for lang in text.LANG_MARKERS) + ")"
_LANG_CASE = (
    "CASE WHEN " + _LANG_BEST + " <= 0 THEN 'und' "
    + " ".join(
        f"WHEN score_{lang} = {_LANG_BEST} THEN '{lang}'" for lang in sorted(text.LANG_MARKERS)
    )
    + " END"
)

_LANGID_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
       {_LANG_SCORES}
  FROM documents)
SELECT doc_id, {", ".join(f"score_{lang}" for lang in text.LANG_MARKERS)},
       {_LANG_CASE} AS pred_lang
FROM scored
"""


@query("text_lang_id", oracle=_LANGID_ORACLE, doc="marker-word language ID heuristic.")
def text_lang_id(spark, sf_dir):
    return text.lang_id(_docs(spark, sf_dir))


_STOP_SUM = " + ".join(_count_word_sql(w) for w in text.LANG_MARKERS["en"])

_QUALITY_ORACLE = rf"""
WITH base AS (
  SELECT doc_id, text,
         length(text) AS n_chars_m,
         len(string_split_regex(trim(text), '\s+')) AS n_words,
         length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct,
         ({_STOP_SUM}) AS stop
  FROM documents)
SELECT doc_id, n_chars_m, n_words,
       ROUND((n_chars_m - n_words + 1) / n_words, 4) AS avg_word_len,
       ROUND(punct / n_chars_m, 4) AS punct_ratio,
       ROUND(stop / n_words, 4) AS stopword_ratio,
       CASE WHEN n_words < 5 THEN 'too_short'
            WHEN punct / n_chars_m > 0.1 THEN 'punct_heavy'
            ELSE 'keep' END AS quality_bucket
FROM base
"""


@query("text_quality", oracle=_QUALITY_ORACLE, doc="quality features + keep/flag bucket.")
def text_quality(spark, sf_dir):
    return text.quality_score(_docs(spark, sf_dir))


_TOKEN_ORACLE = r"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
       len(regexp_extract_all(text, '([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])', 1)) AS bpe_tokens
FROM documents
"""


@query("text_token_counts", oracle=_TOKEN_ORACLE, doc="whitespace + BPE-ish token counting.")
def text_token_counts(spark, sf_dir):
    return text.token_counts(_docs(spark, sf_dir))


_FP_ORACLE = r"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                               '\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


@query("text_fingerprint", oracle=_FP_ORACLE, doc="normalized content fingerprint (md5).")
def text_fingerprint(spark, sf_dir):
    return text.fingerprint(_docs(spark, sf_dir))


# ------------------------------------------------------------------ multimodal

_MM_ORACLE = """
SELECT doc_id AS media_id, 'image/fake' AS media_type,
       octet_length(encode(text)) AS n_bytes, md5(text) AS digest,
       'unknown' AS format,
       ('0x' || substr(md5(text), 1, 2))::BIGINT + 1 AS width,
       ('0x' || substr(md5(text), 3, 2))::BIGINT + 1 AS height
FROM documents
"""


@query(
    "multimodal_image_meta",
    oracle=_MM_ORACLE,
    doc="binary media plumbing: mapInPandas metadata extraction over "
    "text-as-bytes payloads (the format='unknown' fallback path).",
)
def multimodal_image_meta(spark, sf_dir):
    media = multimodal.documents_as_media(_docs(spark, sf_dir))
    return multimodal.decode_image_meta(media)


# Real header parsing: synthetic PNG/GIF/BMP/JPEG payloads built from the
# doc_id arithmetic (operators/multimodal.py synthetic_media); the oracle
# recomputes the expected (format, width, height) WITHOUT parsing bytes,
# so a parser bug cannot cancel out.
_MM_HEADERS_ORACLE = """
SELECT doc_id AS media_id,
       CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
                       WHEN 2 THEN 'bmp' ELSE 'jpeg' END AS format,
       (doc_id % 200 + 1)::BIGINT AS width,
       (doc_id * 7 % 200 + 1)::BIGINT AS height
FROM documents
"""


@query(
    "multimodal_real_headers",
    oracle=_MM_HEADERS_ORACLE,
    doc="pure-struct PNG/GIF/BMP/JPEG dimension extraction from real "
    "header bytes (VERDICT r2 item 5).",
)
def multimodal_real_headers(spark, sf_dir):
    media = multimodal.synthetic_media(_docs(spark, sf_dir))
    meta = multimodal.decode_image_meta(media)
    return meta.select("media_id", "format", "width", "height")


# Real pixel decode (r10): fully-decodable PNG/BMP/GIF payloads whose
# pixels follow the closed-form (id + 3x + 7y + 11c) mod 256 law, so
# the oracle INTEGRATES the decoded statistics algebraically — DuckDB
# never parses a byte, Spark decodes real zlib/LZW files; a codec bug
# cannot cancel out because the two sides share only the formula.
_MM_PIXELS_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id, doc_id % 24 + 1 AS w,
         (doc_id * 7) % 24 + 1 AS h, doc_id % 3 AS kind
  FROM documents),
xs AS (SELECT media_id, w, h, kind, unnest(range(w)) AS x FROM m),
ys AS (SELECT media_id, w, h, kind, x, unnest(range(h)) AS y FROM xs),
px AS (
  SELECT media_id, w, h, kind,
         CASE WHEN kind IN (0, 1)
              THEN (media_id + 3*x + 7*y) % 256
                   + (media_id + 3*x + 7*y + 11) % 256
                   + (media_id + 3*x + 7*y + 22) % 256
              ELSE 3 * ((media_id + 3*x + 7*y) % 256)
         END AS s
  FROM ys)
SELECT media_id,
       CASE kind WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'gif' END AS format,
       w::BIGINT AS width, h::BIGINT AS height, 3::BIGINT AS channels,
       SUM(s)::BIGINT AS pixel_sum, (3 * w * h)::BIGINT AS n_pixels,
       'ok' AS status
FROM px GROUP BY media_id, w, h, kind
"""


@query(
    "multimodal_pixel_decode",
    oracle=_MM_PIXELS_ORACLE,
    doc="REAL pixel decode with pure stdlib codecs (r10, closes the "
    "env-blocked contract): PNG through zlib + all five scanline "
    "unfilters (per-row filter = y%5 at encode time), BMP raw rows "
    "incl. top-down variants, GIF through LZW incl. interlaced frames "
    "— decoded per payload in mapInPandas, exact pixel_sum/n_pixels "
    "hash-matched against the formula integral.",
)
def multimodal_pixel_decode(spark, sf_dir):
    media = multimodal.synth_decodable_media(_docs(spark, sf_dir))
    return multimodal.decode_image_pixels(media).select(
        "media_id", "format", "width", "height", "channels",
        "pixel_sum", "n_pixels", "status",
    )


# Frame sampling (r10): multi-frame GIFs (id%3+2 frames, per-frame
# delays and formula pixels seeded by id + 13*frame), sampled every
# 2nd frame. Same oracle philosophy: the SQL replays the sampling
# arithmetic and integrates the per-frame pixel law.
_MM_FRAMES_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id, doc_id % 24 + 1 AS w,
         (doc_id * 7) % 24 + 1 AS h, doc_id % 3 + 2 AS n_frames
  FROM documents),
fr AS (SELECT media_id, w, h, unnest(range(n_frames)) AS f FROM m),
sampled AS (SELECT * FROM fr WHERE f % 2 = 0),
xs AS (SELECT media_id, w, h, f, unnest(range(w)) AS x FROM sampled),
ys AS (SELECT media_id, w, h, f, x, unnest(range(h)) AS y FROM xs)
SELECT media_id, f::BIGINT AS frame_index,
       ((media_id + f) % 50 + 1)::BIGINT AS delay_cs,
       w::BIGINT AS width, h::BIGINT AS height,
       SUM(3 * ((media_id + 13*f + 3*x + 7*y) % 256))::BIGINT AS pixel_sum,
       (3 * w * h)::BIGINT AS n_pixels
FROM ys GROUP BY media_id, f, w, h
"""


@query(
    "multimodal_frame_sample",
    oracle=_MM_FRAMES_ORACLE,
    doc="animated-GIF frame sampling (r10, closes the env-blocked "
    "frame-sampling contract for the format the container supports): "
    "every 2nd frame of each multi-frame GIF decoded via LZW with its "
    "per-frame delay, pixel sums hash-matched against the per-frame "
    "formula integral.",
)
def multimodal_frame_sample(spark, sf_dir):
    media = multimodal.synth_animated_media(_docs(spark, sf_dir))
    return multimodal.frame_sample(media, every_n=2).select(
        "media_id", "frame_index", "delay_cs", "width", "height",
        "pixel_sum", "n_pixels",
    )


# Perceptual image hashing (r10): dHash over DECODED pixels — the
# image-near-dup feature. The hash definition is integer-exact by
# construction (9x8 floor-bucketed gray sums, adjacent buckets compared
# by cross-multiplication — no float resize), so DuckDB replays the
# ENTIRE pipeline: formula pixels -> bucket sums -> comparison bits ->
# packed halves -> Hamming pairs.
def _dhash_ctes(id_filter: str = "TRUE") -> str:
    return f"""
m AS (
  SELECT doc_id AS media_id, doc_id % 24 + 1 AS w,
         (doc_id * 7) % 24 + 1 AS h, doc_id % 3 AS kind
  FROM documents WHERE {id_filter}),
xs AS (SELECT media_id, w, h, kind, unnest(range(w)) AS x FROM m),
ys AS (SELECT media_id, w, h, kind, x, unnest(range(h)) AS y FROM xs),
g AS (
  SELECT media_id,
         CASE WHEN kind IN (0, 1)
              THEN (media_id + 3*x + 7*y) % 256
                   + (media_id + 3*x + 7*y + 11) % 256
                   + (media_id + 3*x + 7*y + 22) % 256
              ELSE 3 * ((media_id + 3*x + 7*y) % 256)
         END AS gray,
         (x * 9) // w AS bx, (y * 8) // h AS by
  FROM ys),
bsum AS (
  SELECT media_id, by, bx, SUM(gray)::BIGINT AS s, COUNT(*)::BIGINT AS n
  FROM g GROUP BY media_id, by, bx),
bits AS (
  SELECT a.media_id, a.by AS r, a.bx AS c,
         CASE WHEN a.s * b.n > b.s * a.n THEN 1 ELSE 0 END AS bit
  FROM bsum a JOIN bsum b
    ON a.media_id = b.media_id AND a.by = b.by AND b.bx = a.bx + 1
  WHERE a.bx < 8),
hashes AS (
  SELECT media_id,
         COALESCE(SUM(CASE WHEN r < 4
                      THEN bit * (1::BIGINT << ((r % 4) * 8 + c)) END), 0)::BIGINT AS dhash_hi,
         COALESCE(SUM(CASE WHEN r >= 4
                      THEN bit * (1::BIGINT << ((r % 4) * 8 + c)) END), 0)::BIGINT AS dhash_lo
  FROM bits GROUP BY media_id)
"""


_MM_DHASH_ORACLE = f"""
WITH {_dhash_ctes()}
SELECT m.media_id,
       CASE m.kind WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'gif' END AS format,
       COALESCE(h.dhash_hi, 0) AS dhash_hi, COALESCE(h.dhash_lo, 0) AS dhash_lo,
       'ok' AS status
FROM m LEFT JOIN hashes h USING (media_id)
"""


@query(
    "multimodal_image_dhash",
    oracle=_MM_DHASH_ORACLE,
    doc="perceptual dHash over decoded pixels (r10, the LAION-style "
    "image-near-dup feature): decode -> gray sums over a floor-bucketed "
    "9x8 grid -> adjacent-bucket comparisons by exact cross- "
    "multiplication -> 64 bits packed into two sign-safe halves; the "
    "oracle replays decode-to-hash algebraically.",
)
def multimodal_image_dhash(spark, sf_dir):
    media = multimodal.synth_decodable_media(_docs(spark, sf_dir))
    return multimodal.image_dhash(media)


_MM_DHASH_PAIRS_ORACLE = f"""
WITH {_dhash_ctes("doc_id % 5 = 0")},
-- every image hashes, including ones too small for any adjacent-bucket
-- comparison (their 64 bits are all zero — same as the operator)
hall AS (
  SELECT m.media_id, COALESCE(h.dhash_hi, 0) AS dhash_hi,
         COALESCE(h.dhash_lo, 0) AS dhash_lo
  FROM m LEFT JOIN hashes h USING (media_id))
SELECT a.media_id AS id_a, b.media_id AS id_b,
       (bit_count(xor(a.dhash_hi, b.dhash_hi))
        + bit_count(xor(a.dhash_lo, b.dhash_lo)))::BIGINT AS hamming
FROM hall a JOIN hall b ON a.media_id < b.media_id
WHERE bit_count(xor(a.dhash_hi, b.dhash_hi))
      + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 2
"""


@query(
    "multimodal_dhash_neardup_pairs",
    oracle=_MM_DHASH_PAIRS_ORACLE,
    doc="image near-dup pairs by dHash Hamming distance <= 2 over the "
    "decoded corpus slice (id % 5 = 0) — decode -> perceptual hash -> "
    "pair verify, end to end in one declarative plan; oracle replays "
    "every stage including the xor/bit_count distance. r11: candidates "
    "come from the multi-index Hamming band equi-join (pigeonhole-exact "
    "recall, no cartesian), parity-pinned against the all-pairs twin.",
)
def multimodal_dhash_neardup_pairs(spark, sf_dir):
    media = multimodal.synth_decodable_media(
        _docs(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)
    )
    hashes = multimodal.image_dhash(media)
    return multimodal.dhash_hamming_pairs(hashes, max_distance=2).withColumn(
        "hamming", F.col("hamming").cast("long")
    )


_MM_DHASH_DEDUP_ORACLE = f"""
WITH {_dhash_ctes()},
hall AS (
  SELECT m.media_id, COALESCE(h.dhash_hi, 0) AS dhash_hi,
         COALESCE(h.dhash_lo, 0) AS dhash_lo
  FROM m LEFT JOIN hashes h USING (media_id))
SELECT dhash_hi, dhash_lo, MIN(media_id) AS keeper_id, COUNT(*) AS n_dupes
FROM hall GROUP BY dhash_hi, dhash_lo
"""


@query(
    "multimodal_dedup_keep",
    oracle=_MM_DHASH_DEDUP_ORACLE,
    doc="image dedup apply stage (r10): decode -> perceptual dHash -> "
    "exact-dedup election on the hash (keeper = min media_id, the "
    "dedup_exact shape over perceptual identity) — one declarative "
    "DAG from raw bytes to the keep decision, fully replayed by the "
    "oracle.",
)
def multimodal_dedup_keep(spark, sf_dir):
    media = multimodal.synth_decodable_media(_docs(spark, sf_dir))
    return (
        multimodal.image_dhash(media)
        .groupBy("dhash_hi", "dhash_lo")
        .agg(
            F.min("media_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


_MM_E2E_ORACLE = f"""
WITH {_dhash_ctes()},
hall AS (
  SELECT m.media_id, COALESCE(h.dhash_hi, 0) AS dhash_hi,
         COALESCE(h.dhash_lo, 0) AS dhash_lo
  FROM m LEFT JOIN hashes h USING (media_id)),
keep AS (
  SELECT dhash_hi, dhash_lo, MIN(media_id) AS media_id,
         COUNT(*) AS n_exact_dupes
  FROM hall GROUP BY dhash_hi, dhash_lo),
drops AS (
  SELECT DISTINCT b.media_id
  FROM keep a JOIN keep b ON a.media_id < b.media_id
  WHERE bit_count(xor(a.dhash_hi, b.dhash_hi))
        + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 2)
SELECT k.media_id AS doc_id, d.lang, d.n_chars,
       k.n_exact_dupes, k.dhash_hi, k.dhash_lo
FROM keep k JOIN documents d ON d.doc_id = k.media_id
WHERE k.media_id NOT IN (SELECT media_id FROM drops)
"""


@query(
    "multimodal_curation_end_to_end",
    oracle=_MM_E2E_ORACLE,
    doc="the image curation DAG composed end to end (r11, VERDICT r10 "
    "item 3 — the image twin of curation_end_to_end): decode -> "
    "perceptual dHash -> exact-hash keep election -> BANDED Hamming "
    "near-dup pairs among the keepers (distance <= 2, multi-index "
    "band equi-join, no cartesian) -> greedy drop of each pair's "
    "larger id -> survivors joined back to their document metadata. "
    "One declarative plan from raw bytes to the curated corpus, every "
    "stage replayed by the composed oracle.",
)
def multimodal_curation_end_to_end(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    media = multimodal.synth_decodable_media(docs)
    # materialize the narrow hash relation once — keepers feeds the
    # band table, both pair-verify sides, and the survivors join;
    # otherwise each branch re-runs the image decode over the whole
    # corpus (r12 plan audit, same fix as the video DAG)
    keepers = persist_block(
        multimodal.image_dhash(media).localCheckpoint()
        .groupBy("dhash_hi", "dhash_lo")
        .agg(
            F.min("media_id").alias("media_id"),
            F.count(F.lit(1)).alias("n_exact_dupes"),
        )
    )
    pairs = multimodal.dhash_hamming_pairs(keepers, max_distance=2)
    drops = pairs.select(F.col("id_b").alias("media_id")).distinct()
    survivors = keepers.join(drops, "media_id", "left_anti")
    return survivors.join(
        docs.select("doc_id", "lang", "n_chars"),
        survivors["media_id"] == F.col("doc_id"),
    ).select("doc_id", "lang", "n_chars", "n_exact_dupes", "dhash_hi", "dhash_lo")


_MM_RESIZE_W = 8
_MM_RESIZE_H = 8

# Integer box-filter thumbnails (r12, the resize stage): target cell
# (iy, ix) covers the standard area-partition span per axis; v = exact
# floor-mean of the synthetic pixel law over the span, per channel —
# the oracle integrates the law cell by cell.
_MM_RESIZE_ORACLE = f"""
WITH m AS (
  SELECT doc_id AS media_id, doc_id % 24 + 1 AS w,
         (doc_id * 7) % 24 + 1 AS h, doc_id % 3 AS kind
  FROM documents WHERE doc_id % 7 = 0),
tx AS (SELECT media_id, w, h, kind, unnest(range({_MM_RESIZE_W})) AS ix FROM m),
txy AS (SELECT media_id, w, h, kind, ix, unnest(range({_MM_RESIZE_H})) AS iy FROM tx),
cells AS (
  SELECT media_id, w, h, kind, ix, iy,
         (ix * w) // {_MM_RESIZE_W} AS xlo,
         ((ix + 1) * w + {_MM_RESIZE_W - 1}) // {_MM_RESIZE_W} - 1 AS xhi,
         (iy * h) // {_MM_RESIZE_H} AS ylo,
         ((iy + 1) * h + {_MM_RESIZE_H - 1}) // {_MM_RESIZE_H} - 1 AS yhi
  FROM txy),
cc AS (SELECT cells.*, unnest(range(3)) AS c FROM cells),
sx AS (SELECT cc.*, unnest(range(xlo, xhi + 1)) AS x FROM cc),
sxy AS (SELECT sx.*, unnest(range(ylo, yhi + 1)) AS y FROM sx)
SELECT media_id,
       CASE kind WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' ELSE 'gif' END AS format,
       iy AS out_y, ix AS out_x, c,
       CAST(SUM(CASE WHEN kind IN (0, 1)
                THEN (media_id + 3*x + 7*y + 11*c) % 256
                ELSE (media_id + 3*x + 7*y) % 256 END)
         // COUNT(*) AS BIGINT) AS v,
       'ok' AS status
FROM sxy GROUP BY media_id, kind, iy, ix, c
"""


@query(
    "multimodal_resize_thumbs",
    oracle=_MM_RESIZE_ORACLE,
    doc="REAL integer box-filter resize over decoded pixels (r12 — the "
    f"resize stage): every image to a fixed {_MM_RESIZE_W}x"
    f"{_MM_RESIZE_H} thumbnail via exact per-cell floor-means "
    "(prefix-sum rectangle arithmetic, area-partition downsample / "
    "replication upsample — both regimes exercised since source dims "
    "run 1..24); the oracle integrates the pixel law per target cell, "
    "so every thumbnail value hash-matches.",
)
def multimodal_resize_thumbs(spark, sf_dir):
    media = multimodal.synth_decodable_media(
        _docs(spark, sf_dir).filter(F.col("doc_id") % 7 == 0)
    )
    return multimodal.resize_image(
        media, out_w=_MM_RESIZE_W, out_h=_MM_RESIZE_H
    )


# Baseline JPEG decode (r10): the Huffman+DCT path, oracle-gated via
# the block-constant trick — a grayscale image constant within each
# aligned 8x8 block leaves ONLY the integer DC coefficient after the
# DCT, so at quant=1 the decode is bit-exact and the oracle integrates
# the block law algebraically. Restart intervals (id%3) exercise the
# DRI/RSTn machinery inside the gate too.
_MM_JPEG_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id, doc_id % 3 + 1 AS bw, (doc_id // 3) % 3 + 1 AS bh
  FROM documents),
bx AS (SELECT media_id, bw, bh, unnest(range(bw)) AS x FROM m),
bxy AS (SELECT media_id, bw, bh, x, unnest(range(bh)) AS y FROM bx)
SELECT media_id, 'jpeg' AS format,
       (8 * bw)::BIGINT AS width, (8 * bh)::BIGINT AS height,
       1::BIGINT AS channels,
       (64 * SUM((media_id + 3*x + 7*y) % 256))::BIGINT AS pixel_sum,
       (64 * bw * bh)::BIGINT AS n_pixels, 'ok' AS status
FROM bxy GROUP BY media_id, bw, bh
"""


@query(
    "multimodal_jpeg_decode",
    oracle=_MM_JPEG_ORACLE,
    doc="REAL baseline JPEG pixel decode (r10: table-driven Huffman "
    "from the file's own DHT, dequant, 8x8 IDCT, restart intervals — "
    "pure stdlib+numpy): block-constant grayscale fixtures decode "
    "BIT-EXACTLY at quant=1 (only the integer DC coefficient survives "
    "the DCT), so the whole entropy-decode + IDCT path hash-matches an "
    "algebraic oracle; lossy-regime fidelity and real-file decode are "
    "test-pinned (system JPEGs decode within JPEG loss of the PNG "
    "ground truth).",
)
def multimodal_jpeg_decode(spark, sf_dir):
    media = multimodal.synth_jpeg_media(_docs(spark, sf_dir))
    return multimodal.decode_image_pixels(media).select(
        "media_id", "format", "width", "height", "channels",
        "pixel_sum", "n_pixels", "status",
    )


# Audio modality (r10): PCM WAV payloads with closed-form int16 samples
# ((id + 5i + 9c) mod 65536) - 32768 — same oracle philosophy as the
# pixel decode: DuckDB integrates the decoded statistics, Spark decodes
# real RIFF bytes.
_MM_AUDIO_BASE = """
m AS (
  SELECT doc_id AS media_id, doc_id % 1200 + 64 AS n,
         doc_id % 2 + 1 AS ch, 8000 + (doc_id % 3) * 4000 AS rate
  FROM documents),
si AS (SELECT media_id, n, ch, rate, unnest(range(n)) AS i FROM m),
sc AS (SELECT media_id, n, ch, rate, i, unnest(range(ch)) AS c FROM si),
sv AS (SELECT media_id, n, ch, rate, i,
              (media_id + 5*i + 9*c) % 65536 - 32768 AS s
       FROM sc)
"""

_MM_AUDIO_ORACLE = f"""
WITH {_MM_AUDIO_BASE}
SELECT media_id, rate::BIGINT AS sample_rate, ch::BIGINT AS channels,
       n::BIGINT AS n_samples, (n * 1000 // rate)::BIGINT AS duration_ms,
       SUM(s)::BIGINT AS sample_sum, 'ok' AS status
FROM sv GROUP BY media_id, rate, ch, n
"""


@query(
    "multimodal_audio_meta",
    oracle=_MM_AUDIO_ORACLE,
    doc="REAL PCM WAV decode (r10, the audio modality): RIFF chunk "
    "walk + int16 samples via stdlib struct/numpy, exact sample_sum "
    "and integer duration hash-matched against the formula integral; "
    "compressed codecs (mp3/opus) report per-row status — the honest "
    "ffmpeg boundary.",
)
def multimodal_audio_meta(spark, sf_dir):
    media = multimodal.synth_audio_media(_docs(spark, sf_dir))
    return multimodal.decode_audio_samples(media).select(
        "media_id", "sample_rate", "channels", "n_samples",
        "duration_ms", "sample_sum", "status",
    )


_MM_ENERGY_ORACLE = f"""
WITH {_MM_AUDIO_BASE}
SELECT media_id, (i // 256)::BIGINT AS window_index,
       (COUNT(*) / MIN(ch))::BIGINT AS n_in_window,
       SUM(s * s)::BIGINT AS energy
FROM sv GROUP BY media_id, i // 256
"""


@query(
    "multimodal_audio_energy",
    oracle=_MM_ENERGY_ORACLE,
    doc="per-window audio energy (r10, the audio feature-extraction "
    "step): sum of squared int16 samples over consecutive 256-sample "
    "windows across channels — exact int64, so the whole decode + "
    "feature path replays in SQL.",
)
def multimodal_audio_energy(spark, sf_dir):
    media = multimodal.synth_audio_media(_docs(spark, sf_dir))
    return multimodal.audio_window_energy(media, window=256)


# Audio fingerprint (r10): energy-envelope delta bits over the same
# WAV corpus — the audio near-dup feature; fully integer so the bytes →
# fingerprint chain replays in SQL (window energies grouped from the
# sample law, delta comparisons, bit packing into sign-safe halves).
_MM_AUDIO_FP_ORACLE = f"""
WITH {_MM_AUDIO_BASE},
we AS (
  SELECT media_id, n, (i // 256) AS wi, SUM(s * s)::BIGINT AS e
  FROM sv GROUP BY media_id, n, i // 256),
bits AS (
  SELECT a.media_id, a.wi AS k,
         CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
  FROM we a JOIN we b ON a.media_id = b.media_id AND b.wi = a.wi + 1
  WHERE a.wi < 64),
fp AS (
  SELECT media_id,
         COALESCE(SUM(CASE WHEN k < 32 THEN bit * (1::BIGINT << k) END), 0)::BIGINT AS fp_hi,
         COALESCE(SUM(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32)) END), 0)::BIGINT AS fp_lo
  FROM bits GROUP BY media_id)
SELECT m.media_id, ((m.n + 255) // 256)::BIGINT AS n_windows,
       COALESCE(fp.fp_hi, 0) AS fp_hi, COALESCE(fp.fp_lo, 0) AS fp_lo,
       'ok' AS status
FROM m LEFT JOIN fp USING (media_id)
"""


@query(
    "multimodal_audio_fingerprint",
    oracle=_MM_AUDIO_FP_ORACLE,
    doc="audio near-dup fingerprint (r10, the audio twin of the image "
    "dHash): exact per-window energies -> envelope delta bits -> two "
    "sign-safe packed halves, the whole raw-bytes-to-fingerprint chain "
    "replayed algebraically by the oracle.",
)
def multimodal_audio_fingerprint(spark, sf_dir):
    media = multimodal.synth_audio_media(_docs(spark, sf_dir))
    return multimodal.audio_fingerprint(media, window=256)


# Video container (r10): uncompressed AVI with formula-pixel RGB frames
# — frame_sample walks a REAL video container without ffmpeg; the
# oracle replays the per-frame law and the container's constant frame
# duration (fps = 10 + id%4; delay_cs = (1000000 // fps) // 10000).
_MM_VIDEO_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id, doc_id % 24 + 1 AS w,
         (doc_id * 7) % 24 + 1 AS h, doc_id % 3 + 2 AS n_frames,
         10 + doc_id % 4 AS fps
  FROM documents),
fr AS (SELECT media_id, w, h, fps, unnest(range(n_frames)) AS f FROM m),
sampled AS (SELECT * FROM fr WHERE f % 2 = 0),
xs AS (SELECT media_id, w, h, fps, f, unnest(range(w)) AS x FROM sampled),
ys AS (SELECT media_id, w, h, fps, f, x, unnest(range(h)) AS y FROM xs),
px AS (
  SELECT media_id, w, h, fps, f,
         (media_id + 13*f + 3*x + 7*y) % 256
         + (media_id + 13*f + 3*x + 7*y + 11) % 256
         + (media_id + 13*f + 3*x + 7*y + 22) % 256 AS s
  FROM ys)
SELECT media_id, f::BIGINT AS frame_index,
       ((1000000 // fps) // 10000)::BIGINT AS delay_cs,
       w::BIGINT AS width, h::BIGINT AS height,
       SUM(s)::BIGINT AS pixel_sum, (3 * w * h)::BIGINT AS n_pixels
FROM px GROUP BY media_id, f, w, h, fps
"""


@query(
    "multimodal_video_frames",
    oracle=_MM_VIDEO_ORACLE,
    doc="frame sampling over a REAL video container (r10): uncompressed "
    "24-bit AVI walked via the RIFF structure (avih/strl/movi, raw "
    "'DIB ' frames, codec gate raising only for compressed fourccs — "
    "the honest ffmpeg boundary); every 2nd frame's exact pixel sum "
    "and the container frame duration hash-matched against the "
    "formula replay.",
)
def multimodal_video_frames(spark, sf_dir):
    media = multimodal.synth_video_media(_docs(spark, sf_dir))
    return multimodal.frame_sample(media, every_n=2).select(
        "media_id", "frame_index", "delay_cs", "width", "height",
        "pixel_sum", "n_pixels",
    )


# Video perceptual hashing (r11): per-frame dHash over decoded AVI
# frames — the video leg of the perceptual-dedup family (image dHash /
# audio fingerprint landed r10). The frame pixel law is
# (media_id + 13f + 3x + 7y + {0,11,22}) mod 256 per channel, so the
# oracle replays decode -> per-frame bucket sums -> comparison bits ->
# packed halves exactly like the image dHash CTEs, with the frame index
# as an extra grouping key.
def _video_dhash_ctes(id_filter: str = "TRUE", every_n: int = 1) -> str:
    return f"""
m AS (
  SELECT doc_id AS media_id, doc_id % 24 + 1 AS w,
         (doc_id * 7) % 24 + 1 AS h, doc_id % 3 + 2 AS n_frames
  FROM documents WHERE {id_filter}),
fr AS (SELECT media_id, w, h, unnest(range(n_frames)) AS f FROM m),
sampled AS (SELECT * FROM fr WHERE f % {every_n} = 0),
xs AS (SELECT media_id, w, h, f, unnest(range(w)) AS x FROM sampled),
ys AS (SELECT media_id, w, h, f, x, unnest(range(h)) AS y FROM xs),
g AS (
  SELECT media_id, f,
         (media_id + 13*f + 3*x + 7*y) % 256
         + (media_id + 13*f + 3*x + 7*y + 11) % 256
         + (media_id + 13*f + 3*x + 7*y + 22) % 256 AS gray,
         (x * 9) // w AS bx, (y * 8) // h AS by
  FROM ys),
bsum AS (
  SELECT media_id, f, by, bx, SUM(gray)::BIGINT AS s, COUNT(*)::BIGINT AS n
  FROM g GROUP BY media_id, f, by, bx),
fbits AS (
  SELECT a.media_id, a.f, a.by AS r, a.bx AS c,
         CASE WHEN a.s * b.n > b.s * a.n THEN 1 ELSE 0 END AS bit
  FROM bsum a JOIN bsum b
    ON a.media_id = b.media_id AND a.f = b.f AND a.by = b.by AND b.bx = a.bx + 1
  WHERE a.bx < 8),
fhashes AS (
  SELECT media_id, f,
         COALESCE(SUM(CASE WHEN r < 4
                      THEN bit * (1::BIGINT << ((r % 4) * 8 + c)) END), 0)::BIGINT AS dhash_hi,
         COALESCE(SUM(CASE WHEN r >= 4
                      THEN bit * (1::BIGINT << ((r % 4) * 8 + c)) END), 0)::BIGINT AS dhash_lo
  FROM fbits GROUP BY media_id, f),
fhall AS (
  SELECT s.media_id, s.f::BIGINT AS frame_index,
         COALESCE(h.dhash_hi, 0) AS dhash_hi, COALESCE(h.dhash_lo, 0) AS dhash_lo
  FROM sampled s LEFT JOIN fhashes h ON s.media_id = h.media_id AND s.f = h.f)
"""


_MM_VIDEO_DHASH_ORACLE = f"""
WITH {_video_dhash_ctes()}
SELECT media_id, frame_index, dhash_hi, dhash_lo FROM fhall
"""


@query(
    "multimodal_video_dhash",
    oracle=_MM_VIDEO_DHASH_ORACLE,
    doc="per-frame perceptual dHash over REAL decoded AVI containers "
    "(r11, the video leg of the perceptual-dedup family): RIFF walk -> "
    "raw 24-bit frames -> the shared 9x8 cross-multiplication dHash "
    "kernel per frame; the oracle replays the whole container-to-hash "
    "chain algebraically from the frame pixel law.",
)
def multimodal_video_dhash(spark, sf_dir):
    media = multimodal.synth_video_media(_docs(spark, sf_dir))
    return multimodal.frame_dhash(media, every_n=1)


_MM_VIDEO_NEARDUP_ORACLE = f"""
WITH {_video_dhash_ctes("doc_id % 5 = 0")},
fk AS (
  SELECT media_id * 1000 + frame_index AS fid, media_id, dhash_hi, dhash_lo
  FROM fhall),
fpairs AS (
  SELECT a.media_id AS va, b.media_id AS vb
  FROM fk a JOIN fk b ON a.fid < b.fid
  WHERE a.media_id <> b.media_id
    AND bit_count(xor(a.dhash_hi, b.dhash_hi))
        + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 2)
SELECT LEAST(va, vb) AS vid_a, GREATEST(va, vb) AS vid_b,
       COUNT(*)::BIGINT AS n_close_frames
FROM fpairs GROUP BY 1, 2
"""


@query(
    "multimodal_video_neardup_pairs",
    oracle=_MM_VIDEO_NEARDUP_ORACLE,
    doc="near-dup VIDEO pairs by frame-level dHash (r11): per-frame "
    "hashes keyed by a composite frame id run through the BANDED "
    "Hamming pair stage (distance <= 2, equi-join candidates, no "
    "cartesian), cross-video frame matches counted per video pair — "
    "decode -> frame hash -> banded pairs -> pair aggregation, all "
    "replayed by the oracle.",
)
def multimodal_video_neardup_pairs(spark, sf_dir):
    media = multimodal.synth_video_media(
        _docs(spark, sf_dir).filter(F.col("doc_id") % 5 == 0)
    )
    fh = multimodal.frame_dhash(media, every_n=1)
    keyed = fh.select(
        (F.col("media_id") * 1000 + F.col("frame_index")).alias("fid"),
        "media_id",
        "dhash_hi",
        "dhash_lo",
    )
    pairs = multimodal.dhash_hamming_pairs(keyed, max_distance=2, id_col="fid")
    vids = keyed.select("fid", "media_id")
    return (
        pairs.join(vids.select(F.col("fid").alias("id_a"), F.col("media_id").alias("va")), "id_a")
        .join(vids.select(F.col("fid").alias("id_b"), F.col("media_id").alias("vb")), "id_b")
        .filter(F.col("va") != F.col("vb"))
        .groupBy(
            F.least("va", "vb").alias("vid_a"), F.greatest("va", "vb").alias("vid_b")
        )
        .agg(F.count(F.lit(1)).alias("n_close_frames"))
    )


# Video curation DAG (r12, VERDICT r11 item 3 — the video twin of
# multimodal_curation_end_to_end). Near-dup candidate generation is
# REPRESENTATIVE-FRAME banding: only frame 0's hash enters the banded
# pair stage, so candidates are bounded by video count, not frame
# count; the verify stage then counts close frame pairs across the two
# candidates' FULL frame sets (bounded: n_frames_a x n_frames_b per
# candidate pair) and a pair is a near-dup only if >= 2 frame pairs
# are within Hamming distance 2 — the rep-frame match alone is not
# enough, which makes the verify stage load-bearing.
_VIDEO_E2E_MIN_CLOSE = 2

_MM_VIDEO_E2E_ORACLE = f"""
WITH {_video_dhash_ctes()},
sigs AS (
  SELECT media_id,
         SUM((frame_index + 1) * dhash_hi)::BIGINT AS vsig_hi,
         SUM((frame_index + 1) * dhash_lo)::BIGINT AS vsig_lo,
         COUNT(*)::BIGINT AS n_frames
  FROM fhall GROUP BY media_id),
keep AS (
  SELECT vsig_hi, vsig_lo, n_frames, MIN(media_id) AS media_id,
         COUNT(*)::BIGINT AS n_exact_dupes
  FROM sigs GROUP BY vsig_hi, vsig_lo, n_frames),
reps AS (
  SELECT f.media_id, f.dhash_hi, f.dhash_lo
  FROM fhall f JOIN keep k USING (media_id) WHERE f.frame_index = 0),
cand AS (
  SELECT a.media_id AS vid_a, b.media_id AS vid_b
  FROM reps a JOIN reps b ON a.media_id < b.media_id
  WHERE bit_count(xor(a.dhash_hi, b.dhash_hi))
        + bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 2),
verified AS (
  SELECT c.vid_a, c.vid_b, COUNT(*) AS n_close
  FROM cand c
  JOIN fhall fa ON fa.media_id = c.vid_a
  JOIN fhall fb ON fb.media_id = c.vid_b
  WHERE bit_count(xor(fa.dhash_hi, fb.dhash_hi))
        + bit_count(xor(fa.dhash_lo, fb.dhash_lo)) <= 2
  GROUP BY c.vid_a, c.vid_b),
drops AS (
  SELECT DISTINCT vid_b AS media_id FROM verified
  WHERE n_close >= {_VIDEO_E2E_MIN_CLOSE})
SELECT k.media_id AS doc_id, d.lang, d.n_chars, k.n_frames,
       k.n_exact_dupes
FROM keep k JOIN documents d ON d.doc_id = k.media_id
WHERE k.media_id NOT IN (SELECT media_id FROM drops)
"""


@query(
    "multimodal_video_curation_end_to_end",
    oracle=_MM_VIDEO_E2E_ORACLE,
    doc="the video curation DAG composed end to end (r12, VERDICT r11 "
    "item 3 — the video twin of multimodal_curation_end_to_end): AVI "
    "decode -> per-frame dHash -> exact dedup on the order-weighted "
    "frame-hash signature -> representative-frame BANDED Hamming "
    "candidates among keepers (bounded by video count, never frame "
    "cartesian) -> full frame-set verify (near-dup iff >= 2 close "
    "frame pairs) -> greedy drop of each pair's larger id -> survivors "
    "joined back to document metadata. One declarative plan from raw "
    "container bytes to the curated corpus; the oracle replays every "
    "stage including the signature election and the two-level "
    "candidate/verify geometry.",
)
def multimodal_video_curation_end_to_end(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    media = multimodal.synth_video_media(docs)
    # materialize the narrow per-frame hash relation once: it feeds
    # FIVE branches (signatures, keeper frames, reps, both verify
    # sides) and otherwise every branch re-runs the mapInPandas
    # container decode over the whole corpus (plan-audited: 7+
    # MapInPandas stamps). localCheckpoint beats cache here (no
    # InMemoryRelation re-scan overhead) and the builder creates a
    # fresh one per invocation, so bench visits still pay decode once
    fh = multimodal.frame_dhash(media, every_n=1).localCheckpoint()
    # r15 (guide §2.3/§8, VERDICT r14 item 4): ONE media_id aggregate
    # builds both the exact-dedup signature AND the per-video
    # frame-hash array, so every downstream stage works on one narrow
    # row per VIDEO. The r14 shape re-exchanged the per-FRAME table
    # three times (keeper join, verify side a, verify side b) and paid
    # a (vid_a, vid_b) pair aggregate; now the verify n_close count is
    # an in-row array expression over the two videos' hash arrays —
    # the frame relation crosses the network exactly once (the shared
    # aggregate), and the pair-count exchange is gone. Per-pair work
    # is the identical |frames_a| x |frames_b| xor/bit_count compare,
    # just evaluated in place; counts (and therefore drops) match the
    # r14 join formulation row-for-row. Frame arrays are bounded by
    # the per-video frame count (16 bytes/frame), the §8 lightweight
    # proxy. collect_list order is partition-dependent, but every
    # consumer is order-insensitive (count / keyed filter).
    vrows = persist_block(
        fh.groupBy("media_id").agg(
            F.sum((F.col("frame_index") + 1) * F.col("dhash_hi")).alias("vsig_hi"),
            F.sum((F.col("frame_index") + 1) * F.col("dhash_lo")).alias("vsig_lo"),
            F.count(F.lit(1)).alias("n_frames"),
            F.collect_list(
                F.struct("frame_index", "dhash_hi", "dhash_lo")
            ).alias("__frames"),
        )
    )
    # guide §3.3: keep is referenced three times (keeper rows, the
    # survivor anti-join, the output) and kvids three times (reps +
    # both verify sides) — truncate both so the signature election is
    # planned/executed once per consumer. Lazy, rows identical.
    keep = persist_block(
        vrows.groupBy("vsig_hi", "vsig_lo", "n_frames").agg(
            F.min("media_id").alias("media_id"),
            F.count(F.lit(1)).alias("n_exact_dupes"),
        )
    )
    kvids = persist_block(
        vrows.select("media_id", "__frames").join(
            keep.select("media_id"), "media_id"
        )
    )
    f0 = F.element_at(
        F.filter(F.col("__frames"), lambda f: f["frame_index"] == 0), 1
    )
    reps = (
        kvids.select("media_id", f0.alias("__f0"))
        .filter(F.col("__f0").isNotNull())
        .select(
            "media_id",
            F.col("__f0.dhash_hi").alias("dhash_hi"),
            F.col("__f0.dhash_lo").alias("dhash_lo"),
        )
    )
    cand = multimodal.dhash_hamming_pairs(reps, max_distance=2).select(
        F.col("id_a").alias("vid_a"), F.col("id_b").alias("vid_b")
    )
    fa = kvids.select(F.col("media_id").alias("vid_a"), F.col("__frames").alias("__fr_a"))
    fb = kvids.select(F.col("media_id").alias("vid_b"), F.col("__frames").alias("__fr_b"))
    n_close = F.aggregate(
        F.col("__fr_a"),
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.size(
            F.filter(
                F.col("__fr_b"),
                lambda y: F.bit_count(x["dhash_hi"].bitwiseXOR(y["dhash_hi"]))
                + F.bit_count(x["dhash_lo"].bitwiseXOR(y["dhash_lo"]))
                <= 2,
            )
        ).cast("long"),
    )
    verified = (
        cand.join(fa, "vid_a")
        .join(fb, "vid_b")
        .select("vid_a", "vid_b", n_close.alias("n_close"))
    )
    drops = (
        verified.filter(F.col("n_close") >= _VIDEO_E2E_MIN_CLOSE)
        .select(F.col("vid_b").alias("media_id"))
        .distinct()
    )
    survivors = keep.join(drops, "media_id", "left_anti")
    return survivors.join(
        docs.select("doc_id", "lang", "n_chars"),
        survivors["media_id"] == F.col("doc_id"),
    ).select("doc_id", "lang", "n_chars", "n_frames", "n_exact_dupes")
