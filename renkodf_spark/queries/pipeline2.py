"""Corpus-curation gate queries (the *apply* half of the training-data
pipeline): dedup filtering, document chunking, PII redaction,
deterministic splits, quota sampling.

Oracles replay the exact md5/regexp/slice arithmetic of
``operators/corpus.py`` in DuckDB; regex patterns are pinned to the
Java-regex ∩ RE2 shared subset so both engines match the same spans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from renkodf_spark.operators import corpus, dedup, text
from renkodf_spark.queries.pipeline import (
    _LANG_CASE,
    _LANG_SCORES,
    _PAIRS_CTES,
    _docs,
    _shared_pairs,
)
from renkodf_spark.queries.registry import query

# ------------------------------------------------------- dedup apply stage

_DEDUP_FILTER_ORACLE = (
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
),
labels AS (SELECT id, MIN(node) AS cluster_id FROM walk GROUP BY id),
sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM labels GROUP BY cluster_id)
SELECT l.id AS doc_id, s.cluster_size
FROM labels l JOIN sizes s USING (cluster_id)
WHERE l.id = l.cluster_id
"""
)


@query(
    "corpus_dedup_filter",
    oracle=_DEDUP_FILTER_ORACLE,
    doc="end-to-end dedup apply: keep the canonical doc per near-dup "
    "cluster (id == cluster label) with the cluster size it represents.",
)
def corpus_dedup_filter(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    labels = dedup.cluster_labels(docs, _shared_pairs(spark, sf_dir))
    return corpus.dedup_filter(docs, labels).select("doc_id", "cluster_size")


# ------------------------------------------------------------- chunking

_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24

_CHUNKS_ORACLE = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
),
st AS (
  SELECT doc_id, t, unnest(range(0, len(t), {_CHUNK_STRIDE})) AS s FROM toks
)
SELECT doc_id,
       (s // {_CHUNK_STRIDE}) AS chunk_id,
       len(t[s+1 : s+{_CHUNK_SIZE}]) AS n_tokens,
       md5(array_to_string(t[s+1 : s+{_CHUNK_SIZE}], ' ')) AS chunk_digest
FROM st
"""


@query(
    "corpus_chunks",
    oracle=_CHUNKS_ORACLE,
    doc="overlapping token-window chunking (size 32, stride 24) — the "
    "fixed-context pre-tokenization split; digest stands in for the text.",
)
def corpus_chunks(spark, sf_dir):
    chunks = corpus.chunk_documents(
        _docs(spark, sf_dir), chunk_size=_CHUNK_SIZE, stride=_CHUNK_STRIDE
    )
    return chunks.select(
        "doc_id", "chunk_id", "n_tokens", F.md5("chunk_text").alias("chunk_digest")
    )


# --------------------------------------------------------- PII redaction

# Deterministic augmentation so the patterns actually fire: every third
# doc gets one email + one IPv4 + one phone appended. Both engines build
# the identical augmented text from doc_id arithmetic.
_PII_COUNTS_SQL = ",\n       ".join(
    "len(regexp_extract_all(text, '" + pat + "')) AS n_" + kind
    for kind, pat in corpus.PII_PATTERNS.items()
)
_PII_REDACT_SQL = "text"
for _kind, _pat in corpus.PII_PATTERNS.items():
    _PII_REDACT_SQL = (
        "regexp_replace(" + _PII_REDACT_SQL + ", '" + _pat + "', '<" + _kind.upper() + ">', 'g')"
    )

_PII_ORACLE = """
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0
              THEN text || ' contact u' || doc_id::VARCHAR || '@ex.co at 10.0.'
                   || (doc_id % 256)::VARCHAR || '.7 or 555-123-4567'
              ELSE text END AS text
  FROM documents)
SELECT doc_id,
       {counts},
       md5({redact}) AS clean_digest
FROM aug
""".format(counts=_PII_COUNTS_SQL, redact=_PII_REDACT_SQL)


@query(
    "pii_redaction",
    oracle=_PII_ORACLE,
    doc="email/IPv4/phone span counting + placeholder redaction over a "
    "deterministically PII-augmented corpus (patterns in the "
    "Java-regex ∩ RE2 subset).",
)
def pii_redaction(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    aug = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@ex.co at 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 or 555-123-4567"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return corpus.redact_pii(aug)


# ------------------------------------------------------ deterministic split

_SPLIT_ORACLE = """
WITH b AS (
  SELECT doc_id,
         ('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 12))::BIGINT % 100 AS bucket
  FROM documents)
SELECT doc_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'valid'
            ELSE 'test' END AS split
FROM b
"""


@query(
    "train_test_split",
    oracle=_SPLIT_ORACLE,
    doc="deterministic 90/5/5 holdout split by salted id hash — stable "
    "across runs, partitionings, and cluster sizes (unlike randomSplit).",
)
def train_test_split(spark, sf_dir):
    return corpus.hash_split(_docs(spark, sf_dir)).select("doc_id", "bucket", "split")


# ---------------------------------------------------------- quota sampling

_QUOTA = 25

_QUOTA_ORACLE = f"""
WITH scored AS (
  SELECT doc_id,
       {_LANG_SCORES}
  FROM documents),
langs AS (SELECT doc_id, {_LANG_CASE} AS pred_lang FROM scored),
ranked AS (
  SELECT doc_id, pred_lang,
         ROW_NUMBER() OVER (PARTITION BY pred_lang
                            ORDER BY md5('sample:' || doc_id::VARCHAR), doc_id) AS sample_rank
  FROM langs)
SELECT doc_id, pred_lang, sample_rank FROM ranked WHERE sample_rank <= {_QUOTA}
"""


@query(
    "lang_quota_sample",
    oracle=_QUOTA_ORACLE,
    doc=f"per-language quota sample (top {_QUOTA} per predicted language "
    "in salted-hash order) — deterministic corpus balancing.",
)
def lang_quota_sample(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    langs = text.lang_id(docs).select("doc_id", "pred_lang")
    return corpus.quota_sample(langs, "pred_lang", per_group=_QUOTA).select(
        "doc_id", "pred_lang", "sample_rank"
    )
