"""Inverted-index build and boolean / phrase search over a document
corpus.

The index is the classic postings relation — one row per (term,
doc_id) with the term frequency and the sorted 0-based position list —
built in one explode + aggregate pass.  Persisted partitioned by term
(or bucketed on term), it answers queries by touching only the query
terms' postings: an AND query is a postings intersection (equi-joins on
doc_id), a phrase query intersects POSITION lists (the standard
positional-index adjacency walk), and neither ever rescans the corpus
text.  At 100 TB the index build is the one corpus-sized shuffle
(keyed by (term, doc)); every query after that moves only
|query terms| postings lists.

Tokenization matches the house convention (``top_words``,
``text.token_counts``): whitespace split of the trimmed text.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_inverted_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Postings: ``(term, doc_id, tf, positions)`` with ``positions``
    the sorted 0-based token offsets of the term in the document
    (sorted so the relation is deterministic regardless of partition
    layout — collect_list order is not).

    One corpus-sized shuffle keyed by (term, doc); map-side partial
    aggregation collapses repeated terms before the exchange.
    """
    tokens = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.trim(F.col(text_col)), r"\s+")).alias(
            "pos", "term"
        ),
    )
    return tokens.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )


def term_stats(index: DataFrame) -> DataFrame:
    """Per-term document frequency and collection frequency —
    ``(term, df, cf)``; the dictionary a query planner consults to
    order postings intersections rarest-first."""
    return index.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )


def search_all_terms(index: DataFrame, terms: Sequence[str]) -> DataFrame:
    """AND query: ``(doc_id)`` for documents containing EVERY term.

    One filtered index scan (the ``term IN (...)`` predicate pushes
    into the index's term partitioning) + a per-doc distinct-term
    count — only the query terms' postings move.
    """
    terms = list(dict.fromkeys(terms))  # dedupe, keep order
    if not terms:
        raise ValueError("terms must be non-empty")
    return (
        index.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("__n"))
        .filter(F.col("__n") == len(terms))
        .select("doc_id")
    )


def phrase_search(index: DataFrame, phrase: Sequence[str]) -> DataFrame:
    """Exact-phrase query via the positional adjacency walk: returns
    ``(doc_id, n_matches, first_pos)`` for documents containing the
    consecutive token sequence, with ``first_pos`` the 0-based offset
    of its first occurrence.

    ``len(phrase) - 1`` equi-joins on doc_id, each shrinking the
    carried start-position list to starts whose (i)-th successor is the
    (i)-th phrase term; postings for repeated phrase terms are reused
    from the same filtered scan.
    """
    phrase = list(phrase)
    if not phrase:
        raise ValueError("phrase must be non-empty")
    postings = index.filter(F.col("term").isin(list(set(phrase))))

    # closure factory, NOT a default-arg lambda: a 2-parameter lambda
    # is dispatched by Spark as (element, index) (the applyInPandas
    # arity rule — see NOTES.md round-4 gotcha)
    def _adjacent(off: int):
        return lambda p: F.array_contains(F.col("__nxt"), p + off)

    cur = postings.filter(F.col("term") == phrase[0]).select(
        "doc_id", F.col("positions").alias("__starts")
    )
    for i, t in enumerate(phrase[1:], start=1):
        nxt = postings.filter(F.col("term") == t).select(
            "doc_id", F.col("positions").alias("__nxt")
        )
        cur = (
            cur.join(nxt, "doc_id")
            .select(
                "doc_id",
                F.filter(F.col("__starts"), _adjacent(i)).alias("__starts"),
            )
            .filter(F.size("__starts") > 0)
        )
    return cur.select(
        "doc_id",
        F.size("__starts").cast("long").alias("n_matches"),
        F.element_at("__starts", 1).alias("first_pos"),
    )
