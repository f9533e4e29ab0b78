"""Streaming corpus curation: ingestion-time dedup and quality
filtering over an unbounded document stream.

The batch curation operators (operators/corpus.py, operators/text.py)
assume a bounded corpus; an ingestion pipeline sees documents arrive
continuously and wants duplicates dropped and junk filtered *before*
they land in the lake. Structured Streaming expresses both directly:

- dedup: ``dropDuplicates`` on a content digest keeps per-key state;
  with a watermark on the event-time column the state is bounded —
  a duplicate arriving within the watermark horizon is dropped, one
  arriving later than the horizon may be re-admitted (that's the
  documented contract of watermarked streaming dedup, and the batch
  ``exact_dedup`` pass downstream is the backstop).
- quality gate: pure column predicates, identical to the batch
  ``quality_score`` buckets — stateless, so it adds no streaming
  state at all.

Scale: state lives in the state store keyed by digest, sized by
(arrival rate x watermark horizon), not by corpus size; the quality
filter is a narrow map. No Python in either path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    docs: DataFrame,
    *,
    text_col: str = "text",
    time_col: str = "event_time",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop exact-content duplicates from a streaming document source.

    Keys state on ``md5(text)`` (16 bytes/doc, not the text itself) and
    bounds it with ``dropDuplicatesWithinWatermark``: state for a
    digest is dropped once the watermark passes its event time, so
    memory is (rate x horizon)-bounded on an unbounded stream.

    ``dropDuplicatesWithinWatermark`` — NOT plain ``dropDuplicates`` —
    is load-bearing: a ``dropDuplicates`` subset that excludes the
    event-time column never evicts its state no matter the watermark
    (the watermark is inert for it), which silently rebuilds the
    unbounded-state problem this operator exists to avoid.
    """
    keyed = docs.withColumn("content_hash", F.md5(F.col(text_col)))
    return keyed.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def rate_gate(
    docs: DataFrame,
    rates: float | dict,
    *,
    group_col: str | None = None,
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Stateless streaming down-sampling: :func:`renkodf_spark.
    operators.corpus.rate_sample` applied at ingestion. Because the
    sample is a pure function of ``(salt, id)`` — not of arrival order,
    trigger boundaries, or state — the streamed sample is EXACTLY the
    batch sample of the same rows (pinned by test), replays are
    idempotent, and there is no streaming state at all (survives any
    rate; contrast the watermark-bounded dedup above)."""
    from renkodf_spark.operators.corpus import rate_sample

    return rate_sample(
        docs, rates, group_col=group_col, default_rate=default_rate,
        id_col=id_col, salt=salt,
    )


def quality_gate(
    docs: DataFrame,
    *,
    text_col: str = "text",
    min_words: int = 5,
    max_punct_ratio: float = 0.1,
) -> DataFrame:
    """Stateless streaming quality filter: the same keep/flag rules as
    the batch ``text.quality_score`` bucket, as pure predicates (no
    state, no shuffle — survives any input rate)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.size(toks)
    n_chars = F.length(F.col(text_col))
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    return docs.filter(
        (n_words >= min_words) & (F.try_divide(punct, n_chars) <= max_punct_ratio)
    )
