"""Streaming NEAR-duplicate detection: the incremental LSH band index
(operators/dedup.py band_table / incremental_lsh_pairs) composed into a
``foreachBatch`` Structured Streaming job.

This is the production ingestion shape at 100 TB: the historical corpus
is shingled ONCE — its band table persisted as the index — and each
arriving micro-batch shingles only its own documents, equi-joins the
stored index on ``(band, key)`` for cross-batch candidates, adds its
within-batch candidates, then appends its own bands to the index.
Historical text is never re-read; per-trigger cost is
O(batch x bands + matched buckets), independent of corpus age.

Layout & idempotence: both the index and the pairs output are written
as ``batch_id=N`` partition directories with per-batch OVERWRITE, so a
replayed micro-batch (foreachBatch's at-least-once contract) rewrites
its own partition instead of duplicating rows — the composition is
exactly-once at the directory level. The batch's bands are written
FIRST and read back for the join, so shingling runs once per document
ever (not once per downstream consumer), and the baseline is simply
"every batch_id but mine".

Scale notes: the index is the narrow ``(id, band, key)`` relation —
bytes per doc, not the text. Production would bucket it by ``(band,
key)`` on write (sources/lakehouse-style) to make the increment join
co-located; the candidate-pair volume is bounded by the banding
parameters exactly as in the batch operator.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from renkodf_spark.operators.dedup import band_table, incremental_lsh_pairs

_BAND_COLS = ["id", "band", "key"]


def neardup_batch_writer(
    index_path: str,
    pairs_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    band_size: int = 2,
    shingle_n: int = 3,
):
    """Build the ``foreachBatch(batch_df, batch_id)`` callable.

    Per micro-batch: shingle/minhash/band ONLY the batch's documents,
    persist them under ``index_path/batch_id=N``, join every OLDER band
    in the index for cross-batch candidates plus the within-batch
    self-join, and persist the distinct ``(id_a, id_b)`` candidates
    under ``pairs_path/batch_id=N``. Equivalent (union over batches) to
    running the uncapped batch ``minhash_lsh_pairs`` over the corpus
    ingested so far — the property the two-trigger parity test pins.
    """

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        bands = band_table(
            batch,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            band_size=band_size,
            shingle_n=shingle_n,
        )
        bands.write.mode("overwrite").parquet(
            posixpath.join(index_path, f"batch_id={batch_id}")
        )
        indexed = spark.read.parquet(index_path)
        new = indexed.filter(F.col("batch_id") == batch_id).select(*_BAND_COLS)
        old = indexed.filter(F.col("batch_id") != batch_id).select(*_BAND_COLS)
        pairs = incremental_lsh_pairs(new, old, include_within_new=True)
        pairs.write.mode("overwrite").parquet(
            posixpath.join(pairs_path, f"batch_id={batch_id}")
        )

    return write_batch


def start_neardup_stream(
    docs: DataFrame,
    *,
    index_path: str,
    pairs_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    band_size: int = 2,
    shingle_n: int = 3,
):
    """Start the streaming near-dup job over a streaming ``docs`` frame.

    Returns the StreamingQuery; candidates accumulate under
    ``pairs_path`` and the growing band index under ``index_path``.
    """
    writer = neardup_batch_writer(
        index_path,
        pairs_path,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        band_size=band_size,
        shingle_n=shingle_n,
    )
    return (
        docs.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint)
        .start()
    )
