"""Streaming MERGE (keyed upsert/delete) state: maintain the current
version of a keyed table from a change stream.

Each trigger applies :func:`operators.snapshot.merge_into` to the
latest persisted snapshot — updates win on matched keys, unmatched
source rows insert, ``delete_col``-flagged rows delete — and writes
the NEW current version as one snapshot partition.  This is the
ingestion-time half of the CDC story whose batch halves are
``snapshot_diff`` (derive a change feed) and ``merge_into`` (apply
one); composed here they give "keep a queryable current-state table
up to date from a stream of upserts" without any table-format engine.

State layout follows the house sketch-writer convention
(``curation_stream.bloom_dedup_writer``): one FULL snapshot per
trigger under ``batch_id=N`` via partition overwrite — an
at-least-once replay of batch ``N`` recomputes against the same
immutable prior snapshot, so replays are idempotent — and each
trigger reads only the LATEST prior snapshot, so the state read is
O(table), never O(triggers).  Readers get the current table with a
plain ``spark.read.parquet(path).filter(batch_id == max)``.

Full-snapshot-per-trigger trades write amplification for replay
safety and zero-compaction reads; for a table far larger than the
per-trigger delta, persist the merged result through
``sources/lakehouse.VersionedTable`` instead and vacuum old versions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from renkodf_spark.operators.snapshot import merge_into
from renkodf_spark.streaming.curation_stream import _is_missing_path


def merge_writer(
    state_path: str,
    *,
    keys: list[str],
    delete_col: str | None = None,
):
    """``foreachBatch`` writer maintaining a keyed current-state table.

    The micro-batch must carry the table columns (plus the optional
    boolean ``delete_col``).  Duplicate keys WITHIN one micro-batch are
    resolved before the merge by keeping the row with the highest
    ``__seq`` if present, else arbitrarily-but-deterministically by the
    key hash order of the remaining columns — pass a monotonically
    increasing sequence column in the stream when intra-batch ordering
    matters.
    """

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        import posixpath

        spark = batch.sparkSession

        # collapse intra-batch duplicate keys: last-by-__seq wins when
        # the stream carries one, else by a deterministic row digest
        from pyspark.sql.window import Window

        order = (
            F.col("__seq").desc()
            if "__seq" in batch.columns
            else F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in batch.columns])).desc()
        )
        w = Window.partitionBy(*keys).orderBy(order)
        src = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", *(["__seq"] if "__seq" in batch.columns else []))
        )
        tbl_cols = [c for c in src.columns if c != delete_col]

        try:
            snaps = spark.read.parquet(state_path).filter(F.col("batch_id") < batch_id)
            latest = snaps.agg(F.max("batch_id")).collect()[0][0]  # bounded scalar
            prior = (
                snaps.filter(F.col("batch_id") == latest).select(*tbl_cols)
                if latest is not None
                else None
            )
        except Exception as exc:
            if not _is_missing_path(exc):
                raise
            prior = None
        if prior is None:
            # first trigger: the table is the batch's own non-deleted rows
            merged = (
                src.filter(~F.coalesce(F.col(delete_col), F.lit(False))).select(*tbl_cols)
                if delete_col
                else src.select(*tbl_cols)
            )
        else:
            merged = merge_into(prior, src, keys=keys, delete_col=delete_col)
        merged.write.mode("overwrite").parquet(
            posixpath.join(state_path, f"batch_id={batch_id}")
        )

    return write_batch


def scd2_writer(
    state_path: str,
    *,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    seq_col: str | None = None,
):
    """``foreachBatch`` writer maintaining an SCD Type-2 dimension from
    a change-log stream: the persisted state is the full episode table
    (``operators/scd.scd2_from_changelog`` output) and each trigger
    recomputes ONLY the keys present in the micro-batch.

    Correctness hinges on SCD2 being a per-key pure function of the
    key's full changelog, so the writer persists two things:

    * ``<path>/log`` — the raw changelog, APPENDED per trigger under
      ``batch_id=N`` (partition overwrite → replay-idempotent);
    * ``<path>/dim`` — one full episode snapshot per trigger
      (``batch_id=N``), assembled as "prior episodes for untouched
      keys" + "recomputed episodes for the batch's keys", where the
      recompute reads the key-filtered persisted log (including this
      batch).  Late rows are handled exactly: a row older than a key's
      current episodes simply re-derives that key's history.

    State reads per trigger: the latest dim snapshot (O(table)) plus
    the affected keys' log rows (a key-filtered scan of the appended
    log — prunable by key-partitioning the log when key cardinality
    allows).  Read the current dimension with
    ``spark.read.parquet(path + "/dim").filter(batch_id == max)``.
    """
    from renkodf_spark.operators.scd import scd2_from_changelog

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        import posixpath

        spark = batch.sparkSession
        log_cols = [*key_cols, ts_col, *attr_cols] + ([seq_col] if seq_col else [])
        batch.select(*log_cols).write.mode("overwrite").parquet(
            posixpath.join(state_path, "log", f"batch_id={batch_id}")
        )

        keys = batch.select(*key_cols).distinct()
        full_log = (
            spark.read.parquet(posixpath.join(state_path, "log"))
            .filter(F.col("batch_id") <= batch_id)
            .drop("batch_id")
        )
        recomputed = scd2_from_changelog(
            full_log.join(F.broadcast(keys), key_cols, "left_semi"),
            key_cols=key_cols,
            ts_col=ts_col,
            attr_cols=attr_cols,
            seq_col=seq_col,
        )
        dim_cols = [*key_cols, *attr_cols, "effective_from", "effective_to",
                    "is_current"]

        try:
            snaps = spark.read.parquet(posixpath.join(state_path, "dim")).filter(
                F.col("batch_id") < batch_id
            )
            latest = snaps.agg(F.max("batch_id")).collect()[0][0]  # bounded scalar
            prior = (
                snaps.filter(F.col("batch_id") == latest).select(*dim_cols)
                if latest is not None
                else None
            )
        except Exception as exc:
            if not _is_missing_path(exc):
                raise
            prior = None

        if prior is None:
            merged = recomputed.select(*dim_cols)
        else:
            untouched = prior.join(F.broadcast(keys), key_cols, "left_anti")
            merged = untouched.unionByName(recomputed.select(*dim_cols))
        merged.write.mode("overwrite").parquet(
            posixpath.join(state_path, "dim", f"batch_id={batch_id}")
        )

    return write_batch


def funnel_writer(
    state_path: str,
    *,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    horizon=None,
):
    """``foreachBatch`` writer maintaining per-user funnel state
    (``operators/funnel.funnel_steps`` output) from an event stream —
    the same affected-keys recompute pattern as :func:`scd2_writer`:
    funnel completion is a per-user pure function of the user's full
    event history, so each trigger appends the raw events
    (``<path>/log``, replay-idempotent partition overwrites) and
    recomputes funnel rows ONLY for the users present in the
    micro-batch, carrying untouched users from the prior snapshot
    (``<path>/state``).  Late and out-of-order events are handled
    exactly — a late step-1 event re-derives the user's whole chain.
    """
    from renkodf_spark.operators.funnel import funnel_steps

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        import posixpath

        spark = batch.sparkSession
        batch.select(user_col, ts_col, type_col).write.mode("overwrite").parquet(
            posixpath.join(state_path, "log", f"batch_id={batch_id}")
        )
        users = batch.select(user_col).distinct()
        full_log = (
            spark.read.parquet(posixpath.join(state_path, "log"))
            .filter(F.col("batch_id") <= batch_id)
            .drop("batch_id")
        )
        recomputed = funnel_steps(
            full_log.join(F.broadcast(users), user_col, "left_semi"),
            user_col=user_col,
            ts_col=ts_col,
            type_col=type_col,
            steps=steps,
            horizon=horizon,
        )
        cols = recomputed.columns
        try:
            snaps = spark.read.parquet(posixpath.join(state_path, "state")).filter(
                F.col("batch_id") < batch_id
            )
            latest = snaps.agg(F.max("batch_id")).collect()[0][0]  # bounded scalar
            prior = (
                snaps.filter(F.col("batch_id") == latest).select(*cols)
                if latest is not None
                else None
            )
        except Exception as exc:
            if not _is_missing_path(exc):
                raise
            prior = None
        merged = (
            recomputed
            if prior is None
            else prior.join(F.broadcast(users), user_col, "left_anti").unionByName(
                recomputed
            )
        )
        merged.write.mode("overwrite").parquet(
            posixpath.join(state_path, "state", f"batch_id={batch_id}")
        )

    return write_batch


def search_index_writer(
    state_path: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
):
    """``foreachBatch`` writer maintaining a searchable inverted index
    from a document stream — the incremental counterpart of
    ``operators/search.write_search_index``:

    * postings for each micro-batch's documents are computed from the
      batch ALONE (documents are append-only, so (term, doc) rows
      never conflict across triggers) and written under
      ``<path>/postings/batch_id=N/tb=...`` — the same term-hash
      bucketing as the batch index, so a reader prunes to query-term
      buckets across ALL generations with one static filter;
    * BM25 stats are additive, so ``<path>/doclen`` gains one
      append-only generation per trigger and ``<path>/stats`` gets a
      cumulative one-row snapshot per trigger (latest-only reads, the
      CMS-writer pattern).

    The append-only contract is ENFORCED, not assumed (ADVICE r7): a
    ``doc_id`` that reappears in a later micro-batch is dropped before
    indexing — the prior doclen generations are the seen-id set, so a
    re-send can't double-count ``n_docs``/``total_tokens`` or leave
    duplicate ``(term, doc)`` postings across generations. Intra-batch
    duplicate ids collapse deterministically (smallest text digest
    wins) so at-least-once replays of the same batch index the same
    row. The anti-join probes only the id column of prior generations
    (never the text), and replays are idempotent because batch ``N``
    only ever probes generations ``< N``.

    All writes are partition overwrites keyed by batch_id →
    at-least-once replays are idempotent.  Query with
    :func:`read_postings_stream` / the batch BM25 over its output.
    """
    from renkodf_spark.operators.search import (
        _term_bucket_expr,
        build_inverted_index,
    )

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        import posixpath

        from pyspark.sql.window import Window

        spark = batch.sparkSession
        # collapse intra-batch duplicate ids deterministically
        w = Window.partitionBy(id_col).orderBy(F.md5(F.col(text_col)).asc())
        batch = (
            batch.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        # enforce append-only: drop ids already indexed by a PRIOR
        # generation (doclen is the seen-id set; batch N probes only
        # generations < N, so replays of N are idempotent)
        try:
            seen = (
                spark.read.parquet(posixpath.join(state_path, "doclen"))
                .filter(F.col("batch_id") < batch_id)
                .select(F.col("doc_id").alias(id_col))
                .distinct()
            )
            batch = batch.join(seen, id_col, "left_anti")
        except Exception as exc:
            if not _is_missing_path(exc):
                raise
        idx = build_inverted_index(batch, id_col=id_col, text_col=text_col)
        idx.withColumn("tb", _term_bucket_expr(F.col("term"), n_buckets)).write.mode(
            "overwrite"
        ).partitionBy("tb").parquet(
            posixpath.join(state_path, "postings", f"batch_id={batch_id}")
        )
        idx.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl")).write.mode(
            "overwrite"
        ).parquet(posixpath.join(state_path, "doclen", f"batch_id={batch_id}"))

        cur = idx.groupBy().agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            # coalesce: a fully-deduped (empty) batch sums to NULL
            F.coalesce(F.sum("tf"), F.lit(0)).cast("long").alias("total_tokens"),
        )
        try:
            snaps = spark.read.parquet(posixpath.join(state_path, "stats")).filter(
                F.col("batch_id") < batch_id
            )
            latest = snaps.agg(F.max("batch_id")).collect()[0][0]  # bounded scalar
            prior = (
                snaps.filter(F.col("batch_id") == latest).select(
                    "n_docs", "total_tokens"
                )
                if latest is not None
                else None
            )
        except Exception as exc:
            if not _is_missing_path(exc):
                raise
            prior = None
        merged = (
            cur
            if prior is None
            else prior.unionByName(cur).agg(
                F.sum("n_docs").cast("long").alias("n_docs"),
                F.sum("total_tokens").cast("long").alias("total_tokens"),
            )
        )
        merged.write.mode("overwrite").parquet(
            posixpath.join(state_path, "stats", f"batch_id={batch_id}")
        )
        spark.createDataFrame([(int(n_buckets),)], "n_buckets long").write.mode(
            "overwrite"
        ).parquet(posixpath.join(state_path, "meta"))

    return write_batch


def read_postings_stream(spark, state_path: str, terms):
    """Bucket-pruned postings scan over a :func:`search_index_writer`
    index: every generation's ``tb=`` partitions for the query terms'
    buckets, with the same driver-side static bucket-id computation as
    the batch ``read_postings``."""
    from renkodf_spark.operators.search import _term_bucket_py

    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    n_buckets = spark.read.parquet(state_path + "/meta").collect()[0]["n_buckets"]
    buckets = sorted({_term_bucket_py(t, n_buckets) for t in terms})
    return (
        spark.read.parquet(state_path + "/postings")
        .filter(F.col("tb").isin(buckets) & F.col("term").isin(terms))
        .drop("tb", "batch_id")
    )
