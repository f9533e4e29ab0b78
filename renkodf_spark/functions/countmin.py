"""Mergeable count-min frequency sketches as plain column expressions.

Bloom (``functions/bloom.py``) answers "have we seen this key at all";
count-min answers "roughly HOW OFTEN" — the heavy-hitter primitive a
curation pipeline needs for boilerplate detection, hot-domain tracking,
and skew monitoring when the key space (n-grams, URLs, user ids) is far
too large to hold exact counts for.  The sketch is ``depth`` rows of
``width`` counters; each key increments one counter per row, and the
estimate is the MIN over its ``depth`` counters — a one-sided
overestimate (collisions only ever inflate), with error ≤ 2N/width at
confidence 1 - (1/2)^depth (Cormode & Muthukrishnan 2005).

Scale shape mirrors the Bloom build: the corpus scan explodes each key
to ``depth`` (row, col) cells and ONE map-side-combinable SUM shuffles
at most ``depth × width`` rows no matter the input size; merging two
sketches is union + the same SUM (counters are linear).  Probing
broadcast-joins the ≤ depth×width-row sketch, so the probed side never
shuffles except its own per-key fold.

Engine-portable hashing: the same Kirsch-Mitzenmacher double-hash as
the Bloom sketch — ``col_d = (h1 + d*h2) mod width`` with ``h1``/``h2``
the first/second 8 hex chars of md5(key) — exact 32-bit positive
integers in any SQL engine, so a DuckDB oracle replays every counter
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _h(key_col, start: int):
    """Positive 32-bit integer from 8 hex chars of md5(key)."""
    return F.conv(F.substring(F.md5(key_col), start, 8), 16, 10).cast("long")


def _check(width: int, depth: int) -> None:
    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")
    if depth <= 0:
        raise ValueError(f"depth must be positive, got {depth}")


def _cells(key_col, width: int, depth: int):
    """The key's (row, col) counter cells as an array of structs."""
    h1, h2 = _h(key_col, 1), _h(key_col, 9)
    return F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("row"),
                F.pmod(h1 + d * h2, F.lit(width)).cast("long").alias("col"),
            )
            for d in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch over ``key_col``: one
    ``(row, col, count)`` row per non-zero counter.  ``weight_col``
    (integer) makes it a weighted sketch (e.g. token counts per doc);
    default weight is 1 per input row.

    Merging sketches = union the rows and re-aggregate with the same
    SUM — counters are linear, so a per-day build folded into a
    lifetime sketch equals the sketch of the concatenated input.
    """
    _check(width, depth)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cell = F.explode(_cells(F.col(key_col), width, depth)).alias("__cell")
    return (
        df.select(cell, w.alias("__w"))
        .select(
            F.col("__cell.row").alias("row"),
            F.col("__cell.col").alias("col"),
            F.col("__w"),
        )
        .groupBy("row", "col")
        .agg(F.sum("__w").alias("count"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Fold several count-min sketches (same width/depth) into one."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    acc = sketches[0]
    for s in sketches[1:]:
        acc = acc.unionByName(s)
    return acc.groupBy("row", "col").agg(F.sum("count").alias("count"))


def cms_estimate(
    df: DataFrame,
    sketch: DataFrame,
    key_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Estimate each distinct probe key's frequency: ``(key_col,
    est_count)`` with ``est_count = min`` over the key's ``depth``
    counters (0 if any counter row is absent — absent == never
    incremented).  Guaranteed ``est_count >= true count`` for keys that
    went into the sketch.

    Scale shape: distinct keys explode to ``depth`` cells, the sketch
    (≤ width×depth rows) broadcasts, and the per-key MIN folds on the
    key the rows already carry.
    """
    _check(width, depth)
    probes = (
        df.select(F.col(key_col)).distinct()
        .select(
            key_col,
            F.explode(_cells(F.col(key_col), width, depth)).alias("__cell"),
        )
        .select(
            key_col,
            F.col("__cell.row").alias("row"),
            F.col("__cell.col").alias("col"),
        )
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .select(key_col, F.coalesce(F.col("count"), F.lit(0)).alias("__c"))
        .groupBy(key_col)
        .agg(F.min("__c").alias("est_count"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    sketch: DataFrame,
    key_col: str,
    *,
    min_count: int,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Sketch-then-verify heavy hitters: candidate keys whose count-min
    ESTIMATE reaches ``min_count`` (no false negatives — estimates only
    overestimate) are verified with an exact count restricted to the
    candidate set.  Returns ``(key_col, est_count, exact_count)`` for
    keys whose EXACT count reaches the threshold.

    This is the two-phase shape that makes heavy-hitter detection
    feasible when the key space is too large for exact per-key counts:
    phase 1 probes the O(width×depth) sketch; phase 2 re-scans the
    corpus but aggregates ONLY rows whose key survived phase 1 (a
    broadcast-able candidate semi-join), so the exact-count shuffle
    carries the few heavy candidates, not the whole key space.
    """
    if min_count <= 0:
        raise ValueError(f"min_count must be positive, got {min_count}")
    cands = cms_estimate(df, sketch, key_col, width=width, depth=depth).filter(
        F.col("est_count") >= min_count
    )
    exact = (
        df.join(F.broadcast(cands.select(key_col)), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("exact_count"))
        .filter(F.col("exact_count") >= min_count)
    )
    return exact.join(F.broadcast(cands), key_col).select(
        key_col, "est_count", "exact_count"
    )
