"""Mergeable Bloom-filter membership sketches as plain column
expressions.

Why this is a first-class operator: membership-at-scale is the other
half of incremental dedup. The persisted band index
(``dedup.band_table``) answers "which *near*-dups touch today's
increment"; a Bloom sketch over exact-content digests answers "which of
today's documents are byte-identical to ANYTHING already ingested"
without joining against the (100 TB-sized) history — the history is
summarized once into ``n_bits`` bits and the daily increment probes
that summary with a broadcast join against ``n_bits/32`` rows.

The sketch is a *value* (one ``(word_idx, bits)`` row per 32-bit word):
per-shard / per-day sketches are built independently (one scan,
map-side combinable ``bit_or``) and merged by unioning the rows and
``bit_or``-ing again — the same mergeability story as the HLL rollups
in ``functions/sketches.py``, with one-sided error (no false
negatives; false-positive rate set by ``n_bits``/``k``/fill).

Engine-portable hashing: the classic Kirsch-Mitzenmacher double-hash
``pos_i = (h1 + i*h2) mod n_bits`` with ``h1``/``h2`` the first/second
8 hex chars of md5(key) — exact 32-bit positive integers in any SQL
engine, so a DuckDB oracle replays every bit. Words are 32 bits wide
(stored in BIGINT) so no shift ever reaches the sign bit in either
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_BITS = 32


def _h(key_col, start: int):
    """Positive 32-bit integer from 8 hex chars of md5(key)."""
    return F.conv(F.substring(F.md5(key_col), start, 8), 16, 10).cast("long")


def _positions(key_col, n_bits: int, k: int):
    """The k Kirsch-Mitzenmacher bit positions of a key."""
    h1, h2 = _h(key_col, 1), _h(key_col, 9)
    return [F.pmod(h1 + i * h2, F.lit(n_bits)) for i in range(k)]


def _mask(pos):
    """``1L << (pos % 32)`` — via call_function, since the Python
    ``F.shiftleft`` wrapper only takes a literal int shift amount.
    Bits stay below the BIGINT sign bit (32-bit words)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(WORD_BITS)).cast("int")
    )


def _check(n_bits: int, k: int) -> None:
    if n_bits <= 0 or n_bits % WORD_BITS != 0:
        raise ValueError(f"n_bits must be a positive multiple of {WORD_BITS}, got {n_bits}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")


def bloom_build(
    df: DataFrame,
    key_col: str = "text",
    *,
    n_bits: int = 8192,
    k: int = 4,
) -> DataFrame:
    """Build a Bloom sketch over ``key_col``: one ``(word_idx, bits)``
    row per 32-bit word that has at least one bit set (absent word ==
    all zeros). Merging sketches = union the rows and re-aggregate
    with the same ``bit_or``.

    Scale shape: explode to k rows per key, one map-side-combinable
    ``bit_or`` aggregation on ``word_idx`` (cardinality ≤ n_bits/32,
    so the shuffle is a few hundred rows regardless of input size).
    """
    _check(n_bits, k)
    pos = F.explode(F.array(*_positions(F.col(key_col), n_bits, k))).alias("__pos")
    return (
        df.select(pos)
        .select(
            F.floor(F.col("__pos") / WORD_BITS).cast("long").alias("word_idx"),
            _mask(F.col("__pos")).alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_might_contain(
    df: DataFrame,
    sketch: DataFrame,
    key_col: str = "text",
    *,
    id_col: str = "doc_id",
    n_bits: int = 8192,
    k: int = 4,
) -> DataFrame:
    """Probe a Bloom sketch: ``(id_col, might_contain)`` with
    ``might_contain = 1`` iff every one of the key's k bits is set.
    No false negatives; false positives at the sketch's fill rate.

    Scale shape: the probe explodes each key to k ``(word_idx, mask)``
    rows and broadcast-joins the ≤ n_bits/32-row sketch — the probed
    corpus never shuffles except the per-id ``min`` fold, which is
    map-side combinable on the id the rows already carry.
    """
    _check(n_bits, k)
    probes = df.select(
        F.col(id_col),
        F.explode(F.array(*_positions(F.col(key_col), n_bits, k))).alias("__pos"),
    ).select(
        id_col,
        F.floor(F.col("__pos") / WORD_BITS).cast("long").alias("word_idx"),
        _mask(F.col("__pos")).alias("__mask"),
    )
    hit = (
        F.when(F.col("bits").isNull(), F.lit(0))
        .otherwise((F.col("bits").bitwiseAND(F.col("__mask")) == F.col("__mask")).cast("int"))
    )
    return (
        probes.join(F.broadcast(sketch), "word_idx", "left")
        .select(id_col, hit.alias("__hit"))
        .groupBy(id_col)
        .agg(F.min("__hit").alias("might_contain"))
    )


def bloom_stats(sketch: DataFrame, *, n_bits: int = 8192, k: int = 4) -> DataFrame:
    """One-row sketch health report: set-bit count, fill fraction, and
    the implied false-positive probability ``fill^k`` (both rounded) —
    the number an operator watches to decide when to widen ``n_bits``.
    """
    _check(n_bits, k)
    set_bits = F.sum(F.bit_count("bits")).cast("long")
    fill = set_bits / F.lit(n_bits)
    return sketch.agg(
        set_bits.alias("set_bits"),
        F.round(fill, 6).alias("fill_frac"),
        F.round(F.pow(fill, F.lit(k)), 6).alias("est_fpp"),
    )
