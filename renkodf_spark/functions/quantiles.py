"""Mergeable relative-error quantile sketch — an integer-exact
DDSketch variant (Masson/Rim/Lee, "DDSketch: a fast and fully-mergeable
quantile sketch with relative-error guarantees", VLDB 2019).

DDSketch buckets values geometrically (bucket = ceil(log_gamma x)),
which makes bucket assignment float-sensitive at boundaries — a
cross-engine hash-match hazard. This variant keeps the geometric idea
but makes every step integer-exact: for a positive integer value v,

    e = floor(log2 v)            (= length(bin(v)) - 1, exact)
    p = 2^e
    m = floor((v - p) * k / p)   (k a power of two; sub-bucket in [0, k))

i.e. k linearly-spaced sub-buckets per octave — the classical
"log-linear" histogram. Bucket (e, m) spans [p + ceil(m*p/k),
p + ceil((m+1)*p/k)), so its width is at most p/k + 1 and any value it
contains is within relative error 1/k of the bucket's lower bound
(plus at most 1 from integer ceil). Zero gets a dedicated exact bucket
(e = -1, m = 0).

Signed domain (r13): negative values get MIRRORED octaves so the
sketch can summarize the engine's own negative quality scores
(unigram/bigram/NB integer micro-nats). For v < 0 with u = -v:

    e = -(floor(log2 u)) - 2     (e = -2 is the [-1] octave, -3 is
                                  [-3, -2], ... — descending e =
                                  descending value)
    m = k - 1 - m_u(u)           (mirrored sub-bucket)

so ascending (e, m) remains ascending VALUE across the whole signed
line: negative octaves (e <= -2) < zero (e = -1) < positive (e >= 0).
Rank/cumulative logic needs no change. The bucket's lower bound
(smallest, most-negative member) is 1 - hi_u where hi_u is the
EXCLUSIVE upper bound of the mirrored positive bucket, computed with
the same shift arithmetic; the relative-error guarantee is unchanged
(|v - est| <= width <= |v|/k + 1).

Overflow discipline: (v - p) * k can exceed BIGINT for v near 2^62, so
m is computed with shifts — k = 2^b, and

    e >= b:  m = (v - p) >> (e - b)          (exact, no widening)
    e <  b:  m = ((v - p) << b) div p        ((v-p) < p < k: tiny)

Both branches and the bin()/shift primitives evaluate identically in
Spark SQL and DuckDB, so the oracle hash-matches every bucket.

Signed domain bounds: every BIGINT value except -2^63 itself is
supported (that magnitude has no BIGINT form; see bucket_exprs). The
extreme negative octave's floor is computed with the reassociated
``(1 - p) - tail`` chain so no intermediate leaves BIGINT range
(ADVICE r13; the naive ``1 - hi_u`` formed 2^63 and errored under
DuckDB / ANSI Spark).

Why this shape at 100 TB: the sketch is a tiny additive relation —
counts per (group, e, m), at most ~64 octaves x k rows per group
regardless of data size. groupBy builds it with map-side partial
aggregation (one narrow shuffle); merging finer sketches to coarser
groupings is a SUM (see :func:`merge_sketches`); the streaming twin
appends per-trigger partial counts (curation_stream.quantile_sketch_
writer). Quantile extraction never touches raw data: one window
cumulative sum over the few-thousand-row sketch.

The reference engine (srlcarlg/renkodf) has no sketch surface; this
joins HLL/Bloom/count-min in the training-data-pipeline extension
mandate (SURVEY.md north-star extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 64  # 2^6 sub-buckets per octave: relative error <= 1/64 ~ 1.6%


def _validate_k(k: int) -> int:
    """k must be a power of two (the shift-based m needs it); returns b = log2 k."""
    if not (isinstance(k, int) and k >= 2 and (k & (k - 1)) == 0):
        raise ValueError(f"k must be a power of two >= 2, got {k}")
    return k.bit_length() - 1


def _pos_e_sql(u: str) -> str:
    """SQL for floor(log2 u), u a strictly positive BIGINT expression."""
    return f"CAST(length(bin({u})) - 1 AS INT)"


def _pos_m_sql(u: str, b: int) -> str:
    """SQL for the sub-bucket of a strictly positive BIGINT expression
    — all shifts, exact in both Spark and DuckDB."""
    return f"""CASE WHEN length(bin({u})) - 1 >= {b}
            THEN shiftright({u} - shiftleft(CAST(1 AS BIGINT), CAST(length(bin({u})) - 1 AS INT)),
                            CAST(length(bin({u})) - 1 - {b} AS INT))
            ELSE shiftleft({u} - shiftleft(CAST(1 AS BIGINT), CAST(length(bin({u})) - 1 AS INT)),
                           {b})
                 div shiftleft(CAST(1 AS BIGINT), CAST(length(bin({u})) - 1 AS INT))
            END"""


def bucket_exprs(value_col: str, k: int = DEFAULT_K):
    """The (e, m) bucket columns for a signed BIGINT column — shared by
    the batch builder, the streaming writer, and the guarantee check
    (bucket-of-exact == selected bucket). Positive values use octaves
    e >= 0, zero the exact (e=-1, m=0) bucket, negatives the mirrored
    octaves e <= -2 (module docstring) so (e, m) order == value order.

    Domain: every BIGINT except -2^63 exactly — u = -v has no BIGINT
    form there (non-ANSI Spark wraps it back to -2^63 and bin() sees a
    negative), and the containing bucket's floor would sit below BIGINT
    min regardless. All other values, including the extreme negative
    octave down to -2^63+1, bucket and floor exactly (ADVICE r13
    reassociation in bucket_floor_expr)."""
    b = _validate_k(k)
    v = value_col
    neg = f"(-({v}))"  # u = -v, strictly positive when v < 0
    e = (
        F.when(F.col(v) == 0, F.lit(-1))
        .when(F.col(v) < 0, F.expr(f"-({_pos_e_sql(neg)}) - 2"))
        .otherwise(F.expr(_pos_e_sql(v)))
    )
    m = (
        F.when(F.col(v) == 0, F.lit(0).cast("long"))
        .when(F.col(v) < 0, F.lit(k - 1) - F.expr(_pos_m_sql(neg, b)))
        .otherwise(F.expr(_pos_m_sql(v, b)))
    )
    return e.alias("e"), m.alias("m")


def bucket_floor_expr(k: int = DEFAULT_K):
    """Lower bound of bucket (e, m): the smallest integer the bucket
    contains — p + ceil(m * p / k) for positive octaves, computed with
    shifts (e >= b) or in tiny integers (e < b). e = -1 is the exact
    zero bucket. Negative octaves (e <= -2) mirror: the smallest
    (most-negative) member is 1 - hi_u, where hi_u is the EXCLUSIVE
    upper bound of the mirrored positive bucket (eu = -e-2,
    mu = k-1-m); (mu+1) * 2^eu is exactly divisible by k when eu >= b,
    so that branch needs no ceil.

    Overflow (ADVICE r13): for the extreme negative octave (e = -64,
    m = 0 — values <= -(2^62 + 63*2^56)) hi_u is 2^63, which BIGINT
    cannot hold, so the naive ``1 - hi_u`` errors in DuckDB/ANSI Spark.
    Reassociating as ``(1 - p) - tail`` keeps every INTERMEDIATE in
    range: 1 - 2^62 fits, and subtracting tail <= 2^62 lands on
    1 - 2^63 = BIGINT min + 1, also representable. Both engines
    evaluate the subtraction chain left-to-right, so the floor is now
    exact over the full signed domain except v = -2^63 itself (whose
    magnitude has no BIGINT form — see bucket_exprs)."""
    b = _validate_k(k)
    return (
        F.when(F.col("e") == -1, F.lit(0).cast("long"))
        .when(
            F.col("e") < -1,
            F.expr(
                f"""(CASE WHEN (-e - 2) >= {b}
                THEN (1 - shiftleft(CAST(1 AS BIGINT), CAST(-e - 2 AS INT)))
                     - ({k} - m) * shiftleft(CAST(1 AS BIGINT), CAST(-e - 2 - {b} AS INT))
                ELSE (1 - shiftleft(CAST(1 AS BIGINT), CAST(-e - 2 AS INT)))
                     - shiftright(({k} - m) * shiftleft(CAST(1 AS BIGINT), CAST(-e - 2 AS INT)) + {k - 1}, {b})
                END)"""
            ),
        )
        .otherwise(
            F.expr(
                f"""CASE WHEN e >= {b}
            THEN shiftleft(CAST(1 AS BIGINT), CAST(e AS INT))
                 + m * shiftleft(CAST(1 AS BIGINT), CAST(e - {b} AS INT))
            ELSE shiftleft(CAST(1 AS BIGINT), CAST(e AS INT))
                 + shiftright(m * shiftleft(CAST(1 AS BIGINT), CAST(e AS INT)) + {k - 1}, {b})
            END"""
            )
        )
    )


def quantile_sketch(
    df: DataFrame,
    group_cols: list[str] | str,
    value_col: str,
    *,
    k: int = DEFAULT_K,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: (group_cols..., e, m, cnt). One narrow shuffle
    with map-side partial aggregation; output size is bounded by
    groups x octaves x k, independent of row count.

    ``weight_col`` (non-negative BIGINT) switches to the WEIGHTED
    sketch: cnt becomes the bucket's total weight, and downstream
    quantiles are mass-weighted ranks — e.g. value = doc length,
    weight = doc length answers "half the corpus BYTES sit in docs
    shorter than the weighted median". Same mergeability (sums), same
    guarantee with rank measured in weight."""
    _validate_k(k)
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    e, m = bucket_exprs(value_col, k)
    cols = [*group_cols, e, m] + ([F.col(weight_col)] if weight_col else [])
    agg = (
        F.sum(weight_col).cast("long").alias("cnt")
        if weight_col
        else F.count(F.lit(1)).alias("cnt")
    )
    return df.select(*cols).groupBy(*group_cols, "e", "m").agg(agg)


def merge_sketches(sketches: DataFrame, group_cols: list[str] | str) -> DataFrame:
    """Merge finer sketches to a coarser grouping — counts are additive,
    so this is one SUM over the tiny sketch relation (the
    rollup_sketches shape: no raw-data rescan)."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    return sketches.groupBy(*group_cols, "e", "m").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def sketch_quantiles(
    sketch: DataFrame,
    group_cols: list[str] | str,
    quantiles: list[tuple[int, int]],
    *,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Extract quantile estimates from a sketch. ``quantiles`` are
    integer rationals (q_num, q_den); for each, the target rank is
    r = ceil(q * n) (1-indexed) and the estimate is the LOWER BOUND of
    the first bucket (ascending (e, m)) whose cumulative count reaches
    r — the bucket that contains the exact order statistic, hence
    within relative error 1/k of it (see module docstring).

    Output: (group_cols..., q_pct, n, r, est) with q_pct = the exact
    integer permille (q_num * 1000 / q_den must divide evenly —
    keeps the label integer-exact)."""
    _validate_k(k)
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    for q_num, q_den in quantiles:
        if not (0 < q_num <= q_den) or (q_num * 1000) % q_den:
            raise ValueError(f"quantile {q_num}/{q_den} must be in (0,1] with an exact permille")
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("e", "m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sketch.withColumn("__cum", F.sum("cnt").over(w)).withColumn(
        "__n", F.sum("cnt").over(Window.partitionBy(*group_cols))
    )
    outs = []
    for q_num, q_den in quantiles:
        # r = ceil(q_num * n / q_den) in pure BIGINT arithmetic. The naive
        # (q_num * n + q_den - 1) div q_den overflows BIGINT once n exceeds
        # 2^63 / q_num — realistic for the WEIGHTED sketch, where n is total
        # corpus mass (bytes at 100 TB ~ 1e14, times q_num up to 999 ~ 1e17
        # is float-inexact; ~1e18 overflows). Split on n = q_den*t + s:
        #   ceil(q_num*n/q_den) = q_num*t + ceil(q_num*s/q_den)
        # First term <= n (q_num <= q_den); second numerator < q_den^2 <= 1e6.
        # Exact for ALL BIGINT n — no float division, no overflow, and
        # identical to the oracle's integer // by the same identity.
        r = F.expr(
            f"{q_num} * (__n div {q_den})"
            f" + ({q_num} * (__n % {q_den}) + {q_den - 1}) div {q_den}"
        ).cast("long")
        eligible = cum.filter(F.col("__cum") >= r).withColumn("__r", r)
        first = (
            eligible.withColumn(
                "__rk",
                F.row_number().over(Window.partitionBy(*group_cols).orderBy("e", "m")),
            )
            .filter(F.col("__rk") == 1)
            .select(
                *group_cols,
                F.lit(q_num * 1000 // q_den).alias("q_permille"),
                F.col("__n").alias("n"),
                F.col("__r").alias("r"),
                bucket_floor_expr(k).alias("est"),
                F.col("e"),
                F.col("m"),
            )
        )
        outs.append(first)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
