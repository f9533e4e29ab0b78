"""DuckDB oracle for the Renko operator.

The brick recurrence is a sequential stateful fold, so the oracle is a
`list_reduce` lambda over per-symbol time-ordered (t, p, i) ticks.
DuckDB 1.0 cannot carry LIST fields inside a struct accumulator
(they reset per step — verified empirically), so the accumulator is a
flat DOUBLE[]:

    [last_close, last_dir, wick_min, wick_max, volume, last_emit_idx,
     <20 slots per emitted brick>...]

Brick slot layout (0-based field offsets): bi, bt(us), open, high, low,
close, volume, direction, is_reversal, tick_index_open,
tick_index_close, normal_high, normal_low, nongap_open,
reverse_nongap_open, reverse_fake_nongap_open, reverse_high,
reverse_low, fake_high, fake_low.

Exactness: with a brick size that is exactly representable (e.g. 20.0)
every brick close is an exact multiple of the brick on the anchor grid,
so the algebraically-rearranged close formula (lc + d*(j+rev)*brick) is
bit-equal to the kernel's sequential accumulation, and all mode columns
are selections among exact values and raw tick prices.
Epoch-microsecond timestamps (~1.7e15) are exact in doubles.

Performance: DuckDB has no common-subexpression elimination inside
lambdas, and the naive fully-inlined lambda costs ~10 ms/tick of
interpretation (the tree blows up combinatorially). Shared
subexpressions are therefore LET-bound through nested single-element
``list_transform`` scopes (wm/wx = updated wicks, m = brick distance,
dd = direction, n = emission count; per brick: c/o/w =
close/open/wick) — nested lambdas capture outer lambda variables.
"""

from __future__ import annotations

FIELDS = 20

# mode -> (open, high, low) source columns of the oracle's wide output
# (mirrors renkodf_spark.schema.MODE_SOURCES)
_MODE_SOURCES_SQL = {
    "normal": ("open", "normal_high", "normal_low"),
    "wicks": ("open", "high", "low"),
    "nongap": ("nongap_open", "high", "low"),
    "reverse-wicks": ("open", "reverse_high", "reverse_low"),
    "reverse-nongap": ("reverse_nongap_open", "reverse_high", "reverse_low"),
    "fake-r-wicks": ("open", "fake_high", "fake_low"),
    "fake-r-nongap": ("reverse_fake_nongap_open", "fake_high", "fake_low"),
}


def build_renko_mode_oracle_sql(brick: float, ticks_sql: str, mode: str) -> str:
    """Mode projection (O-9) over the fold oracle's wide table."""
    o, h, l = _MODE_SOURCES_SQL[mode]
    return f"""
WITH wide AS ({build_renko_oracle_sql(brick, ticks_sql)})
SELECT symbol, brick_seq, event_time,
       {o} AS open, {h} AS high, {l} AS low, close, volume,
       direction, is_reversal, tick_index_open, tick_index_close
FROM wide
"""


def build_renko_oracle_sql(brick: float, ticks_sql: str) -> str:
    """ticks_sql must yield (symbol, ts TIMESTAMP, close DOUBLE)."""
    b = repr(float(brick))

    # let-bound in nested scopes: wm, wx, m, dd, n; per brick: c, o, w
    rev = "(dd * acc[2] < 0)"
    revj = f"({rev} AND j = 1)"
    up = "(m > 0)"
    n_expr = (
        f"CASE WHEN abs(m) < 1 THEN 0 "
        f"WHEN {rev} AND abs(m) < 2 THEN 0 "
        f"WHEN {rev} THEN trunc(abs(m))::BIGINT - 1 "
        f"ELSE trunc(abs(m))::BIGINT END"
    )
    rev01 = f"CASE WHEN {rev} THEN 1 ELSE 0 END"
    close_n = f"(acc[1] + dd * (n + {rev01}) * {b})"

    hdr = ", ".join(
        [
            f"CASE WHEN n = 0 THEN acc[1] ELSE {close_n} END",
            "CASE WHEN n = 0 THEN acc[2] ELSE dd END",
            f"CASE WHEN n = 0 THEN wm WHEN n = 1 AND {rev} THEN acc[1] + dd * {b} ELSE {close_n} END",
            f"CASE WHEN n = 0 THEN wx WHEN n = 1 AND {rev} THEN acc[1] + dd * {b} ELSE {close_n} END",
            "CASE WHEN n = 0 THEN acc[5] + 1 ELSE 1.0 END",
            "CASE WHEN n = 0 THEN acc[6] ELSE x[3] END",
        ]
    )

    hi = f"CASE WHEN {up} THEN c ELSE w END"
    lo = f"CASE WHEN {up} THEN w ELSE c END"
    bh = f"CASE WHEN {up} THEN c ELSE o END"
    bl = f"CASE WHEN {up} THEN o ELSE c END"
    ng = f"CASE WHEN ({up} AND o > w) OR (NOT {up} AND o < w) THEN w ELSE o END"
    brick_fields = ", ".join(
        [
            f"((len(acc) - 6) // {FIELDS} + j)::DOUBLE",  # bi
            "x[1]",  # bt
            "o",
            hi,
            lo,
            "c",
            "CASE WHEN j = 1 THEN acc[5] + 1 ELSE 1.0 END",  # volume
            "dd",
            f"CASE WHEN {revj} THEN 1.0 ELSE 0.0 END",  # is_reversal
            "CASE WHEN j = 1 THEN acc[6] ELSE x[3] END",  # tick_index_open
            "x[3]",  # tick_index_close
            bh,  # normal_high
            bl,  # normal_low
            ng,  # nongap_open
            f"CASE WHEN {revj} THEN {ng} ELSE o END",  # reverse_nongap_open
            f"CASE WHEN {revj} THEN acc[1] ELSE o END",  # reverse_fake_nongap_open
            f"CASE WHEN {revj} THEN {hi} ELSE {bh} END",  # reverse_high
            f"CASE WHEN {revj} THEN {lo} ELSE {bl} END",  # reverse_low
            f"CASE WHEN {revj} AND NOT {up} THEN acc[1] ELSE {bh} END",  # fake_high
            f"CASE WHEN {revj} AND {up} THEN acc[1] ELSE {bl} END",  # fake_low
        ]
    )
    brick_j = (
        f"list_transform([acc[1] + dd * (j + {rev01}) * {b}], c -> "
        f"list_transform([c - dd * {b}], o -> "
        f"list_transform([CASE WHEN j = 1 THEN (CASE WHEN {up} THEN wm ELSE wx END) "
        f"WHEN j = 2 AND {rev} THEN acc[1] + dd * {b} ELSE o END], w -> "
        f"[{brick_fields}])[1])[1])[1]"
    )

    body = (
        f"list_concat(list_concat([{hdr}], acc[7:]), "
        f"flatten(list_transform(range(1, n + 1), j -> {brick_j})))"
    )
    lam = (
        f"(acc, x) -> "
        f"list_transform([LEAST(acc[3], x[2])], wm -> "
        f"list_transform([GREATEST(acc[4], x[2])], wx -> "
        f"list_transform([(x[2] - acc[1]) * {1.0 / float(brick)!r}], m -> "
        f"list_transform([CASE WHEN m > 0 THEN 1.0 ELSE -1.0 END], dd -> "
        f"list_transform([{n_expr}], n -> {body})[1])[1])[1])[1])[1]"
    )

    unpack = ", ".join(
        f"{name} := a[{7 + off}+k*{FIELDS}]{cast}"
        for off, (name, cast) in enumerate(
            [
                ("bi", "::BIGINT"),
                ("bt", "::BIGINT"),
                ("o", ""),
                ("h", ""),
                ("l", ""),
                ("c", ""),
                ("v", "::BIGINT"),
                ("dr", "::BIGINT"),
                ("r", "::BIGINT"),
                ("tio", "::BIGINT"),
                ("tic", "::BIGINT"),
                ("nh", ""),
                ("nl", ""),
                ("ngo", ""),
                ("rngo", ""),
                ("rfngo", ""),
                ("rh", ""),
                ("rl", ""),
                ("fh", ""),
                ("fl", ""),
            ]
        )
    )

    return f"""
WITH src AS ({ticks_sql}),
ordered AS (
  SELECT symbol, epoch_us(ts)::DOUBLE AS t, close AS p,
         (row_number() OVER (PARTITION BY symbol ORDER BY ts) - 1)::DOUBLE AS i
  FROM src
),
packed AS (
  SELECT symbol, list([t, p, i] ORDER BY t, i) AS xs FROM ordered GROUP BY symbol
),
folded AS (
  SELECT symbol,
         list_reduce(
           list_prepend([floor(xs[1][2] / {b}) * {b}, 0.0,
                         floor(xs[1][2] / {b}) * {b}, floor(xs[1][2] / {b}) * {b},
                         1.0, 1.0], xs[2:]),
           {lam}) AS a
  FROM packed
),
bricks AS (
  SELECT symbol,
         unnest(list_transform(range(0, (len(a) - 6) // {FIELDS}),
                               k -> struct_pack({unpack})), recursive := true)
  FROM folded
),
flagged AS (
  SELECT *, first(bt) OVER (PARTITION BY symbol ORDER BY bi) AS first_bt FROM bricks
)
SELECT symbol,
       (row_number() OVER (PARTITION BY symbol ORDER BY bi) - 1)::BIGINT AS brick_seq,
       make_timestamp(bt) AS event_time,
       o AS open, h AS high, l AS low, c AS close, v AS volume,
       dr AS direction, r AS is_reversal,
       tio AS tick_index_open, tic AS tick_index_close,
       nh AS normal_high, nl AS normal_low, ngo AS nongap_open,
       rngo AS reverse_nongap_open, rfngo AS reverse_fake_nongap_open,
       rh AS reverse_high, rl AS reverse_low, fh AS fake_high, fl AS fake_low
FROM flagged
WHERE bt <> first_bt
"""
