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
so the algebraically-rearranged close formula
(lc + d*(j+rev)*brick) is bit-equal to the kernel's sequential
accumulation, and all mode columns are selections among exact values
and raw tick prices. Epoch-microsecond timestamps (~1.7e15) are exact
in doubles.
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
    inv = repr(1.0 / float(brick))

    # lambda-local shorthand (acc = state list, x = [t, p, i])
    wmin = "LEAST(acc[3], x[2])"
    wmax = "GREATEST(acc[4], x[2])"
    vol = "(acc[5] + 1)"
    moved = f"((x[2] - acc[1]) * {inv})"
    up = f"({moved} > 0)"
    d = f"(CASE WHEN {moved} > 0 THEN 1.0 ELSE -1.0 END)"
    absm = f"abs({moved})"
    rev = f"({d} * acc[2] < 0)"
    n = (
        f"(CASE WHEN {absm} < 1 THEN 0 "
        f"WHEN {rev} THEN (CASE WHEN {absm} < 2 THEN 0 ELSE trunc({absm})::BIGINT - 1 END) "
        f"ELSE trunc({absm})::BIGINT END)"
    )
    revj = f"({rev} AND j = 1)"
    closej = f"(acc[1] + {d} * (j + CASE WHEN {rev} THEN 1 ELSE 0 END) * {b})"
    openj = f"({closej} - {d} * {b})"
    wickj = (
        f"(CASE WHEN j = 1 THEN (CASE WHEN {up} THEN {wmin} ELSE {wmax} END) "
        f"WHEN j = 2 AND {rev} THEN acc[1] + {d} * {b} ELSE {openj} END)"
    )
    hij = f"(CASE WHEN {up} THEN {closej} ELSE {wickj} END)"
    loj = f"(CASE WHEN {up} THEN {wickj} ELSE {closej} END)"
    bhj = f"(CASE WHEN {up} THEN {closej} ELSE {openj} END)"
    blj = f"(CASE WHEN {up} THEN {openj} ELSE {closej} END)"
    ngj = (
        f"(CASE WHEN ({up} AND {openj} > {wickj}) OR (NOT {up} AND {openj} < {wickj}) "
        f"THEN {wickj} ELSE {openj} END)"
    )
    volj = f"(CASE WHEN j = 1 THEN {vol} ELSE 1.0 END)"
    rj = f"(CASE WHEN {revj} THEN 1.0 ELSE 0.0 END)"
    tioj = f"(CASE WHEN j = 1 THEN acc[6] ELSE x[3] END)"
    bij = f"(((len(acc) - 6) // {FIELDS} + j)::DOUBLE)"
    rhj = f"(CASE WHEN {revj} THEN {hij} ELSE {bhj} END)"
    rlj = f"(CASE WHEN {revj} THEN {loj} ELSE {blj} END)"
    rngj = f"(CASE WHEN {revj} THEN {ngj} ELSE {openj} END)"
    rfngj = f"(CASE WHEN {revj} THEN acc[1] ELSE {openj} END)"
    fhj = f"(CASE WHEN {revj} AND NOT {up} THEN acc[1] ELSE {bhj} END)"
    flj = f"(CASE WHEN {revj} AND {up} THEN acc[1] ELSE {blj} END)"

    brick_list = (
        f"[{bij}, x[1], {openj}, {hij}, {loj}, {closej}, {volj}, {d}, {rj}, {tioj}, x[3], "
        f"{bhj}, {blj}, {ngj}, {rngj}, {rfngj}, {rhj}, {rlj}, {fhj}, {flj}]"
    )
    new_flat = f"flatten(list_transform(range(1, {n} + 1), j -> {brick_list}))"

    close_n = f"(acc[1] + {d} * ({n} + CASE WHEN {rev} THEN 1 ELSE 0 END) * {b})"
    wick_reset = (
        f"CASE WHEN {n} = 0 THEN __W__ "
        f"WHEN {n} = 1 AND {rev} THEN acc[1] + {d} * {b} ELSE {close_n} END"
    )
    header = ", ".join(
        [
            f"CASE WHEN {n} = 0 THEN acc[1] ELSE {close_n} END",
            f"CASE WHEN {n} = 0 THEN acc[2] ELSE {d} END",
            wick_reset.replace("__W__", wmin),
            wick_reset.replace("__W__", wmax),
            f"CASE WHEN {n} = 0 THEN {vol} ELSE 1.0 END",
            f"CASE WHEN {n} = 0 THEN acc[6] ELSE x[3] END",
        ]
    )
    lam = f"(acc, x) -> list_concat(list_concat([{header}], acc[7:]), {new_flat})"

    unpack = ", ".join(
        [
            f"bi := a[{7 + 0}+k*{FIELDS}]::BIGINT",
            f"bt := a[{7 + 1}+k*{FIELDS}]::BIGINT",
            f"o := a[{7 + 2}+k*{FIELDS}]",
            f"h := a[{7 + 3}+k*{FIELDS}]",
            f"l := a[{7 + 4}+k*{FIELDS}]",
            f"c := a[{7 + 5}+k*{FIELDS}]",
            f"v := a[{7 + 6}+k*{FIELDS}]::BIGINT",
            f"dr := a[{7 + 7}+k*{FIELDS}]::BIGINT",
            f"r := a[{7 + 8}+k*{FIELDS}]::BIGINT",
            f"tio := a[{7 + 9}+k*{FIELDS}]::BIGINT",
            f"tic := a[{7 + 10}+k*{FIELDS}]::BIGINT",
            f"nh := a[{7 + 11}+k*{FIELDS}]",
            f"nl := a[{7 + 12}+k*{FIELDS}]",
            f"ngo := a[{7 + 13}+k*{FIELDS}]",
            f"rngo := a[{7 + 14}+k*{FIELDS}]",
            f"rfngo := a[{7 + 15}+k*{FIELDS}]",
            f"rh := a[{7 + 16}+k*{FIELDS}]",
            f"rl := a[{7 + 17}+k*{FIELDS}]",
            f"fh := a[{7 + 18}+k*{FIELDS}]",
            f"fl := a[{7 + 19}+k*{FIELDS}]",
        ]
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
