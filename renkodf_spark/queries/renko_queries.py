"""Renko operator queries (SURVEY.md §2 Part A).

The brick recurrence is a non-associative stateful fold — not
expressible in ANSI SQL — but DuckDB's list_reduce lambda can replay it
(queries/renko_oracle.py), so the wide table, the wicks projection, and
the three distinct mode-projection shapes are hash-matched against that
fold at brick=20 (an exactly-representable size, keeping the SQL's
algebraic arithmetic bit-equal to the kernel). The remaining mode
queries run at brick=5 as rows-only checks. The other correctness leg
is tests/test_vs_reference.py: bit-exact differential equality against
the reference implementation across all 7 modes, streaming replay, warm
start, and forming bars.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from renkodf_spark.operators.renko import renko, renko_df, renko_mode, to_rws
from renkodf_spark.queries.registry import query
from renkodf_spark.sources.tables import ticks_from_events

BRICK = 5.0

from renkodf_spark.queries.renko_oracle import (  # noqa: E402
    build_renko_mode_oracle_sql,
    build_renko_oracle_sql,
)

_TICKS_SQL = "SELECT event_type AS symbol, ts, value AS close FROM events"
_ORACLE_BRICK = 20.0  # exactly representable: every brick close is exact, so
# the SQL fold's algebraic close formula is bit-equal to the kernel (see
# renko_oracle.py docstring)

def _mode_query(mode: str, brick: float):
    def build(spark, sf_dir):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        # single-mode path: variant columns pruned at the kernel boundary
        return renko_mode(ticks_from_events(spark, sf_dir), brick, mode)

    build.__name__ = f"renko_{mode.replace('-', '_')}"
    return build


# every mode projection is hash-matched against a mode projection of the
# DuckDB fold replay (the let-bound fold costs ~7s at sf0.01)
for _mode in ("normal", "wicks", "nongap", "reverse-wicks", "reverse-nongap", "fake-r-wicks", "fake-r-nongap"):
    query(
        f"renko_{_mode.replace('-', '_')}",
        oracle=build_renko_mode_oracle_sql(_ORACLE_BRICK, _TICKS_SQL, _mode),
        doc=f"Renko '{_mode}' mode projection over the events tick stream "
        "(O-5, O-9) — oracle: mode projection of the DuckDB fold replay.",
    )(_mode_query(_mode, _ORACLE_BRICK))


@query(
    "renko_small_brick_smoke",
    # The full DuckDB fold oracle is too costly at brick=5 (~87k bricks
    # at sf0.01), so this checks the brick-grid INVARIANTS of the
    # high-emission output instead (VERDICT r3 item 3): every expected
    # value below is a constant the oracle derives without running the
    # fold — any violation in the Spark output flips a count/flag and
    # breaks the hash match. Exact-value coverage for the recurrence
    # stays with the brick=20/2.5 fold oracles + the differential suite.
    oracle="""
    SELECT event_type AS symbol,
           0 AS grid_viol, 0 AS span_viol, 0 AS dir_viol, 0 AS wick_viol,
           0 AS vol_viol, 0 AS time_regress, 0 AS tickidx_viol,
           TRUE AS seq_contiguous, TRUE AS has_bricks, TRUE AS vol_bounded
    FROM events GROUP BY event_type
    """,
    doc="small-brick (5.0) wicks run, checked via per-symbol brick-grid "
    "invariants: closes on the anchor grid, |close-open| == brick (wicks "
    "mode keeps reversal spans at one brick), direction == sign(close-"
    "open), low/high bracket the body, volume >= 1, brick_seq contiguous "
    "from 0, event_time and tick indexes monotone, and n_bricks <= "
    "sum(volume) <= n_bricks + n_ticks (gap fills carry synthetic "
    "volume 1, so volume exceeds tick count by design).",
)
def renko_small_brick_smoke(spark, sf_dir):
    from pyspark.sql import Window

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ticks = ticks_from_events(spark, sf_dir)
    w = renko_mode(ticks, BRICK, "wicks")
    win = Window.partitionBy("symbol").orderBy("brick_seq")
    body_lo, body_hi = F.least("open", "close"), F.greatest("open", "close")
    flags = w.select(
        "symbol",
        "brick_seq",
        "volume",
        (F.col("close") % BRICK != 0).cast("int").alias("gv"),
        (F.abs(F.col("close") - F.col("open")) != BRICK).cast("int").alias("sv"),
        (F.signum(F.col("close") - F.col("open")) != F.col("direction")).cast("int").alias("dv"),
        ((F.col("low") > body_lo) | (F.col("high") < body_hi)).cast("int").alias("wv"),
        (F.col("volume") < 1).cast("int").alias("vv"),
        F.coalesce(
            (F.lag("event_time").over(win) > F.col("event_time")).cast("int"), F.lit(0)
        ).alias("tr"),
        (
            (F.col("tick_index_open") > F.col("tick_index_close"))
            | F.coalesce(
                (F.lag("tick_index_close").over(win) > F.col("tick_index_close")).cast(
                    "boolean"
                ),
                F.lit(False),
            )
        ).cast("int").alias("xv"),
    )
    agg = flags.groupBy("symbol").agg(
        F.sum("gv").cast("int").alias("grid_viol"),
        F.sum("sv").cast("int").alias("span_viol"),
        F.sum("dv").cast("int").alias("dir_viol"),
        F.sum("wv").cast("int").alias("wick_viol"),
        F.sum("vv").cast("int").alias("vol_viol"),
        F.sum("tr").cast("int").alias("time_regress"),
        F.sum("xv").cast("int").alias("tickidx_viol"),
        F.count(F.lit(1)).alias("_n"),
        F.min("brick_seq").alias("_mn"),
        F.max("brick_seq").alias("_mx"),
        F.count_distinct("brick_seq").alias("_nd"),
        F.sum("volume").alias("_v"),
    )
    tick_counts = ticks.groupBy(F.col("symbol")).agg(F.count(F.lit(1)).alias("_ticks"))
    return agg.join(tick_counts, "symbol").select(
        "symbol",
        "grid_viol",
        "span_viol",
        "dir_viol",
        "wick_viol",
        "vol_viol",
        "time_regress",
        "tickidx_viol",
        (
            (F.col("_mn") == 0)
            & (F.col("_mx") == F.col("_n") - 1)
            & (F.col("_nd") == F.col("_n"))
        ).alias("seq_contiguous"),
        (F.col("_n") > 0).alias("has_bricks"),
        (
            (F.col("_v") >= F.col("_n")) & (F.col("_v") - F.col("_n") <= F.col("_ticks"))
        ).alias("vol_bounded"),
    )


@query(
    "renko_wide_bricks",
    oracle=build_renko_oracle_sql(_ORACLE_BRICK, _TICKS_SQL),
    doc="THE core operator (O-5..O-8): full 19-column wide brick table, "
    "hash-matched against a DuckDB list_reduce lambda-fold replay of the "
    "recurrence (brick=20).",
)
def renko_wide_bricks(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return renko(ticks_from_events(spark, sf_dir), _ORACLE_BRICK)


@query(
    "renko_wide_bricks_b25",
    oracle=build_renko_oracle_sql(2.5, _TICKS_SQL),
    doc="second-brick-size fold oracle (VERDICT r3 item 9): the full "
    "wide table at brick=2.5 (exactly representable, different binary "
    "exponent regime than 20.0) hash-matched against the DuckDB fold — "
    "guards the grid-anchor and close arithmetic across exponent scales.",
)
def renko_wide_bricks_b25(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return renko(ticks_from_events(spark, sf_dir), 2.5)


@query(
    "renko_wicks_projected",
    oracle=f"""
    WITH wide AS ({build_renko_oracle_sql(_ORACLE_BRICK, _TICKS_SQL)})
    SELECT symbol, brick_seq, event_time, open, high, low, close, volume,
           direction, is_reversal, tick_index_open, tick_index_close
    FROM wide
    """,
    doc="mode projection path (O-9) over the oracle-checked wide table.",
)
def renko_wicks_projected(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return renko_df(renko(ticks_from_events(spark, sf_dir), _ORACLE_BRICK), "wicks")


@query(
    "time_bars_hourly",
    oracle="""
    SELECT event_type AS symbol,
           make_timestamp((epoch_us(ts) // 3600000000) * 3600000000) AS bar_start,
           (MIN(struct_pack(t := ts, p := value))).p AS open,
           MAX(value) AS high, MIN(value) AS low,
           (MAX(struct_pack(t := ts, p := value))).p AS close,
           COUNT(*) AS volume
    FROM events GROUP BY 1, 2
    """,
    doc="tick -> hourly OHLCV bars (deterministic open/close via struct "
    "argmin/argmax; the operator's no-seq_col fallback tiebreak is (t,p), "
    "exactly the oracle's struct_pack(t,p) — equal even with duplicate "
    "timestamps, on any partition layout).",
)
def time_bars_hourly(spark, sf_dir):
    from renkodf_spark.operators.timebars import time_bars

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return time_bars(ticks_from_events(spark, sf_dir), "1 hour")


@query(
    "renko_summary_stats",
    oracle=f"""
    WITH wide AS ({build_renko_oracle_sql(_ORACLE_BRICK, _TICKS_SQL)})
    SELECT symbol, COUNT(*) AS n_bricks,
           CAST(SUM(is_reversal) AS BIGINT) AS n_reversals,
           CAST(SUM(volume) AS BIGINT) AS ticks_attributed,
           ROUND(MIN(low), 4) AS min_low, ROUND(MAX(high), 4) AS max_high
    FROM wide GROUP BY symbol
    """,
    doc="aggregate surface over the wide brick table (brick counts, "
    "reversal rate), oracle via aggregation of the fold replay.",
)
def renko_summary_stats(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wide = renko(ticks_from_events(spark, sf_dir), _ORACLE_BRICK)
    return wide.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_bricks"),
        F.sum("is_reversal").alias("n_reversals"),
        F.sum("volume").alias("ticks_attributed"),
        F.round(F.min("low"), 4).alias("min_low"),
        F.round(F.max("high"), 4).alias("max_high"),
    )


_RWS_VALUE_COLS = (
    "open, high, low, close, volume, direction, is_reversal, normal_high, "
    "normal_low, nongap_open, reverse_nongap_open, reverse_fake_nongap_open, "
    "reverse_high, reverse_low, fake_high, fake_low"
)


@query(
    "renko_chunked_wide",
    oracle=build_renko_oracle_sql(_ORACLE_BRICK, _TICKS_SQL),
    doc="memory-bounded chunked Renko (windowed stitching, O-13/O-14): "
    "same wide table as renko_wide_bricks but computed in consecutive "
    "event-time windows with the kernel state carried between them via a "
    "cogrouped state DataFrame — one staged source scan, partition-pruned "
    "per-window reads. Hash-matching the one-shot oracle proves the "
    "stitching is bit-exact.",
)
def renko_chunked_wide(spark, sf_dir):
    from renkodf_spark.operators.renko_chunked import renko_chunked

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return renko_chunked(ticks_from_events(spark, sf_dir), _ORACLE_BRICK, window="1 week")


@query(
    "renko_subchunked_wide",
    oracle=build_renko_oracle_sql(_ORACLE_BRICK, _TICKS_SQL),
    doc="skew-aware sub-chunked Renko (VERDICT r9 item 2): the same wide "
    "brick table, but every hot (window, symbol) group runs through the "
    "speculative sub-chunk splice path (renko_subchunk.py) — thresholds "
    "are set low enough that the hot path fires at every gate SF, and "
    "the builder ASSERTS it did (hot pairs > 0, bitwise convergences > "
    "0, zero serial fallbacks in this exact-arithmetic regime), so a "
    "green hash row proves the speculative splice against the one-shot "
    "DuckDB fold replay, not just against renko() in pytest.",
)
def renko_subchunked_wide(spark, sf_dir):
    from renkodf_spark.operators.renko_chunked import renko_chunked

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    inst: dict = {}
    # renko_chunked drives its window loop eagerly, so `inst` is fully
    # populated when it returns and the gate assertions below run before
    # the driver ever compares hashes.
    out = renko_chunked(
        ticks_from_events(spark, sf_dir),
        _ORACLE_BRICK,
        window="30 days",
        subchunk_threshold=100,
        subchunk_target=60,
        instrument=inst,
    )
    hot = [w["hot"] for w in inst.get("windows", []) if w.get("hot")]
    converged = sum(h["converged"] for h in hot)
    fallback = sum(h["fallback"] for h in hot)
    assert hot and converged > 0 and fallback == 0, (
        f"sub-chunk path did not exercise the splice: hot_pairs="
        f"{inst.get('hot_pairs')} converged={converged} fallback={fallback}"
    )
    return out


@query(
    "renko_state_export",
    oracle=f"""
    WITH wide AS ({build_renko_oracle_sql(_ORACLE_BRICK, _TICKS_SQL)}),
    sliced AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY symbol ORDER BY brick_seq DESC) AS rn
      FROM wide)
    SELECT symbol, brick_seq, {_RWS_VALUE_COLS},
           {_ORACLE_BRICK!r} AS brick_size, epoch_us(event_time) AS timestamp
    FROM sliced WHERE rn <= 10
    """,
    doc="to_rws warm-start export (O-11), last 10 bricks per symbol, "
    "oracle via tail-window over the fold replay.",
)
def renko_state_export(spark, sf_dir):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wide = renko(ticks_from_events(spark, sf_dir), _ORACLE_BRICK)
    return to_rws(wide, _ORACLE_BRICK, use_iloc=-10)


@query(
    "renko_direction_runs",
    oracle=f"""
    WITH wide AS ({build_renko_oracle_sql(_ORACLE_BRICK, _TICKS_SQL)}),
    d AS (
      SELECT symbol, brick_seq, direction,
             CASE WHEN LAG(direction) OVER (PARTITION BY symbol ORDER BY brick_seq)
                  IS DISTINCT FROM direction THEN 1 ELSE 0 END AS flip
      FROM wide),
    r AS (
      SELECT *, SUM(flip) OVER (PARTITION BY symbol ORDER BY brick_seq
                                ROWS UNBOUNDED PRECEDING)::BIGINT AS run_id
      FROM d)
    SELECT symbol, run_id, MIN(direction)::BIGINT AS direction,
           COUNT(*) AS run_len, MIN(brick_seq)::BIGINT AS start_seq
    FROM r GROUP BY symbol, run_id
    """,
    doc="run-length encoding of brick direction (the renko momentum "
    "feature: consecutive same-direction brick runs), oracle via "
    "lag/cumsum over the fold replay.",
)
def renko_direction_runs(spark, sf_dir):
    from pyspark.sql.window import Window

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    wide = renko(ticks_from_events(spark, sf_dir), _ORACLE_BRICK)
    w = Window.partitionBy("symbol").orderBy("brick_seq")
    prev = F.lag("direction").over(w)
    # two explicit projections (flip, then its running sum) — nesting a
    # lag inside a windowed sum is version-fragile
    flipped = wide.select(
        "symbol", "brick_seq", F.col("direction").cast("long").alias("direction")
    ).withColumn("flip", F.when(prev.isNull() | (prev != F.col("direction")), 1).otherwise(0))
    runs = flipped.withColumn(
        "run_id",
        F.sum("flip").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return runs.groupBy("symbol", "run_id").agg(
        F.min("direction").alias("direction"),
        F.count(F.lit(1)).alias("run_len"),
        F.min("brick_seq").alias("start_seq"),
    )
