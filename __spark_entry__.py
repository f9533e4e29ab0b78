"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementations live in the ``renkodf_spark`` package; this
module is a thin adapter. Query inventory: the renko operator surface
(SURVEY.md §2 Part A — oracled via a DuckDB ``list_reduce`` fold replay
of the recurrence, and additionally differential-tested bit-exact
against the reference in tests/test_vs_reference.py), the full
relational Part-B surface, and the training-data pipeline extensions
(dedup / similarity / text / corpus curation / multimodal) — every
registered query carries a DuckDB oracle; see the latest
CORRECTNESS_r{N}.json / scripts/check_entry.py sweep for the gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import renkodf_spark.queries as _q
from renkodf_spark.operators.renko import renko, renko_df
from renkodf_spark.sources.tables import ticks_from_events


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Renko 'wicks' bars over the sf0.001 events tick
    stream (symbol = event_type, price = value, brick = 5.0)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ticks = ticks_from_events(spark, "/root/testdata/sf0.001")
    return renko_df(renko(ticks, 5.0), "wicks")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
