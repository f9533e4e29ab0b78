"""Registry plumbing for the declared query surface."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class Q:
    builder: Builder
    oracle: str | None  # DuckDB SQL, None for non-SQL-expressible ops
    doc: str = ""


REGISTRY: dict[str, Q] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    def deco(fn: Builder) -> Builder:
        REGISTRY[name] = Q(fn, oracle, doc)
        return fn

    return deco


def queries() -> dict[str, Builder]:
    return {name: q.builder for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
