"""Physical-plan inspection helpers — the engine's ".explain and
iterate" loop, made programmatic. Used by tests/test_plans.py and for
ad-hoc audits (NOTES.md records the end-of-round numbers).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    exchanges: int  # includes broadcast exchanges
    broadcast_hash_joins: int
    sort_merge_joins: int
    nested_loop_joins: int
    python_nodes: int  # FlatMapGroupsIn{Pandas,Arrow} / EvalPython / MapIn{Pandas,Arrow}
    scans: int
    pushed_filters: bool
    text: str

    def __str__(self) -> str:
        return (
            f"exchanges={self.exchanges} bcast={self.broadcast_hash_joins} "
            f"smj={self.sort_merge_joins} nlj={self.nested_loop_joins} "
            f"py={self.python_nodes} scans={self.scans} pushed={self.pushed_filters}"
        )


def plan_summary(df: DataFrame) -> PlanSummary:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return PlanSummary(
        exchanges=plan.count("Exchange"),
        broadcast_hash_joins=plan.count("BroadcastHashJoin"),
        sort_merge_joins=plan.count("SortMergeJoin"),
        nested_loop_joins=plan.count("NestedLoopJoin"),
        python_nodes=(
            plan.count("FlatMapGroupsInPandas")
            + plan.count("FlatMapGroupsInArrow")
            + plan.count("FlatMapCoGroupsInPandas")
            + plan.count("FlatMapCoGroupsInArrow")
            + plan.count("EvalPython")
            + plan.count("MapInPandas")
            + plan.count("MapInArrow")
        ),
        scans=plan.count("FileScan"),
        pushed_filters="PushedFilters: [" in plan and "PushedFilters: []" not in plan,
        text=plan,
    )


def exchange_inputs(df: DataFrame, pattern: str = r"\w*Exchange") -> list[list[str]]:
    """Column names entering every Exchange (shuffle or broadcast) in
    the executed plan — the audit for "does the payload move?" claims.
    Parsed from the formatted explain, whose per-node ``Input [n]``
    lines carry the exact attribute list; ``name#123`` suffixes are
    stripped so callers compare plain column names."""
    import re

    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    text = df._jdf.queryExecution().explainString(mode)
    out: list[list[str]] = []
    lines = text.splitlines()
    for i, line in enumerate(lines):
        if re.match(r"^\(\d+\) " + pattern, line.strip()):
            for follow in lines[i + 1 : i + 4]:
                m = re.match(r"^Input \[\d+\]: \[(.*)\]$", follow.strip())
                if m:
                    cols = [c.strip().split("#")[0] for c in m.group(1).split(",") if c.strip()]
                    out.append(cols)
                    break
    return out


def shuffle_inputs(df: DataFrame) -> list[list[str]]:
    """Like :func:`exchange_inputs`, but hash/range SHUFFLES only —
    for claims where a bounded broadcast (a vocab, a sketch) is allowed
    to move but the big-table payload must not."""
    return exchange_inputs(df, pattern=r"Exchange\b")


def assert_jvm_only(df: DataFrame, context: str = "") -> None:
    """Raise if any Python-eval node is in the plan — relational
    queries must stay inside whole-stage codegen; only the Renko kernel
    boundary is allowed to cross into Python."""
    s = plan_summary(df)
    if s.python_nodes:
        raise AssertionError(f"{context}: plan contains Python nodes\n{s.text[:2000]}")
