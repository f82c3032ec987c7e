"""Physical-plan audit helpers.

The 100 TB design rules are checkable properties of the physical plan:
filters reach the parquet scan (PushedFilters), projections prune the
read schema (ReadSchema), small dims broadcast instead of shuffling,
and the shuffle count matches what the query semantically needs.
``plan_audit`` extracts those properties so tests can pin them — a
performance regression then fails CI like a wrong answer would.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanAudit:
    n_shuffles: int
    n_broadcasts: int
    n_scans: int
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    has_wholestage_codegen: bool = False
    n_sort_merge_joins: int = 0
    n_cartesian: int = 0
    has_python_eval: bool = False
    text: str = ""

    def scan_reads_only(self, scan_idx: int, columns: set[str]) -> bool:
        """True if the given scan's ReadSchema is a subset of ``columns``."""
        schema = self.read_schemas[scan_idx]
        cols = set(re.findall(r"(\w+):", schema))
        return cols <= columns


def plan_audit(df: DataFrame) -> PlanAudit:
    text = explain_str(df, "formatted")
    simple = explain_str(df, "simple")
    # formatted mode lists each node once as "(N) NodeName"; arguments
    # (e.g. hashpartitioning) live in a separate details section
    nodes = re.findall(r"\(\d+\) ([A-Za-z]+)", text)
    return PlanAudit(
        n_shuffles=sum(1 for n in nodes if n == "Exchange"),
        n_broadcasts=sum(1 for n in nodes if n == "BroadcastExchange"),
        n_scans=sum(1 for n in nodes if n == "Scan"),
        pushed_filters=re.findall(r"PushedFilters: \[([^\]]*)\]", text),
        read_schemas=re.findall(r"ReadSchema: struct<([^>]*)>", text),
        has_wholestage_codegen="*(" in simple,
        n_sort_merge_joins=sum(1 for n in nodes if n == "SortMergeJoin"),
        n_cartesian=sum(1 for n in nodes if n == "CartesianProduct"),
        has_python_eval=any(
            n in ("BatchEvalPython", "ArrowEvalPython") for n in nodes
        ),
        text=text,
    )
