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


def _live_tree_nodes(text: str) -> list[tuple[str, int]]:
    """(name, id) pairs for nodes in the CURRENT plan tree.

    Once an AQE plan has executed, formatted explain prints each
    adaptive subtree twice — ``== Final Plan ==`` then ``== Initial
    Plan ==`` — and every node of both gets a numbered details section,
    so naive "(N) Name" counting doubles after execution and a test's
    result depends on whether some earlier test ran the query. Walk the
    tree section instead, skipping Initial Plan blocks (tracked by the
    marker's indentation), and take node ids from the kept lines."""
    by_id: dict[int, str] = {}
    skip_depth: int | None = None
    for line in text.splitlines():
        stripped = line.lstrip(" :+-*")
        depth = len(line) - len(stripped)
        # plan-section markers sit at the SAME depth as their block's
        # first child, so a block closes on strictly-smaller depth or on
        # a sibling marker at <= depth
        is_marker = stripped.startswith("== ") and "Plan ==" in stripped
        if skip_depth is not None:
            if is_marker and depth <= skip_depth:
                skip_depth = depth if "Initial" in stripped else None
                continue
            if stripped and depth < skip_depth:
                skip_depth = None  # block closed; fall through to process
            else:
                continue
        if is_marker:
            if "Initial" in stripped:
                skip_depth = depth
            continue
        m = re.match(r"([A-Za-z]+)[A-Za-z ]*\((\d+)\)", stripped)
        if m:
            # a reused subtree prints the same node id at several tree
            # positions; count each id once (details sections do too)
            by_id.setdefault(int(m.group(2)), m.group(1))
    return [(name, i) for i, name in by_id.items()]


def plan_audit(df: DataFrame) -> PlanAudit:
    text = explain_str(df, "formatted")
    simple = explain_str(df, "simple")
    tree = _live_tree_nodes(text)
    names = [n for n, _ in tree]
    live_ids = {i for _, i in tree}
    # details sections ("(N) NodeName" headers) carry PushedFilters /
    # ReadSchema; keep only the ones whose node survives in the live tree
    pushed, schemas = [], []
    cur_live = False
    for line in text.splitlines():
        m = re.match(r"\((\d+)\) ", line)
        if m:
            cur_live = int(m.group(1)) in live_ids
            continue
        if not cur_live:
            continue
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", line)
        if pf:
            pushed.append(pf.group(1))
        rs = re.search(r"ReadSchema: struct<([^>]*)>", line)
        if rs:
            schemas.append(rs.group(1))
    return PlanAudit(
        n_shuffles=sum(1 for n in names if n == "Exchange"),
        n_broadcasts=sum(1 for n in names if n == "BroadcastExchange"),
        n_scans=sum(1 for n in names if n == "Scan"),
        pushed_filters=pushed,
        read_schemas=schemas,
        has_wholestage_codegen="*(" in simple,
        n_sort_merge_joins=sum(1 for n in names if n == "SortMergeJoin"),
        n_cartesian=sum(1 for n in names if n == "CartesianProduct"),
        has_python_eval=any(
            n in ("BatchEvalPython", "ArrowEvalPython") for n in names
        ),
        text=text,
    )
