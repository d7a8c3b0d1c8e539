"""Physical-plan audit: machine-readable answers to the scale questions
("did the filter push down?", "how many shuffles?", "is Python in the
hot path?") that otherwise require eyeballing ``.explain``.

Used two ways:
- tests assert plan properties (e.g. one exchange for the as-of join,
  no BroadcastNestedLoopJoin for the range join);
- `python -m ... ` dev loops print `audit(df).summary()` while tuning.

Parses the executed-plan string (AdaptiveSparkPlan included), which is
stable enough across Spark 3.5/4.x for the node names counted here.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

_JOIN_NODES = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
)
_PYTHON_NODES = (
    "BatchEvalPython",
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "AggregateInPandas",
    "MapInArrow",
)


@dataclass
class PlanAudit:
    exchanges: int = 0
    broadcast_exchanges: int = 0
    joins: dict[str, int] = field(default_factory=dict)
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    codegen_spans: int = 0
    python_stages: dict[str, int] = field(default_factory=dict)
    plan: str = ""

    @property
    def shuffle_exchanges(self) -> int:
        return self.exchanges - self.broadcast_exchanges

    @property
    def has_nested_loop(self) -> bool:
        return (
            self.joins.get("BroadcastNestedLoopJoin", 0) > 0
            or self.joins.get("CartesianProduct", 0) > 0
        )

    @property
    def python_in_plan(self) -> bool:
        return bool(self.python_stages)

    def summary(self) -> str:
        joins = ", ".join(f"{k}x{v}" for k, v in self.joins.items()) or "none"
        py = ", ".join(f"{k}x{v}" for k, v in self.python_stages.items()) or "none"
        return (
            f"shuffles={self.shuffle_exchanges} broadcasts={self.broadcast_exchanges} "
            f"joins=[{joins}] codegen_spans={self.codegen_spans} python=[{py}] "
            f"pushed_filters={len([p for p in self.pushed_filters if p != '[]'])}"
        )


def _extract_bracketed(plan: str, marker: str) -> list[str]:
    """Bracket-matched extraction: a plain ``\\[[^\\]]*\\]`` regex truncates
    at the first ``]`` inside nested lists (e.g. ``In(id, [1,2,3])``)."""
    out = []
    start = 0
    while True:
        i = plan.find(marker, start)
        if i < 0:
            return out
        j = i + len(marker)
        if j >= len(plan) or plan[j] != "[":
            start = j
            continue
        # scan within the line only: metadata never spans lines, and
        # Spark clips it at spark.sql.maxMetadataStringLength (default
        # 100) with a trailing "...", which would leave the bracket
        # unclosed and let the match swallow unrelated plan text
        eol = plan.find("\n", j)
        if eol < 0:
            eol = len(plan)
        depth = 0
        for k in range(j, eol):
            if plan[k] == "[":
                depth += 1
            elif plan[k] == "]":
                depth -= 1
                if depth == 0:
                    out.append(plan[j : k + 1])
                    break
        else:
            # truncated: keep the visible prefix rather than dropping it
            out.append(plan[j:eol])
            k = eol
        start = k + 1


def audit(df: DataFrame, execute: bool = False) -> PlanAudit:
    """``execute=True`` runs the plan first so AQE finalizes — required
    for codegen-span counts and runtime re-plan effects (AQEShuffleRead,
    skew splits); leave False for static properties (pushdown, join
    strategy, exchange count). Execution drains ``toLocalIterator`` (one
    partition in driver memory at a time — ``collect`` would OOM on large
    frames; noop-sink writes create a NEW query execution and leave this
    DataFrame's plan unfinalized)."""
    if execute:
        for _ in df.toLocalIterator():
            pass
    plan = df._jdf.queryExecution().executedPlan().toString()
    # finalized adaptive plans append "== Initial Plan ==" — audit only
    # the final section, else every node double-counts
    plan = plan.split("== Initial Plan ==")[0]
    a = PlanAudit(plan=plan)
    a.broadcast_exchanges = len(re.findall(r"BroadcastExchange", plan))
    # "Exchange hashpartitioning/rangepartitioning/SinglePartition..."
    a.exchanges = len(re.findall(r"(?:^|\s)Exchange ", plan)) + a.broadcast_exchanges
    for j in _JOIN_NODES:
        n = len(re.findall(j, plan))
        if n:
            a.joins[j] = n
    for p in _PYTHON_NODES:
        n = len(re.findall(p, plan))
        if n:
            a.python_stages[p] = n
    # codegen markers only appear once AQE finalizes (execute=True):
    # either "WholeStageCodegen (n)" nodes or "*(n)" prefixes
    span_ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    span_ids |= set(re.findall(r"\*\((\d+)\)", plan))
    a.codegen_spans = len(span_ids)
    a.pushed_filters = _extract_bracketed(plan, "PushedFilters: ")
    a.read_schemas = re.findall(r"ReadSchema: (\S+)", plan)
    return a
