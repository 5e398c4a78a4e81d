"""Plan-inspection helpers: the engine's feedback loop for the 100 TB
design goals. ``plan_audit`` turns a physical plan into the numbers that
matter at scale — shuffle count, broadcast vs sort-merge joins, whether
predicates reached the parquet scan, how wide the scans read — so tests
can ASSERT plan properties instead of eyeballing explain output."""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical (executed) plan as text, post-AQE where applicable."""
    return df._jdf.queryExecution().executedPlan().toString()


@dataclass
class PlanAudit:
    n_exchanges: int = 0                 # shuffles (Exchange hashpartitioning/range)
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_shuffled_hash_joins: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    has_take_ordered: bool = False
    text: str = ""


def plan_audit(df: DataFrame) -> PlanAudit:
    text = executed_plan(df)
    a = PlanAudit(text=text)
    a.n_exchanges = len(re.findall(r"\bExchange (?:hash|range)partitioning", text))
    a.n_broadcast_joins = text.count("BroadcastHashJoin")
    a.n_sortmerge_joins = text.count("SortMergeJoin")
    a.n_shuffled_hash_joins = text.count("ShuffledHashJoin")
    a.has_take_ordered = "TakeOrderedAndProject" in text
    a.pushed_filters = [
        m for m in re.findall(r"PushedFilters: \[([^\]]*)\]", text) if m.strip()
    ]
    a.partition_filters = [
        m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", text) if m.strip()
    ]
    a.read_schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", text)
    return a
