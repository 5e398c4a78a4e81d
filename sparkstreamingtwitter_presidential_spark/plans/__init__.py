from sparkstreamingtwitter_presidential_spark.plans.audit import (
    executed_plan,
    plan_audit,
)

__all__ = ["executed_plan", "plan_audit"]
