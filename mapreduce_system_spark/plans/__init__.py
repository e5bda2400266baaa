"""Plan-inspection helpers (pushdown / broadcast / codegen assertions)."""

from mapreduce_system_spark.plans.checks import (  # noqa: F401
    formatted_plan,
    has_pushed_filters,
    has_broadcast_join,
    wholestage_codegen_spans,
)
