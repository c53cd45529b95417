from .explain import (
    codegen_stage_count,
    formatted_plan,
    has_partial_aggregation,
    has_pushed_filters,
    scan_read_schema,
    uses_broadcast_join,
)
from .tuning import configure_session

__all__ = [
    "formatted_plan", "has_pushed_filters", "scan_read_schema",
    "uses_broadcast_join", "has_partial_aggregation", "codegen_stage_count",
    "configure_session",
]
