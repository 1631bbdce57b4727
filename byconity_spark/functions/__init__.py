"""ClickHouse-compatible function surface (see registry.py)."""

from byconity_spark.functions.registry import (  # noqa: F401
    AGG,
    SCALAR,
    UnknownFunctionError,
    ch,
    ch_agg,
    registered_names,
)
