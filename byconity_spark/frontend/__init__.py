"""ClickHouse-dialect SQL frontend (see sql.py)."""

from byconity_spark.frontend.sql import ch_sql, rewrite_ch_sql  # noqa: F401
