from byconity_spark.engine.session import get_spark  # noqa: F401
from byconity_spark.engine.catalog import TABLES, load_tables, register_views  # noqa: F401
