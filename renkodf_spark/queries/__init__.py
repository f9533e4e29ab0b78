"""Query registry: every operator surface declared in SURVEY.md §2 is
exposed as a named (spark builder, duckdb oracle SQL) pair consumed by
``__spark_entry__.py`` and the driver's correctness gate.

Importing this package populates the registry.
"""

from renkodf_spark.queries.registry import REGISTRY, oracle_sql, queries  # noqa: F401
from renkodf_spark.queries import relational  # noqa: F401
from renkodf_spark.queries import relational2  # noqa: F401
from renkodf_spark.queries import renko_queries  # noqa: F401
from renkodf_spark.queries import pipeline  # noqa: F401
