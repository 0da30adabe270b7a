"""Plan-level constructs that have no single Spark primitive:

- ``recursive``: recursive-CTE fixpoint execution (WorkTableExec /
  RecursiveQueryExec analog — the one reference operator Spark lacks).
"""

from arrow_datafusion_spark.plans.recursive import recursive_query

__all__ = ["recursive_query"]
