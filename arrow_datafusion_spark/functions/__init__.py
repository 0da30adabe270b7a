"""Function layer: DataFusion function-name → PySpark expression registries.

- ``scalar``: ~150 scalar functions (SURVEY.md §2.9)
- ``aggregate``: the 38 aggregate functions (SURVEY.md §2.4)
- ``window``: the 11 built-in window functions (SURVEY.md §2.5)
"""

from arrow_datafusion_spark.functions.scalar import FAMILIES, SCALAR

__all__ = ["SCALAR", "FAMILIES"]
