"""arrow_datafusion_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of apache/arrow-datafusion (DataFusion 39).

Everything here is Spark-first: logical plans are declared via the PySpark
DataFrame / SQL API and Catalyst + Tungsten choose the physical strategy.
The reference engine (read-only at /root/reference) defines WHAT we compute;
SURVEY.md maps its operator inventory to the Spark primitives used here.
"""

from arrow_datafusion_spark.session import build_spark, prepare, load_tables

__all__ = ["build_spark", "prepare", "load_tables"]
__version__ = "0.1.0"
