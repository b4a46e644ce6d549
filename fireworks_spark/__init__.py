"""fireworks_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of kellylab/Fireworks (see SURVEY.md).

Not a port: the reference's eager Pipe graph (reference:
fireworks/core/pipe.py:34-212) is replaced by Spark's lazy DataFrame DAG;
its Message data model (fireworks/core/message.py:21-116) maps onto a single
DataFrame schema mixing scalar and ArrayType columns.
"""

from fireworks_spark.session import get_spark
from fireworks_spark.tables import TABLES, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "TABLES"]
__version__ = "0.1.0"
