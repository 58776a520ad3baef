"""torcdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of PlatformLab/TorcDB.

TorcDB (reference, read-only at /root/reference) is a TinkerPop property-graph
database on RAMCloud: labeled vertices/edges with typed properties, a batched
set-at-a-time traversal API (``TorcGraph.traverse`` /
``TorcGraph.fillProperties``, TorcGraph.java:479-734) composed with client-side
relational set algebra (``fuse``/``intersect``/``subtract``/``removeEdgeIf``,
TorcHelper.java:407-638), plus the standard Gremlin step surface.

This package re-expresses that surface Spark-first:

- the property graph is a pair of DataFrames (``vertices``, ``edges``);
- ``traverse`` is a frontier ⋈ edges equi-join;
- the set algebra is semi/anti/inner joins + filters on the traversal frame;
- everything stays one lazy Catalyst plan so predicate pushdown, column
  pruning, broadcast selection and AQE apply end-to-end;
- beyond the reference surface: relational/OLAP queries, streaming over the
  ``events`` table, and LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal columns) designed for 100 TB scale.
"""

from torcdb_spark.session import get_spark
from torcdb_spark.graph import Cardinality, PropertyGraph
from torcdb_spark.traverse import traverse, fill_properties, Direction
from torcdb_spark import algebra
from torcdb_spark.sql import register_views, sql

__all__ = [
    "get_spark",
    "PropertyGraph",
    "Cardinality",
    "traverse",
    "fill_properties",
    "Direction",
    "algebra",
    "register_views",
    "sql",
]

__version__ = "0.1.0"
