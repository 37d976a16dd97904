"""custom_vector_database_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference vector database (lol-boi/custom_vector_database,
a single-node C++17 CLI: init/add/get/update/delete/rebuild/search over an
in-memory row map with an HNSW index — see SURVEY.md).

Design principles (not a port):

- DataFrame / SQL everywhere; Catalyst picks the physical plan.
- Distances and text metrics are native column expressions (JVM-side,
  whole-stage codegen) — no row-at-a-time Python in the hot path.
- ANN is MLlib LSH (batch index build + bucketed search), replacing the
  reference's single-node HNSW graph with a shuffle-friendly design that
  scales to 1000 executors.
- Mutations are batch rewrites (union / anti-join / overwrite), which is
  exactly the reference's whole-file-rewrite consistency model (SURVEY §1.4).
"""

from custom_vector_database_spark.multivector_table import MultiVectorTable
from custom_vector_database_spark.session import get_spark
from custom_vector_database_spark.vector_table import VectorTable

__all__ = ["get_spark", "VectorTable", "MultiVectorTable"]
__version__ = "0.1.0"
