"""lakehouse_test_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference harness ``hangc0276/lakehouse-test`` (streaming ingest ->
lakehouse tier -> scan, see SURVEY.md §2a) plus the full lakehouse
query surface it implies (SURVEY.md §2b): scans, joins, aggregations,
windows, set ops, scalar functions, streaming semantics, and
LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis).

Design principles (100 TB first):
- Declarative DataFrame/SQL plans; Catalyst/Tungsten pick physical
  strategy (predicate pushdown, column pruning, AQE, codegen).
- Broadcast small dimensions; shuffle only on real keys; map-side
  partial aggregation everywhere.
- Python only at the edges; hot paths stay JVM-side. Where Python is
  unavoidable (similarity/dedup kernels), Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from lakehouse_test_spark.session import get_spark, load_tables, register_views

__all__ = ["get_spark", "load_tables", "register_views", "__version__"]
