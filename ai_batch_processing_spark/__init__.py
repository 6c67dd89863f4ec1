"""ai_batch_processing_spark — a PySpark-native analytics / batch-inference engine.

A brand-new, Spark-first re-expression of the capabilities of the reference
repo Mazhar31/AI-Batch-Processing (an asyncio LLM batch-ETL pipeline), plus
the relational / dedup / similarity / text-analysis / streaming operators a
large-scale (100 TB) training-data pipeline needs.

Design stance (SURVEY.md §7.0):
- DataFrame/SQL only; Catalyst plans everything. No RDDs, no driver-side row
  loops, no ``collect()`` in any hot path.
- Python touches data only through Arrow-vectorized pandas UDFs
  (``mapInPandas`` / ``applyInPandas``) and only where built-in
  ``pyspark.sql.functions`` genuinely cannot express the semantics
  (the LLM map, stateful streaming).
- Every operator is registered in :mod:`ai_batch_processing_spark.queries`
  with a DuckDB oracle so correctness is machine-checkable.
"""

from ai_batch_processing_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
