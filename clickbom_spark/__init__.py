"""clickbom_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the
reference SBOM ETL action (ClickHouse/ClickBOM, surveyed in SURVEY.md):
SBOM ingestion/normalization/merging/dedup/warehouse-load, plus a general
relational query surface and the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns,
streaming) the 100 TB north star requires.

Design principles (see SURVEY.md §7):
- Declarative DataFrame/SQL plans; let Catalyst optimize.
- Built-in ``pyspark.sql.functions`` in hot paths; Pandas UDFs only where
  built-ins genuinely can't express the semantics.
- Broadcast small dimensions, partition/bucket big joins, AQE on.
"""

__version__ = "0.1.0"
