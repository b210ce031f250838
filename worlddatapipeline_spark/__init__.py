"""worlddatapipeline_spark — a PySpark-native analytics/ETL engine.

Re-expresses the query and data-processing capabilities of the reference
system (Aether-Verilys/WorldDataPipeline, surveyed in /root/repo/SURVEY.md)
as an idiomatic Spark DataFrame/SQL engine, extended with LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis),
designed for 100 TB scale.
"""

from .session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
