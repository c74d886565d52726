"""dsgrid-spark: a PySpark-native dimensional analytics engine.

Re-expresses the capabilities of NREL's dsgrid (see SURVEY.md) as
idiomatic Spark DataFrame operations, plus large-scale data-pipeline
operators (dedup, similarity search, text analysis).
"""

__version__ = "0.1.0"
