"""tamar_spark — a PySpark-native analytics engine with the semantics of the
reference streaming DSL (qedus/tamar) plus the relational + LLM-data-pipeline
surface a 100 TB training-data platform needs.

Layout:
- :mod:`tamar_spark.env`        — SparkSession factory, Environment (sources/execute)
- :mod:`tamar_spark.stream`     — DataStream / KeyedDataStream / WindowedDataStream
- :mod:`tamar_spark.windows`    — session / tumbling / sliding window factories
- :mod:`tamar_spark.operators`  — dedup, similarity search, as-of join, …
- :mod:`tamar_spark.functions`  — text analysis, fingerprinting, multimodal
- :mod:`tamar_spark.streaming`  — stateful processing (process_state) + parity
- :mod:`tamar_spark.plans`      — plan inspection/assertion helpers
"""

from tamar_spark.env import Environment, get_spark, prep_session
from tamar_spark.stream import DataStream, KeyedDataStream, WindowedDataStream
from tamar_spark import windows

__all__ = [
    "Environment",
    "get_spark",
    "prep_session",
    "DataStream",
    "KeyedDataStream",
    "WindowedDataStream",
    "windows",
]

__version__ = "0.1.0"
