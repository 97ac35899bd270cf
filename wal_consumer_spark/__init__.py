"""wal_consumer_spark — a PySpark-native engine with the capabilities of
sahabpardaz/wal-consumer, rebuilt Spark-first.

Layers (see SURVEY.md):

1. Fidelity layer — the reference's ordered, at-least-once, idempotency-aware
   CDC apply (reference: WalConsumer.java:127-182) re-expressed on Structured
   Streaming: a WAL parquet source, per-key last-op reduction, foreachBatch
   merge apply, checkpointed advance, Dropwizard-style metrics via a
   StreamingQueryListener.
2. Extension layer — the declared relational / streaming / LLM-data-pipeline
   query surface as thin idiomatic wrappers over DataFrame/Catalyst, each
   checkable against a DuckDB oracle.
"""

__version__ = "0.1.0"

from wal_consumer_spark.session import get_spark  # noqa: F401
