"""Query corpus: every operator in SURVEY.md §2 exposed as a named query with
a DuckDB oracle. Importing this package registers the full corpus."""

from wal_consumer_spark.plans.registry import QuerySpec, all_specs, get_spec, register  # noqa: F401

# Import for side effect: each module registers its queries.
from wal_consumer_spark.plans import relational  # noqa: F401,E402
from wal_consumer_spark.plans import tpch  # noqa: F401,E402
from wal_consumer_spark.plans import aggregates  # noqa: F401,E402
from wal_consumer_spark.plans import windows  # noqa: F401,E402
from wal_consumer_spark.plans import scalars  # noqa: F401,E402
from wal_consumer_spark.plans import cdc  # noqa: F401,E402
from wal_consumer_spark.plans import llm  # noqa: F401,E402
from wal_consumer_spark.plans import streaming_batch  # noqa: F401,E402
from wal_consumer_spark.plans import textml  # noqa: F401,E402
from wal_consumer_spark.plans import curation  # noqa: F401,E402
from wal_consumer_spark.plans import sqlfront  # noqa: F401,E402
from wal_consumer_spark.plans import timeseries  # noqa: F401,E402
from wal_consumer_spark.plans import udfs  # noqa: F401,E402
from wal_consumer_spark.plans import analytics  # noqa: F401,E402
