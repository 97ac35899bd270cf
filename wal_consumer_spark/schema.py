"""WAL record schema and operation constants.

Mirrors the reference envelope (WalEntity.java:18-46, Operation.java:6-10):
`id` is the total order (IDENTITY pk), `entity_id` the domain key,
`operation` one of ADD/UPDATE/DELETE stored as string, `entity_bytes` the
opaque serialized payload (BinaryType; the reference caps it at 20000 bytes,
WalEntity.java:38-39), `entity_type` the logical entity name.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)


class Operation:
    """ADD/UPDATE/DELETE, per reference Operation.java:6-10."""

    ADD = "ADD"
    UPDATE = "UPDATE"
    DELETE = "DELETE"
    ALL = (ADD, UPDATE, DELETE)


#: Max payload size honoured by producers (WalEntity.java:38-39).
MAX_ENTITY_BYTES = 20_000

#: Fixed envelope schema (WalEntity.java:18-46 → SURVEY.md §1.2).
WAL_SCHEMA = StructType(
    [
        StructField("id", LongType(), nullable=False),
        StructField("entity_id", LongType(), nullable=False),
        StructField("operation", StringType(), nullable=False),
        StructField("entity_bytes", BinaryType(), nullable=True),
        StructField("entity_type", StringType(), nullable=True),
    ]
)
