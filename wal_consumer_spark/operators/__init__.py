from wal_consumer_spark.operators.asof import asof_join  # noqa: F401
from wal_consumer_spark.operators.cdc import last_op_per_key, apply_cdc_batch  # noqa: F401
