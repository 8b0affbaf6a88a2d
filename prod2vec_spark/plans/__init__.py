from prod2vec_spark.plans.inspect import (  # noqa: F401
    count_exchanges,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)
