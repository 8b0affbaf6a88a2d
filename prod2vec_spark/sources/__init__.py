from prod2vec_spark.sources.io import (  # noqa: F401
    TABLES,
    expected_schema,
    read_table,
    read_csv,
    write_parquet,
    write_csv,
)
