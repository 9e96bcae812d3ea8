from multi_source_financial_data_pipeline_spark.sources.tables import (  # noqa: F401
    TABLE_NAMES,
    load_table,
    load_tables,
)
