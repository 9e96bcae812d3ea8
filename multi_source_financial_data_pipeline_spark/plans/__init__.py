from multi_source_financial_data_pipeline_spark.plans.registry import (  # noqa: F401
    QUERIES,
    QuerySpec,
    oracle_map,
    query_map,
)
