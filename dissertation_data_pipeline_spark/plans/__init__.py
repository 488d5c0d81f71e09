"""Pipelines + the driver-facing query registry."""

from dissertation_data_pipeline_spark.plans.registry import QUERIES, query_fns, oracle_sqls  # noqa: F401
