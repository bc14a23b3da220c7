from pipeline311_spark.plans.registry import REGISTRY, QuerySpec, queries, oracle_sql  # noqa: F401
