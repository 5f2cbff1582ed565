"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)      — flagship TPC-H-Q1-style pricing summary at sf0.001.
queries()         — every implemented operator (SURVEY.md §2 + the
                    LLM-pipeline extensions), one named query each.
oracle_sql()      — DuckDB-equivalent SQL per query (same column
                    aliases; determinism rules in
                    columnar_format_spark/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from columnar_format_spark.queries import oracle_queries, spark_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from columnar_format_spark.registry import QUERIES

    return QUERIES["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    return oracle_queries()
