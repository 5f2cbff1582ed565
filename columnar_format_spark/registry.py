"""Query registry: every named query pairs a PySpark builder with an
equivalent DuckDB oracle SQL string (or None for non-SQL-expressible
operators, which the driver checks rows-only).

Cross-engine determinism rules (every query in this repo follows them —
violating any of these makes the driver's value-hash comparison flaky):

1. SUM/AVG over doubles is order-dependent in IEEE arithmetic and Spark
   and DuckDB will aggregate in different orders. Instead cast the input
   to DECIMAL(18,2) first (the testdata money/value columns are 2dp):
   decimal addition is exact and associative, so any aggregation order
   yields the identical result in both engines. Cast the final decimal
   back to DOUBLE (deterministic) so output schemas are plain doubles.
   AVG = CAST(decimal_sum AS DOUBLE) / COUNT — a single IEEE division of
   identical operands, identical in both engines.
2. MIN/MAX/COUNT are order-independent — use them directly on doubles.
3. Raw (non-aggregated) doubles pass through untouched: both engines
   read the same parquet bits.
4. Never ROUND a double (Spark HALF_UP vs DuckDB half-even differ).
   Round only exact decimals, where both engines agree.
5. Timestamps in output are formatted to strings ('yyyy-MM-dd HH:mm:ss')
   to dodge tz-naive/aware representation differences.
6. Any LIMIT/top-k query totally orders its rows (explicit unique
   tie-break column) so the selected set is well-defined.
7. Alias every computed column identically in Spark and SQL — the
   driver sorts columns by name before hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add fn(spark, sf_dir) -> DataFrame to the registry."""
    def deco(fn):
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                  doc=(fn.__doc__ or "").strip())
        return fn
    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table.

    events.parquet stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects by default; read the nanos as long and truncate to
    microseconds — exactly what DuckDB's reader does natively, so both
    engines see identical timestamps.
    """
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def spread(df: DataFrame) -> DataFrame:
    """Ensure at least defaultParallelism partitions before a CPU-heavy
    projection (shingling, hashing, embedding math).

    At 100 TB the scan itself yields thousands of input splits and this
    is a no-op; it only fires for few-file inputs (like the single-file
    test parquet, which Spark reads as ONE task, serializing the whole
    stage on one core). The guard keeps it from adding a shuffle when
    the scan is already parallel.

    The decision reads the analyzed plan's FILE LIST (inputFiles), not
    df.rdd.getNumPartitions() — the RDD conversion builds the whole
    physical plan on the driver per call, a needless fixed cost at
    scale. File count is a conservative proxy for split count (a file
    never yields fewer splits than one); non-file sources (memory,
    streams) report no input files and pass through untouched.
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    n_files = len(df.inputFiles())
    if n_files and n_files < min(p, 8):
        return df.repartition(p)
    return df
