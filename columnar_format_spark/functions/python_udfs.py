"""Python extension points the engine supports beyond built-ins:
grouped-map applyInPandas (per-group pandas computation), grouped-agg
pandas UDFs, and Python UDTFs (one row in, many rows out). The scalar
pandas-UDF path is exercised by q62 (similarity.py).

These close SURVEY.md §2.2's "UDF/UDAF/UDTF" row. The reference has no
function surface at all — its only extension point is editing
writer.py/reader.py.

Determinism notes (oracle-hash safety): median of an even group is the
mean of the two middle float64s — numpy and DuckDB both compute
(a+b)/2 on identical operands, one IEEE op, so results are bit-equal.
Token positions come from a deterministic whitespace split in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register, spread, table


@register(
    "q34_grouped_pandas_stats",
    oracle="""
    SELECT user_id, event_type,
           COUNT(*) AS n,
           MEDIAN(value) AS median_value,
           MAX(value) - MIN(value) AS value_range
    FROM events
    GROUP BY user_id, event_type
    """,
)
def q34_grouped_pandas_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, event_type) robust stats via grouped-map
    applyInPandas: each group arrives as ONE pandas DataFrame, the
    shape any custom per-entity model (sketch, fit, rank) takes when
    SQL aggregates can't express it. Median here is the demo payload —
    numpy's sort-based median, bit-equal to DuckDB's MEDIAN on float64.

    Scale: one shuffle on the grouping key; each group must fit one
    worker's memory (fine for per-entity groups; a skewed giant key
    needs salting upstream — same discipline as any groupBy).
    """
    import numpy as np
    import pandas as pd

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy()
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [len(v)],
            "median_value": [float(np.median(v))],
            "value_range": [float(v.max() - v.min())],
        })

    # Explicit repartition on the group keys: applyInPandas pays a
    # fixed Python cost PER GROUP, which AQE can't see — its byte-based
    # coalescing squeezed 7.5k groups into 4 post-shuffle partitions
    # (8s); an explicit key repartition is honored verbatim and spreads
    # the per-group overhead across the cluster (1s). The groupBy then
    # reuses this partitioning (no second exchange).
    p = spark.sparkContext.defaultParallelism
    ev = table(spark, sf_dir, "events").repartition(p, "user_id", "event_type")
    return (
        ev.groupBy("user_id", "event_type")
        .applyInPandas(
            stats,
            schema="user_id long, event_type string, n long, "
                   "median_value double, value_range double",
        )
    )


N_UDTF_DOCS = 20


@register(
    "q35_udtf_tokenize",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS ts
      FROM documents WHERE doc_id < {N_UDTF_DOCS})
    SELECT doc_id, ts[i] AS token, CAST(i AS INT) AS pos
    FROM toks, UNNEST(range(1, len(ts) + 1)) AS u(i)
    WHERE ts[i] <> ''
    """,
)
def q35_udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one document row in, one row per (token, position)
    out — the lateral-expansion extension point (parsers, segmenters,
    chunkers for LLM pipelines). The oracle is DuckDB's equivalent
    lateral unnest.

    Scale: pure map-side expansion, no shuffle; output rows stream per
    Arrow batch rather than materializing a whole partition.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="out_doc_id bigint, token string, pos int")
    class Tokenize:
        def eval(self, doc_id: int, text: str):
            for i, tok in enumerate(text.lower().split(), start=1):
                yield doc_id, tok, i

    spark.udtf.register("colf_tokenize", Tokenize)
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < N_UDTF_DOCS)
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql("""
        SELECT t.out_doc_id AS doc_id, t.token, t.pos
        FROM udtf_docs, LATERAL colf_tokenize(doc_id, text) t
    """)
