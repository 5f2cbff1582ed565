"""JSONL (newline-delimited JSON) source: the fourth ingest format
next to parquet, CSV (reference-rules inference, colf/csv_ingest.py)
and COLF itself. Training-data corpora ship overwhelmingly as JSONL;
the engine reads it with an EXPLICIT schema (never inference — same
policy as the CSV path: inference rules are an engine feature, not a
file-format accident).

The reference (satyakalla890/columnar-format) has no JSON surface
(SURVEY.md §2.2); this widens the engine's source coverage with the
DuckDB oracle as the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

from ..registry import register, table
from ..staging import stage_once

DOC_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("lang", StringType()),
    StructField("source", StringType()),
    StructField("n_chars", LongType()),
])

def _stage_documents_jsonl(spark: SparkSession, sf_dir: str) -> str:
    return stage_once(
        ("jsonl", sf_dir), "jsonl_ingest_",
        lambda d: table(spark, sf_dir, "documents").repartition(8)
        .write.mode("overwrite").json(d))


@register(
    "q102_jsonl_ingest",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
           CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
           MIN(md5(text)) AS min_text_md5,
           MAX(md5(text)) AS max_text_md5
    FROM documents GROUP BY lang
    """,
)
def q102_jsonl_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL corpus ingest with byte-fidelity proof: documents staged
    as newline-delimited JSON, read back with an explicit schema, then
    aggregated per lang INCLUDING md5-of-text extremes and distinct
    counts. The query matches the oracle (which reads the original
    parquet) iff every text byte — unicode, embedded newlines, quotes
    — survived the JSON encode/decode round-trip.

    Scale: JSONL is line-splittable, so the scan parallelizes like
    CSV (unlike one-block-per-column COLF); the explicit schema skips
    Spark's sampling-inference pass, which at 100 TB is a full extra
    read. One shuffle to the per-lang aggregate.
    """
    src = _stage_documents_jsonl(spark, sf_dir)
    docs = spark.read.schema(DOC_SCHEMA).json(src)
    h = F.md5(F.col("text"))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
        F.count_distinct(h).cast("bigint").alias("n_distinct_texts"),
        F.min(h).alias("min_text_md5"),
        F.max(h).alias("max_text_md5"),
    )
