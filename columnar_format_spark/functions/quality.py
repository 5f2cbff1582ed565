"""Repetition-quality and corpus-packaging operators for the
training-data pipeline.

The reference has no text analysis at all (SURVEY.md §2.2 — reader.py /
writer.py contain no expression language, reader.py:165-221 is scan
only); these extend the engine's LLM-pipeline surface beyond the
q40-q43 basics with the repetition heuristics used by production
pretraining filters (duplicate n-gram fractions, dominant-token share),
corpus-level duplicated-shingle measurement, and deterministic
fixed-size shard packing for dataloaders.

Determinism: every ratio is one IEEE division of exact integers
(registry.py rules), every ordering key is an md5 hex string — so Spark
and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register, spread, table
from .text import _SQL_DOC_BUCKET, doc_bucket, ws_tokens


def _ngrams(toks: Column, n: Column, k: int) -> Column:
    """Array of space-joined k-grams of ``toks`` (empty when < k tokens).

    The guard matters: Spark's ``sequence(1, stop)`` generates a
    DESCENDING sequence when stop < 1, which would fabricate n-grams on
    short documents; DuckDB's ``range`` is empty there.
    """
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.when(n >= k, grams).otherwise(F.array().cast("array<string>"))


def _sql_ngrams(k: int) -> str:
    """DuckDB k-gram list over a token list column ``t`` (1-based,
    ``range`` exclusive stop ⇒ empty for short docs)."""
    return (
        f"list_transform(range(1, len(t) - {k - 2}), "
        f"i -> array_to_string(t[i:i+{k - 1}], ' '))"
    )


@register(
    "q79_repetition_quality",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS t FROM documents
    ), g AS (
      SELECT doc_id, t, {_sql_ngrams(2)} AS g2, {_sql_ngrams(3)} AS g3 FROM tk
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CASE WHEN len(g2) > 0
                THEN CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2)
                ELSE 0.0 END AS dup_2gram_frac,
           CASE WHEN len(g3) > 0
                THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3)
                ELSE 0.0 END AS dup_3gram_frac,
           CAST(list_max(list_transform(list_distinct(t),
                    u -> len(list_filter(t, x -> x = u)))) AS DOUBLE)
             / len(t) AS top_token_frac
    FROM g
    """,
)
def q79_repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: per-document duplicate-bigram /
    duplicate-trigram fractions and the share of the single most
    frequent token. High values flag boilerplate/spam for removal
    before training.

    Scale: pure map stage (no shuffle) — per-row array lambdas run in
    whole-stage codegen on the JVM; at 100 TB this is scan-bound. The
    dominant-token count is O(distinct·n) per row, bounded by document
    length, not data size.
    """
    d = table(spark, sf_dir, "documents")
    toks = ws_tokens(F.col("text"))
    n = F.size(toks)
    g2 = _ngrams(toks, n, 2)
    g3 = _ngrams(toks, n, 3)

    def dup_frac(g: Column) -> Column:
        total = F.size(g)
        dups = total - F.size(F.array_distinct(g))
        return F.when(total > 0, dups.cast("double") / total).otherwise(F.lit(0.0))

    top = F.array_max(
        F.transform(F.array_distinct(toks), lambda u: F.size(F.filter(toks, lambda x: x == u)))
    )
    return d.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        dup_frac(g2).alias("dup_2gram_frac"),
        dup_frac(g3).alias("dup_3gram_frac"),
        (top.cast("double") / n).alias("top_token_frac"),
    )


@register(
    "q85_shingle_dup_frac",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, source, regexp_split_to_array(text, '\\s+') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id, source,
             unnest(list_distinct({_sql_ngrams(8)})) AS sh
      FROM tk
    ), c AS (
      SELECT source, COUNT(*) OVER (PARTITION BY sh) AS nd FROM sh
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS total_shingles,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_shingles,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_frac
    FROM c GROUP BY source
    """,
)
def q85_shingle_dup_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-text measurement (RefinedWeb-style):
    per source, the fraction of distinct 8-token shingles that appear
    in more than one document. The corpus-health dial that decides
    whether fuzzy dedup (q52) is worth its shuffle.

    Scale: explode → one count window keyed by shingle → re-aggregate
    by source. The shingle window is the only wide stage; partial
    aggregation combines map-side, and AQE splits skewed shingle keys
    (boilerplate shingles are the classic hot keys). dup counts stay
    per-shingle-occurrence, so no second join back to documents is
    needed.
    """
    d = spread(table(spark, sf_dir, "documents"))
    toks = ws_tokens(F.col("text"))
    sh = F.array_distinct(_ngrams(toks, F.size(toks), 8))
    ex = d.select("source", F.explode(sh).alias("sh"))
    nd = F.count(F.lit(1)).over(Window.partitionBy("sh"))
    dup = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).cast("bigint")
    return (
        ex.withColumn("nd", nd)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("total_shingles"),
            dup.alias("dup_shingles"),
        )
        .withColumn(
            "dup_frac",
            F.col("dup_shingles").cast("double") / F.col("total_shingles"),
        )
    )


# Greedy shard packing: documents land in 8 independent hash buckets,
# each bucket packs in md5 order into ~SHARD_CHARS-char shards. Bucket
# count bounds the sort width; shard ids are globally unique via the
# bucket prefix.
N_PACK_BUCKETS = 8
SHARD_CHARS = 4000


@register(
    "q86_corpus_shards",
    oracle=f"""
    WITH h AS (
      SELECT n_chars,
             md5(CAST(doc_id AS VARCHAR)) AS hx,
             {_SQL_DOC_BUCKET} % {N_PACK_BUCKETS} AS bucket
      FROM documents
    ), c AS (
      SELECT bucket, n_chars,
             COALESCE(SUM(n_chars) OVER (
               PARTITION BY bucket ORDER BY hx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_excl
      FROM h
    )
    SELECT CAST(bucket * 1000000 + cum_excl // {SHARD_CHARS} AS BIGINT) AS shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM c GROUP BY 1
    """,
)
def q86_corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size shard assignment — the "write the
    training corpus as ~N-byte files for the dataloader" step. Docs are
    hash-shuffled (md5 order: stable across engines/reruns, no RNG
    state) and greedily packed into ~SHARD_CHARS-char shards by an
    exclusive running sum.

    Scale: a single global running sum would serialize on one
    partition; instead packing runs inside N_PACK_BUCKETS independent
    hash buckets (window partitionBy ⇒ one shuffle, N-way parallel).
    At 100 TB raise N_PACK_BUCKETS to ~cluster cores; shard ids stay
    unique and the pack stays deterministic per bucket.
    """
    d = table(spark, sf_dir, "documents")
    h = d.select(
        "n_chars",
        F.md5(F.col("doc_id").cast("string")).alias("hx"),
        (doc_bucket() % N_PACK_BUCKETS).alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("hx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = h.withColumn("cum_excl", F.coalesce(F.sum("n_chars").over(w), F.lit(0)))
    shard = (F.col("bucket") * 1000000 + F.expr(f"cum_excl div {SHARD_CHARS}")).cast("bigint")
    return (
        c.select(shard.alias("shard_id"), "n_chars")
        .groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )
