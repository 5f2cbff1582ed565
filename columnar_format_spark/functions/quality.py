"""Repetition-quality and corpus-packaging operators for the
training-data pipeline.

The reference has no text analysis at all (SURVEY.md §2.2 — reader.py /
writer.py contain no expression language, reader.py:165-221 is scan
only); these extend the engine's LLM-pipeline surface beyond the
q40-q43 basics with the repetition heuristics used by production
pretraining filters (duplicate n-gram fractions, dominant-token share),
corpus-level duplicated-shingle measurement, deterministic fixed-size
shard packing for dataloaders, and the retrieval stack (BM25 keyword
search plus reciprocal-rank fusion with the dense cosine ranker).

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

    Scale: pure map stage (no shuffle), JVM-side array expressions; at
    100 TB this is scan-bound. The dominant-token count is
    O(distinct·n) per row, bounded by document length, not data size.

    The staged projections are load-bearing: higher-order-function
    lambdas get no common-subexpression elimination, so inlining
    toks/g2/g3 into every consumer re-tokenizes and re-builds the
    n-gram arrays per use (~19x slower measured at sf0.1 — the same
    trap SCALING.md §3 documents for q52). CollapseProject keeps the
    stages separate because each alias is referenced more than once.
    """
    d = spread(table(spark, sf_dir, "documents"))
    t1 = d.select("doc_id", ws_tokens(F.col("text")).alias("toks"))
    n = F.size(F.col("toks"))
    t2 = t1.select(
        "doc_id", "toks", n.alias("n_tokens"),
        _ngrams(F.col("toks"), n, 2).alias("g2"),
        _ngrams(F.col("toks"), n, 3).alias("g3"),
    )
    t3 = t2.select(
        "doc_id", "n_tokens",
        F.size("g2").alias("n2"), F.size(F.array_distinct("g2")).alias("d2"),
        F.size("g3").alias("n3"), F.size(F.array_distinct("g3")).alias("d3"),
        F.array_max(
            F.transform(
                F.array_distinct("toks"),
                lambda u: F.size(F.filter(F.col("toks"), lambda x: x == u)),
            )
        ).alias("topc"),
    )

    def dup_frac(total: str, distinct: str) -> Column:
        return F.when(
            F.col(total) > 0,
            (F.col(total) - F.col(distinct)).cast("double") / F.col(total),
        ).otherwise(F.lit(0.0))

    return t3.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        dup_frac("n2", "d2").alias("dup_2gram_frac"),
        dup_frac("n3", "d3").alias("dup_3gram_frac"),
        (F.col("topc").cast("double") / F.col("n_tokens")).alias("top_token_frac"),
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


# BM25 keyword search over the corpus — the sparse-retrieval
# counterpart to q60's dense cosine top-k. Fixed query-term set (terms
# from the corpus vocabulary), k1/b at their standard values.
BM25_TERMS = ["spark", "hash", "window", "merge"]
BM25_K1 = "1.2"
BM25_B = "0.75"
BM25_TOPK = 20


def _bm25_sql() -> str:
    tf_cols = ", ".join(
        f"SUM(CASE WHEN term = '{t}' THEN 1 ELSE 0 END) AS tf{i}"
        for i, t in enumerate(BM25_TERMS))
    df_cols = ", ".join(
        f"SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(BM25_TERMS)))
    norm = f"({BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))"
    score = " + ".join(
        f"CASE WHEN tf{i} > 0 THEN ROUND(ln(1 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))"
        f" * tf{i} * ({BM25_K1} + 1) / (tf{i} + {norm}), 6) ELSE 0 END"
        for i in range(len(BM25_TERMS)))
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
      FROM documents
    ), perdoc AS (
      SELECT doc_id, COUNT(*) AS dl, {tf_cols} FROM toks GROUP BY doc_id
    ), g AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, {df_cols} FROM perdoc
    ), s AS (
      SELECT doc_id, CAST(dl AS BIGINT) AS dl, {score} AS score
      FROM perdoc CROSS JOIN g
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
      FROM s WHERE score > 0
    )
    SELECT doc_id, dl, score, rnk FROM ranked WHERE rnk <= {BM25_TOPK}
    """


@register("q87_bm25_search", oracle=_bm25_sql())
def q87_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search: top-20 documents for a fixed query-term
    set, scored ln-idf x length-normalized tf (k1=1.2, b=0.75). With
    q60 (dense cosine) this gives the engine both halves of a hybrid
    retrieval stack.

    Determinism: per-term scores are rounded to 6dp (q78's ln
    precedent) and added in fixed order; tf/df/dl are exact ints and
    avgdl is a single division, so Spark and DuckDB agree bit-for-bit.

    Scale: one shuffle to per-doc term counts; corpus stats (N, avgdl,
    per-term df) reduce to ONE broadcast row, so scoring is a map
    stage. Top-k is a rank-limit — Spark's TakeOrderedAndProject, no
    global sort materialization.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("term"))
    perdoc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("dl"),
        *[F.sum(F.when(F.col("term") == t, 1).otherwise(0)).alias(f"tf{i}")
          for i, t in enumerate(BM25_TERMS)])
    glob = perdoc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0)).alias(f"df{i}")
          for i in range(len(BM25_TERMS))])
    k1, b = F.expr(BM25_K1), F.expr(BM25_B)
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")

    def term_score(i: int) -> Column:
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(F.lit(1) + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5)))
        norm = k1 * (F.lit(1) - b + b * F.col("dl") / avgdl)
        return F.when(
            tf > 0, F.round(idf * tf * (k1 + F.lit(1)) / (tf + norm), 6)
        ).otherwise(F.lit(0))

    score = term_score(0)
    for i in range(1, len(BM25_TERMS)):
        score = score + term_score(i)
    scored = (
        perdoc.crossJoin(F.broadcast(glob))
        .select("doc_id", F.col("dl").cast("bigint").alias("dl"),
                score.alias("score"))
        .filter(F.col("score") > 0)
    )
    # distributed top-k FIRST (TakeOrderedAndProject — per-partition
    # heaps, never a corpus-wide single-partition window), THEN rank
    # the <=BM25_TOPK survivors; (score desc, doc_id) is a total order
    # so row_number here equals rank over the full scored set
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")) \
                .limit(BM25_TOPK)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select("doc_id", "dl", "score", "rnk")
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


# Hybrid retrieval: reciprocal-rank fusion of the sparse (BM25, q87)
# and dense (cosine top-k, q60) rankers, the standard way production
# search fuses lexical and embedding retrieval. RRF_K = 60 per the
# original RRF formulation.
RRF_K = 60
HYBRID_TOPK = 10


def _hybrid_sql() -> str:
    from .similarity import _COSINE_SQL

    return f"""
    WITH sparse AS ({_bm25_sql()}),
    dense AS (SELECT cid, rnk FROM ({_COSINE_SQL}) WHERE qid = 0),
    fused AS (
      SELECT COALESCE(s.doc_id, d.cid) AS doc_id,
             s.rnk AS rnk_sparse, d.rnk AS rnk_dense,
             COALESCE(1 / CAST({RRF_K} + s.rnk AS DOUBLE), 0)
               + COALESCE(1 / CAST({RRF_K} + d.rnk AS DOUBLE), 0) AS rrf
      FROM sparse s FULL JOIN dense d ON s.doc_id = d.cid),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rnk
      FROM fused)
    SELECT doc_id, rnk_sparse, rnk_dense, rrf, rnk
    FROM ranked WHERE rnk <= {HYBRID_TOPK}
    """


@register("q91_hybrid_retrieval", oracle=_hybrid_sql())
def q91_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse BM25 (q87) and dense cosine (q60, query
    vector 0; doc_id = vec_id as in q64) rankings by reciprocal-rank
    fusion — rrf = Σ 1/(60+rank) over the rankers that returned the
    doc. A doc found by only one ranker still scores (full outer
    join), which is RRF's point.

    Determinism: ranks are exact ints, each contribution is one IEEE
    division, and the two terms add in fixed order.

    Scale: both inputs are already top-k lists (≤ tens of rows), so
    the fusion join is a broadcast over driver-sized data; the heavy
    lifting happened inside the rankers, which is the right layering —
    fusion cost never grows with corpus size.
    """
    from .similarity import q60_cosine_topk

    sparse = q87_bm25_search(spark, sf_dir).select(
        F.col("doc_id").alias("sdoc"), F.col("rnk").alias("rnk_sparse"))
    dense = q60_cosine_topk(spark, sf_dir).filter(F.col("qid") == 0).select(
        F.col("cid").alias("ddoc"), F.col("rnk").alias("rnk_dense"))
    fused = sparse.join(dense, sparse.sdoc == dense.ddoc, "full").select(
        F.coalesce(F.col("sdoc"), F.col("ddoc")).alias("doc_id"),
        "rnk_sparse", "rnk_dense",
        (F.coalesce(F.lit(1) / (F.lit(RRF_K) + F.col("rnk_sparse")).cast("double"), F.lit(0.0))
         + F.coalesce(F.lit(1) / (F.lit(RRF_K) + F.col("rnk_dense")).cast("double"), F.lit(0.0))
         ).alias("rrf"),
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= HYBRID_TOPK)
        .select("doc_id", "rnk_sparse", "rnk_dense", "rrf", "rnk")
    )
