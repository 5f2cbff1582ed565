"""Text-analysis operators over the `documents` table: token counting,
quality scoring, language-ID heuristics, document fingerprinting.

All hot-path expressions are JVM built-ins (split/regexp/md5/length) —
no Python UDFs — so they stay inside whole-stage codegen and scale
linearly with executors. Formulas are chosen to be expressible
identically in DuckDB for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register, table

# Small English stopword list shared by quality scoring and lang-ID.
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "for", "on", "with"]
_SW_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol
TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def ws_tokens(c: Column) -> Column:
    return F.split(c, "\\s+")


@register(
    "q40_token_count",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS BIGINT) AS total_ws_tokens,
           CAST(SUM(len(regexp_extract_all(text, '{TOKEN_RE}'))) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           (CAST(SUM(len(regexp_split_to_array(text, '\\s+'))) AS DOUBLE)
              / COUNT(*)) AS avg_ws_tokens
    FROM documents
    GROUP BY source
    """,
)
def q40_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex pre-tokenizer,
    aggregated per source. Integer sums are exact → engine-identical."""
    d = table(spark, sf_dir, "documents")
    n_ws = F.size(ws_tokens(F.col("text")))
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_RE), 0))
    return d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_ws).alias("total_ws_tokens"),
        F.sum(n_bpe).alias("total_bpe_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum(n_ws).cast("double") / F.count(F.lit(1))).alias("avg_ws_tokens"),
    )


@register(
    "q41_text_quality",
    oracle=f"""
    SELECT doc_id,
           length(text) AS n_chars_m,
           len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
           (CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
              / length(text)) AS punct_ratio,
           (CAST(len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                 x -> list_contains({_SW_SQL}, x))) AS DOUBLE)
              / len(regexp_split_to_array(text, '\\s+'))) AS stopword_ratio,
           (CAST(length(text) AS DOUBLE)
              / len(regexp_split_to_array(text, '\\s+'))) AS chars_per_token
    FROM documents
    """,
)
def q41_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals: punctuation ratio, stopword ratio,
    chars-per-token. Per-row double divisions of exact ints —
    deterministic across engines. This is the quality-filter front end
    of a training-data pipeline; at 100 TB it is a pure map stage."""
    d = table(spark, sf_dir, "documents")
    text = F.col("text")
    n_chars = F.length(text)
    toks = ws_tokens(text)
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))
    sw = F.array([F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(ws_tokens(F.lower(text)), lambda x: F.array_contains(sw, x)))
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (n_stop.cast("double") / n_tokens).alias("stopword_ratio"),
        (n_chars.cast("double") / n_tokens).alias("chars_per_token"),
    )


@register(
    "q42_lang_stats",
    oracle=f"""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                              x -> list_contains({_SW_SQL}, x))) * 10
                          > len(regexp_split_to_array(text, '\\s+'))
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_englishy,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def q42_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: a doc is 'englishy' when >10% of its
    tokens are English stopwords; distribution per labeled lang."""
    d = table(spark, sf_dir, "documents")
    sw = F.array([F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(ws_tokens(F.lower(F.col("text"))), lambda x: F.array_contains(sw, x)))
    n_tok = F.size(ws_tokens(F.col("text")))
    englishy = F.when(n_stop * 10 > n_tok, 1).otherwise(0)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(englishy).cast("bigint").alias("n_englishy"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "q43_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
           substr(md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))), 1, 8) AS fp_prefix
    FROM documents
    """,
)
def q43_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprint: md5 over whitespace-normalized lowercased
    text — the exact-dedup key at scale (hash once, group by the
    128-bit digest instead of shuffling full documents)."""
    d = table(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.regexp_replace(F.col("text"), "\\s+", " ")))
    return d.select("doc_id", fp.alias("fingerprint"),
                    F.substring(fp, 1, 8).alias("fp_prefix"))


@register(
    "q44_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(unhex(md5(text))) AS blob_len,
           upper(substr(md5(text), 1, 8)) AS blob_head_hex,
           octet_length(encode(text)) AS payload_bytes
    FROM documents
    WHERE doc_id < 100
    """,
)
def q44_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column plumbing: a deterministic fake binary payload
    (unhex(md5)) standing in for image/audio bytes, with typed metadata
    (lengths, head bytes) computed JVM-side. The real decode path is
    functions/multimodal.py (mapInPandas with a stubbed codec)."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    blob = F.unhex(F.md5(F.col("text")))
    return d.select(
        "doc_id",
        F.octet_length(blob).alias("blob_len"),
        F.upper(F.substring(F.hex(blob), 1, 8)).alias("blob_head_hex"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("payload_bytes"),
    )


@register(
    "q90_training_pipeline",
    oracle=f"""
    WITH enriched AS (
      SELECT doc_id, source, lang, text,
             len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
             (CAST(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS DOUBLE)
                / length(text)) AS punct_ratio,
             CASE WHEN len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                       x -> list_contains({_SW_SQL}, x))) * 10
                       > len(regexp_split_to_array(text, '\\s+'))
                  THEN 1 ELSE 0 END AS is_english,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents),
    filtered AS (
      SELECT * FROM enriched WHERE n_tokens >= 10 AND punct_ratio <= 0.3),
    deduped AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
        FROM filtered) WHERE rn = 1)
    SELECT source, lang,
           COUNT(*) AS n_docs_kept,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           (CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*)) AS avg_tokens,
           CAST(SUM(is_english) AS BIGINT) AS n_englishy
    FROM deduped
    GROUP BY source, lang
    """,
)
def q90_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite LLM-corpus pipeline, end to end in one plan:
    quality filter (length + punctuation) → language-ID heuristic →
    exact dedup (keep lowest doc_id per fingerprint) → per-(source,
    lang) corpus stats. This is the query a training-data user actually
    runs; q40-q43/q50-q54 are its unit pieces.

    Scale: enrichment and filtering are pure map stages; dedup is one
    shuffle on the 128-bit fingerprint (16 bytes/row, not the text);
    the final rollup reuses nothing heavier than the deduped rows.
    Catalyst pipelines the whole chain into two shuffle boundaries.
    """
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    text = F.col("text")
    n_chars = F.length(text)
    n_tokens = F.size(ws_tokens(text))
    punct_ratio = (
        (n_chars - F.length(F.regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))
         ).cast("double") / n_chars)
    sw = F.array([F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(ws_tokens(F.lower(text)), lambda x: F.array_contains(sw, x)))
    enriched = d.select(
        "doc_id", "source", "lang",
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        F.when(n_stop * 10 > n_tokens, 1).otherwise(0).alias("is_english"),
        F.md5(F.lower(F.regexp_replace(text, "\\s+", " "))).alias("fingerprint"),
    )
    filtered = enriched.filter((F.col("n_tokens") >= 10) & (F.col("punct_ratio") <= 0.3))
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    deduped = filtered.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return deduped.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        F.sum("is_english").cast("bigint").alias("n_englishy"),
    )


@register(
    "q58_ngram_vocabulary",
    oracle=r"""
    WITH toks AS (
      SELECT lang, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
      FROM documents),
    grams AS (
      SELECT lang, tok, COUNT(*) AS freq FROM toks
      WHERE tok <> '' GROUP BY lang, tok),
    ranked AS (
      SELECT lang, tok, freq,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY freq DESC, tok) AS rnk
      FROM grams)
    SELECT lang, tok, freq, rnk FROM ranked WHERE rnk <= 10
    """,
)
def q58_ngram_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary table: top-10 tokens by frequency per
    language — the frequency-table op every tokenizer-training /
    vocab-pruning pipeline starts with.

    Scale: explode → groupBy(lang, token) with map-side partial counts
    (the shuffle carries one row per distinct token per task, not per
    occurrence); the top-k window collapses to per-partition heaps
    under WindowGroupLimit. At web scale add a mincount filter before
    the window so singleton typos never shuffle twice.
    """
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "lang", F.explode(ws_tokens(F.lower(F.col("text")))).alias("tok"))
    grams = (
        toks.filter(F.col("tok") != "")
        .groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("freq"), F.asc("tok"))
    return (
        grams.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
    )


@register(
    "q59_length_histogram",
    oracle="""
    WITH lens AS (
      SELECT len(string_split(text, ' ')) AS n_tokens FROM documents)
    SELECT CAST(LEAST(FLOOR(n_tokens / 8), 7) AS BIGINT) AS bucket,
           CAST(LEAST(FLOOR(n_tokens / 8), 7) * 8 AS BIGINT) AS bucket_lo,
           COUNT(*) AS n_docs,
           CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens
    FROM lens GROUP BY 1, 2
    """,
)
def q59_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length histogram (8-wide buckets, top-coded at 56+) — the
    corpus-profiling op behind truncation/packing decisions in a
    training-data pipeline.

    Scale: fixed bucketing is a map-only expression + an 8-group
    aggregate; no sort, no sketch, no second pass (unlike quantile-
    based histograms).
    """
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    bucket = F.least(F.floor(n_tokens / 8), F.lit(7)).cast("bigint")
    return (
        d.select(n_tokens.alias("n_tokens"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").cast("bigint").alias("min_tokens"),
            F.max("n_tokens").cast("bigint").alias("max_tokens"),
        )
        .withColumn("bucket_lo", (F.col("bucket") * 8).cast("bigint"))
        .select("bucket", "bucket_lo", "n_docs", "min_tokens", "max_tokens")
    )


# 0..99 bucket from the first 4 hex nibbles of md5(doc_id) — the
# engine-stable "random" both Spark and DuckDB reproduce bit-for-bit.
_SQL_DOC_BUCKET = (
    "(((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 4096"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) * 256"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 3, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 4, 1)) - 1)) % 100)"
)


def doc_bucket(id_col: str = "doc_id") -> Column:
    """Deterministic 0..99 bucket from md5 of the id — reproducible
    sampling/splitting without RNG state (same value on any engine,
    any partitioning, any retry)."""
    def nib(pos: int) -> Column:
        return F.expr(
            f"instr('0123456789abcdef', substring(md5(CAST({id_col} AS STRING)), {pos}, 1)) - 1"
        ).cast("long")

    h16 = nib(1) * 4096 + nib(2) * 256 + nib(3) * 16 + nib(4)
    return h16 % 100


@register(
    "q67_deterministic_split",
    oracle=f"""
    WITH tagged AS (
      SELECT lang,
             CASE WHEN {_SQL_DOC_BUCKET} < 80 THEN 'train'
                  WHEN {_SQL_DOC_BUCKET} < 90 THEN 'val'
                  ELSE 'test' END AS split,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents)
    SELECT lang, split, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM tagged GROUP BY lang, split
    """,
)
def q67_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment from an md5 hash of the doc
    id — the held-out-split op every training pipeline needs. Hash
    bucketing (not rand()) makes the split stable across engines,
    reruns, retries, and incremental corpus growth: a document's split
    never changes when other documents are added or the job re-runs.

    Scale: map-only tag + one small aggregate; the same bucket column
    also serves as the stratified down-sampling dial (bucket < k).
    """
    d = table(spark, sf_dir, "documents")
    b = doc_bucket()
    split = (F.when(b < 80, "train").when(b < 90, "val").otherwise("test"))
    return (
        d.select("lang", split.alias("split"),
                 F.size(F.split("text", " ")).alias("n_tokens"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").cast("bigint").alias("total_tokens"))
    )


# per-source sampling rates (percent) for the corpus mixture; sources
# absent from the table drop out via the inner join
MIX_RATES = {"src0": 100, "src1": 85, "src2": 70, "src3": 55, "src4": 40,
             "src5": 25, "src6": 10}


@register(
    "q68_corpus_mixture",
    oracle=f"""
    WITH rates(source, rate) AS (VALUES
      {", ".join(f"('{s}', {r})" for s, r in sorted(MIX_RATES.items()))}),
    kept AS (
      SELECT d.source, len(string_split(d.text, ' ')) AS n_tokens
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE {_SQL_DOC_BUCKET} < r.rate)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM kept GROUP BY source
    """,
)
def q68_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: each source down-sampled at its own
    rate via the deterministic hash bucket (src0 100%, src1 85%, ...) —
    how a training mix is rebalanced without materializing copies.
    Sources without a configured rate drop out via the inner join
    against the rate table.

    Scale: the rate table broadcasts; sampling is a map-only filter, so
    the mixture costs one scan regardless of how many sources exist.
    """
    d = table(spark, sf_dir, "documents")
    from ..session import local_df

    rates = local_df(d.sparkSession,
                     sorted(MIX_RATES.items()), "source string, rate int")
    return (
        d.join(F.broadcast(rates), "source")
        .filter(doc_bucket() < F.col("rate"))
        .select("source", F.size(F.split("text", " ")).alias("n_tokens"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_tokens").cast("bigint").alias("total_tokens"))
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination + TF-IDF keywords
# ---------------------------------------------------------------------------

_DECON_N = 5  # word n-gram size for contamination matching


@register(
    "q77_decontamination",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, source,
             regexp_split_to_array(lower(text), '\s+') AS w,
             {_SQL_DOC_BUCKET} AS b
      FROM documents),
    g AS (
      SELECT doc_id, b,
             unnest(list_transform(range(1, len(w) - {_DECON_N - 2}),
                                   i -> array_to_string(w[i:i+{_DECON_N - 1}], ' '))) AS gram
      FROM t WHERE len(w) >= {_DECON_N}),
    bench AS (SELECT DISTINCT gram FROM g WHERE b >= 97),
    contam AS (
      SELECT DISTINCT doc_id FROM g
      WHERE b < 97 AND gram IN (SELECT gram FROM bench)),
    train AS (SELECT doc_id, source FROM t WHERE b < 97)
    SELECT source,
           COUNT(*) AS n_train,
           CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clean
    FROM train LEFT JOIN contam c ON train.doc_id = c.doc_id
    GROUP BY source
    """,
)
def q77_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: the top-3% hash buckets of `documents`
    stand in for a held-out eval set; any training document sharing a
    word 5-gram with that set is flagged contaminated (the standard
    n-gram-overlap test-set-leakage check for training corpora).
    Reports kept/flagged counts per source.

    Scale: grams are generated map-side by JVM built-ins
    (transform/sequence/slice — no Python); the benchmark-gram set is a
    few percent of the corpus so the semi join broadcasts under AQE,
    making contamination a map-side probe; the distinct on flagged doc
    ids is the only shuffle that grows with corpus size.
    """
    d = table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "source",
        F.split(F.lower("text"), r"\s+").alias("w"),
        doc_bucket().alias("b"))
    grams = base.filter(F.size("w") >= _DECON_N).select(
        "doc_id", "b",
        F.explode(F.expr(
            f"transform(sequence(1, size(w) - {_DECON_N - 1}),"
            f" i -> array_join(slice(w, i, {_DECON_N}), ' '))")).alias("gram"))
    bench_grams = grams.filter(F.col("b") >= 97).select("gram").distinct()
    contaminated = (
        grams.filter(F.col("b") < 97)
        .join(bench_grams, "gram", "leftsemi")
        .select("doc_id").distinct()
        .withColumn("is_contam", F.lit(1)))
    train = base.filter(F.col("b") < 97).select("doc_id", "source")
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_train"),
             F.sum(F.when(F.col("is_contam").isNotNull(), 1).otherwise(0))
              .cast("bigint").alias("n_contaminated"),
             F.sum(F.when(F.col("is_contam").isNull(), 1).otherwise(0))
              .cast("bigint").alias("n_clean"))
    )


@register(
    "q78_tfidf_keywords",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(regexp_split_to_array(lower(text), '\s+')) AS term
      FROM documents),
    filt AS (
      SELECT * FROM toks
      WHERE len(term) >= 3 AND NOT list_contains({_SW_SQL}, term)),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_corpus FROM documents),
    dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM filt GROUP BY term),
    tf AS (SELECT source, term, COUNT(*) AS tf FROM filt GROUP BY source, term),
    scored AS (
      SELECT tf.source, tf.term, tf.tf, dfreq.df,
             ROUND(tf.tf * ln((n.n_corpus + 1) / (dfreq.df + 1)), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY tfidf DESC, term) AS rnk
      FROM scored)
    SELECT source, term, tf, df, tfidf, rnk FROM ranked WHERE rnk <= 5
    """,
)
def q78_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF keyword extraction: top-5 terms per source scored
    tf x ln((N+1)/(df+1)) over the whole corpus (stopwords and <3-char
    tokens dropped). The cross-document df weighting is what q58's raw
    frequency ranking can't express.

    Scale: two shuffles (df by term, tf by source+term); the corpus
    size N is a 1-row broadcast; ranking shuffles only the per-source
    term aggregates, not documents. The score is rounded to 6dp so the
    ordering is engine-stable.
    """
    d = table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", "source",
                 F.explode(F.split(F.lower("text"), r"\s+")).alias("term"))
        .filter((F.length("term") >= 3) & ~F.col("term").isin(STOPWORDS)))
    n_docs = d.select(F.countDistinct("doc_id").alias("n_corpus"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    tf = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.round(
            F.col("tf") * F.log((F.col("n_corpus") + 1) / (F.col("df") + 1)), 6)))
    from pyspark.sql.window import Window
    w = Window.partitionBy("source").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("source", "term", "tf", "df", "tfidf", "rnk"))


# the synthetic corpus has ~31 distinct whitespace tokens; K=20 keeps
# a real OOV tail so the anti-join path is value-exercised, not
# trivially zero
OOV_VOCAB_K = 20


@register(
    "q150_oov_rate",
    oracle=rf"""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
      FROM documents),
    toks2 AS (SELECT source, tok FROM toks WHERE tok <> ''),
    vocab AS (
      SELECT tok FROM toks2 GROUP BY tok
      ORDER BY COUNT(*) DESC, tok LIMIT {OOV_VOCAB_K})
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN tok NOT IN (SELECT tok FROM vocab)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           (CAST(SUM(CASE WHEN tok NOT IN (SELECT tok FROM vocab)
                          THEN 1 ELSE 0 END) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) AS oov_rate
    FROM toks2
    GROUP BY source
    """,
)
def q150_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage audit: build the top-K corpus vocabulary
    (by frequency, ties bytewise) and measure each source's
    out-of-vocabulary token rate — the go/no-go metric before
    committing a tokenizer/vocab size to a training run.

    Scale: the vocabulary is a partial-agged token count topped by
    TakeOrderedAndProject (NO global-orderBy window — the q24
    single-partition trap); it is vocabulary-sized, so it broadcasts
    into a LEFT ANTI join that tags OOV tokens map-side. Everything
    else is two partial aggregates. The rate is a ratio of exact
    int64 counts — deterministic in any partitioning.
    """
    d = table(spark, sf_dir, "documents")
    toks = (d.select("source",
                     F.explode(ws_tokens(F.lower("text"))).alias("tok"))
            .filter(F.col("tok") != ""))
    vocab = (toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
             .orderBy(F.desc("freq"), F.asc("tok"))
             .limit(OOV_VOCAB_K)
             .select("tok"))
    per_src = toks.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"))
    oov = (toks.join(F.broadcast(vocab), "tok", "left_anti")
           .groupBy("source")
           .agg(F.count(F.lit(1)).cast("bigint").alias("n_oov")))
    return (
        per_src.join(oov, "source", "left")
        .select(
            "source", "n_tokens",
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("bigint")
            .alias("n_oov"),
            (F.coalesce(F.col("n_oov"), F.lit(0)).cast("double")
             / F.col("n_tokens").cast("double")).alias("oov_rate"))
    )


HH_TOPK = 20
HH_CAND_PER_PART = 200
HH_PRUNE_AT = 50 * HH_CAND_PER_PART


@register(
    "q158_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
      FROM documents)
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM toks WHERE tok <> ''
    GROUP BY tok
    ORDER BY n_occurrences DESC, tok
    LIMIT {HH_TOPK}
    """,
)
def q158_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most frequent corpus tokens WITHOUT a full-vocab
    shuffle — the heavy-hitters pattern for web-scale token/n-gram
    stats. Phase 1 finds candidates with a bounded space-saving
    counter per partition (Arrow-batched mapInPandas: a Counter capped
    at 10k entries, periodically pruned to its top 200, which finally
    emits 200 candidates per partition). Phase 2 broadcast-joins the
    tiny candidate set back and recounts EXACTLY, so reported counts
    are never sketch estimates; top-k selection is orderBy+limit
    (TakeOrderedAndProject).

    Exactness: the recount makes any error one of candidate RECALL
    only — a true heavy hitter is missed only if it falls outside the
    per-partition top-200 in EVERY partition, which for a Zipf-shaped
    token distribution and k=20 has enormous margin; the oracle (full
    exact groupBy) re-proves it on every driver run. At 100 TB the
    full-vocab groupBy shuffles one row per distinct n-gram per task
    (billions); this shuffles 200 rows per task plus one exact pass
    filtered to the surviving candidates.
    """
    from ..registry import spread

    d = spread(table(spark, sf_dir, "documents"))
    toks = (d.select(F.explode(ws_tokens(F.lower(F.col("text"))))
                     .alias("tok"))
            .filter(F.col("tok") != ""))

    def topm(batches):
        from collections import Counter

        import pandas as pd

        counts: Counter = Counter()
        for pdf in batches:
            counts.update(pdf["tok"].value_counts().to_dict())
            if len(counts) > HH_PRUNE_AT:
                counts = Counter(dict(counts.most_common(HH_CAND_PER_PART)))
        top = [t for t, _ in counts.most_common(HH_CAND_PER_PART)]
        yield pd.DataFrame({"tok": pd.Series(top, dtype="object")})

    cand = toks.mapInPandas(topm, "tok string").distinct()
    exact = (toks.join(F.broadcast(cand), "tok")
             .groupBy("tok")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_occurrences")))
    return exact.orderBy(F.desc("n_occurrences"), F.asc("tok")).limit(HH_TOPK)
