"""Training-data pipeline operators, batch 2: PII redaction,
deterministic stratified sampling, exact and sketch-tier distribution
statistics, skew-safe exact distinct, rare-bigram quality scoring,
strict event funnels, RAG document chunking, and exact-Jaccard
verification of LSH dedup candidates.

The reference has no expression/query surface at all (SURVEY.md §2.2 —
reader.py/writer.py are scan+encode only); these continue the
LLM-pipeline extension mandated by the north star, alongside
dedup.py / text.py / quality.py / similarity.py.

Determinism contract (registry.py rules): every aggregate is either an
integer/decimal exact sum, a MIN/MAX (order-independent on doubles), or
one final IEEE division of identical operands; every sampling decision
is an md5-derived bucket (doc_bucket) rather than RNG; regexes stay in
the Java∩RE2 common dialect so Spark and the DuckDB oracle agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register, spread, table
from .text import _SQL_DOC_BUCKET, doc_bucket


# --- q114: PII redaction -------------------------------------------------
#
# Patterns deliberately restricted to the syntax subset Java regex and
# RE2 (DuckDB) interpret identically: character classes, bounded
# repetition, \b word boundaries. No lookaround (RE2 lacks it).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# The synthetic corpus contains no literal PII, so each doc gets a
# deterministic doc_id-derived contact line appended before redaction —
# the operator is then verified on non-trivial match counts and on the
# md5 of the redacted text (order of redaction passes matters and is
# pinned: email → phone → ip).
_SQL_SEEDED = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com call '"
    " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
    " || '-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1'"
)


def _seeded(d: DataFrame) -> DataFrame:
    return d.withColumn(
        "seeded",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com call "),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".0.1"),
        ),
    )


@register(
    "q114_pii_redaction",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, {_SQL_SEEDED} AS seeded FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(seeded, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(seeded, '{PHONE_RE}')) AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(seeded, '{IP_RE}')) AS BIGINT) AS n_ips,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(seeded, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g'),
                 '{IP_RE}', '<IP>', 'g')) AS redacted_md5
    FROM s
    """,
)
def q114_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — the pre-training compliance pass that replaces
    emails/phones/IPv4s with typed placeholder tokens. Complements
    q66's generic digit/email scrub: this one uses word-boundary-
    anchored per-class patterns and emits per-class audit counts over
    the full corpus (q66 redacts two loose patterns on a subset).

    All three passes are JVM-side regexp_replace inside one projection
    (one codegen stage, no shuffle, no Python) — embarrassingly
    parallel at any scale. Counts are taken before redaction so the
    audit trail (how much PII per doc) survives the scrub.
    """
    d = spread(_seeded(table(spark, sf_dir, "documents")))
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("seeded"), EMAIL_RE, "<EMAIL>"),
            PHONE_RE, "<PHONE>"),
        IP_RE, "<IP>")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("seeded"), F.lit(EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(F.col("seeded"), F.lit(PHONE_RE)).cast("bigint").alias("n_phones"),
        F.regexp_count(F.col("seeded"), F.lit(IP_RE)).cast("bigint").alias("n_ips"),
        F.md5(red).alias("redacted_md5"),
    )


# --- q115: stratified sampling ------------------------------------------

# Per-language keep-rates (percent): downsample the dominant language,
# keep more of the tail — the standard corpus-rebalancing move.
_RATES = {"en": 40, "de": 80, "fr": 80, "es": 80, "zh": 80}
_DEFAULT_RATE = 60

_SQL_RATE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in _RATES.items())
    + f" ELSE {_DEFAULT_RATE} END"
)


@register(
    "q115_stratified_sample",
    oracle=f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM documents
    WHERE {_SQL_DOC_BUCKET} < {_SQL_RATE}
    GROUP BY lang
    """,
)
def q115_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum (language) sampling by md5 bucket —
    reproducible across engines, retries, and partitionings, unlike
    ``df.sample`` whose RNG is seed+partition dependent.

    Scale: the predicate is a pure projection filter — no shuffle, no
    state; the per-stratum rate table is a literal CASE (broadcast-free).
    Growing it to thousands of strata would turn it into a broadcast
    join against a rates dim table, same plan shape.
    """
    d = table(spark, sf_dir, "documents")
    rate = F.expr(_SQL_RATE)
    return (
        d.where(doc_bucket() < rate)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.sum("n_chars").cast("bigint").alias("sampled_chars"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
    )


# --- q117: exact discrete percentiles -----------------------------------


@register(
    "q117_percentile_exact",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_extendedprice,
             cume_dist() OVER (PARTITION BY l_returnflag
                               ORDER BY l_extendedprice) AS cd
      FROM lineitem
    )
    SELECT l_returnflag,
           MIN(CASE WHEN cd >= 0.5  THEN l_extendedprice END) AS p50,
           MIN(CASE WHEN cd >= 0.9  THEN l_extendedprice END) AS p90,
           MIN(CASE WHEN cd >= 0.99 THEN l_extendedprice END) AS p99,
           MAX(l_extendedprice) AS p100,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM c GROUP BY l_returnflag
    """,
)
def q117_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (type-1 quantiles) per group via
    cume_dist — every reported percentile is an actual data value, so
    no interpolation arithmetic can diverge between engines (continuous
    quantiles interpolate as lo+(hi-lo)*f vs (1-f)*lo+f*hi — same math,
    different IEEE rounding).

    Scale: one range-partitioned sort per group (the window), then a
    partial-aggregable MIN/MAX pass. This is the exact tier; at 100 TB
    the first pass you'd reach for is approx_percentile (KLL sketch,
    map-side mergeable) with this as the audited rerank on samples.
    """
    li = table(spark, sf_dir, "lineitem")
    cd = F.cume_dist().over(
        Window.partitionBy("l_returnflag").orderBy("l_extendedprice"))
    c = li.select("l_returnflag", "l_extendedprice").withColumn("cd", cd)

    def pick(p: float, name: str):
        return F.min(
            F.when(F.col("cd") >= p, F.col("l_extendedprice"))).alias(name)

    return c.groupBy("l_returnflag").agg(
        pick(0.5, "p50"), pick(0.9, "p90"), pick(0.99, "p99"),
        F.max("l_extendedprice").alias("p100"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )


# --- q118: skew-safe exact distinct -------------------------------------


@register(
    "q118_skew_exact_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q118_skew_exact_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) over a 5-value grouping key — the classic
    skew shape: a naive groupBy(event_type).agg(countDistinct) funnels
    every row of a hot key through one reducer.

    The plan here is the two-stage expansion: dedupe on the COMPOSITE
    key (event_type, user_id) first — the shuffle spreads over the full
    composite-key space, no hot partition — then count the survivors
    per event_type (tiny second shuffle). The plain metrics ride a
    separate partial-agged pass, stitched back via broadcast join on
    the 5-row group key. Same result as the oracle's COUNT(DISTINCT),
    but every stage is skew-free at any scale.
    """
    ev = table(spark, sf_dir, "events")
    users = (
        ev.select("event_type", "user_id").distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )
    plain = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
    )
    return plain.join(F.broadcast(users), "event_type")


# --- q119: rare-bigram quality score ------------------------------------


@register(
    "q119_rare_bigram_score",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
      FROM documents
    ), b AS (
      SELECT doc_id, toks[u.i] || ' ' || toks[u.i + 1] AS bg
      FROM t CROSS JOIN UNNEST(range(1, len(toks))) AS u(i)
    ), cnt AS (
      SELECT bg, COUNT(*) AS c FROM b GROUP BY bg
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(CASE WHEN cnt.c <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
           CAST(SUM(CASE WHEN cnt.c <= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS rare_frac
    FROM b JOIN cnt USING (bg)
    GROUP BY b.doc_id
    """,
)
def q119_rare_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-model-flavored quality score: the fraction of a doc's
    word bigrams that are corpus-rare (total count ≤ 2). Gibberish and
    OCR noise score high; fluent text scores low. The integer-count
    formulation (vs summed log-probabilities) is deliberate: exact
    under any aggregation order, where a float log-prob sum is not.

    Scale: two shuffles — corpus bigram counting (map-side combine
    collapses repeats before the exchange) and the count join back,
    keyed on the bigram string. Both sides of the join are partial-
    aggregated before exchanging; nothing touches the driver. The
    rare-threshold filter cannot be pushed into the count build (rarity
    is only known after the global count), which is why this is
    join-back rather than broadcast — at 100 TB the counts side is
    corpus-vocabulary sized, far beyond broadcast range.
    """
    d = spread(table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), "\\s+")
    n = F.size(toks)
    grams = F.when(
        n >= 2,
        F.transform(F.sequence(F.lit(1), n - 1),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, 2))),
    ).otherwise(F.array().cast("array<string>"))
    b = d.select("doc_id", F.explode(grams).alias("bg"))
    cnt = b.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    rare = F.sum(F.when(F.col("c") <= 2, 1).otherwise(0)).cast("bigint")
    return (
        b.join(cnt, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            rare.alias("n_rare"),
            (rare.cast("double") / F.count(F.lit(1))).alias("rare_frac"),
        )
    )


# --- q121: sequential event funnel --------------------------------------


@register(
    "q121_strict_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_clicked_after,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchased_after
    """,
)
def q121_strict_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRICT-sequence funnel: users who viewed, then clicked strictly
    AFTER their first view, then purchased strictly AFTER that first
    qualifying click. Differs from q92's first-touch funnel (min-per-
    type comparison): a user whose first click precedes their first
    view but who clicks again later PASSES here and fails q92 — the
    sequential semantics need the previous stage's timestamp before
    the next stage's MIN can be conditioned.

    Scale: despite the stage dependency, ONE shuffle — three chained
    whole-partition window MINs over the same user_id partitioning
    (no orderBy ⇒ no per-window sort), then a global conditional
    distinct count. The naive formulation (per-stage groupBy + join
    back) shuffles the events table three times; this shuffles once.
    """
    ev = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    typ = F.col("event_type")
    d = ev.withColumn(
        "v_ts", F.min(F.when(typ == "view", F.col("ts"))).over(w))
    d = d.withColumn(
        "c_ts",
        F.min(F.when((typ == "click") & (F.col("ts") > F.col("v_ts")),
                     F.col("ts"))).over(w))
    d = d.withColumn(
        "p_ts",
        F.min(F.when((typ == "purchase") & (F.col("ts") > F.col("c_ts")),
                     F.col("ts"))).over(w))
    return d.agg(
        F.count_distinct(F.when(F.col("v_ts").isNotNull(), F.col("user_id")))
        .cast("bigint").alias("n_viewed"),
        F.count_distinct(F.when(F.col("c_ts").isNotNull(), F.col("user_id")))
        .cast("bigint").alias("n_clicked_after"),
        F.count_distinct(F.when(F.col("p_ts").isNotNull(), F.col("user_id")))
        .cast("bigint").alias("n_purchased_after"),
    )


# --- q128: sketch-tier percentiles --------------------------------------

SKETCH_ACCURACY = 10000  # rank error <= n / accuracy


@register(
    "q128_percentile_sketch",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
           true AS p50_ok, true AS p90_ok, true AS p99_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q128_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The APPROX tier of q117: per-group percentiles from Spark's
    mergeable quantile sketch (approx_percentile, Greenwald-Khanna),
    emitted as a bounds audit with an EXACT oracle (round 5, replacing
    rows-only): per group, the exact row count plus one boolean per
    quantile certifying the sketch value (a) is an actual data value
    and (b) sits within the documented GK rank error (n/accuracy, +1
    discretization slack) of the target rank. The rank of the sketch
    value is computed in-query by a second conditional aggregate over
    the group, so the booleans are engine-checkable facts while the
    engine-specific sketch internals stay out of the hash (the q135
    pattern; the raw-value tier remains q117's exact twin).

    Scale: the sketch is map-side mergeable — one partial aggregate
    per task, merged on the reducer; no sort, no full-column
    materialization, state O(accuracy · log n) per group. The audit
    adds one broadcast of the 3-row sketch result and one more
    scan+aggregate — the price of a hashed guarantee.
    """
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice")
    pct = F.percentile_approx(
        "l_extendedprice", [0.5, 0.9, 0.99], SKETCH_ACCURACY)
    sk = (
        li.groupBy("l_returnflag")
        .agg(pct.alias("p"))
        .select("l_returnflag",
                F.col("p")[0].alias("p50"),
                F.col("p")[1].alias("p90"),
                F.col("p")[2].alias("p99"))
    )
    j = li.join(F.broadcast(sk), "l_returnflag")
    price = F.col("l_extendedprice")
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for q in (50, 90, 99):
        pq = F.col(f"p{q}")
        aggs += [
            F.sum(F.when(price < pq, 1).otherwise(0)).alias(f"lt{q}"),
            F.max(F.when(price == pq, 1).otherwise(0)).alias(f"eq{q}"),
        ]
    stats = j.groupBy("l_returnflag").agg(*aggs)

    def ok(q: int, frac: float):
        # first-occurrence rank of the sketch value vs target rank;
        # bound matches the GK guarantee the local tests proved
        target = F.least(F.col("n") - 1,
                         F.floor(F.lit(frac) * F.col("n"))).cast("bigint")
        err = F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(F.col("n") / F.lit(SKETCH_ACCURACY)).cast("bigint"))
        return ((F.col(f"eq{q}") == 1)
                & (F.abs(F.col(f"lt{q}") - target) <= err + 1))

    return stats.select(
        "l_returnflag", "n",
        ok(50, 0.5).alias("p50_ok"),
        ok(90, 0.9).alias("p90_ok"),
        ok(99, 0.99).alias("p99_ok"),
    )


# (a fixed-width token histogram already exists as q59_length_histogram;
# the graph-analytics counterpart of this batch, q120_graph_triangles,
# lives in dedup.py next to the candidate-edge helpers it shares.)


# --- q116: RAG document chunking ----------------------------------------

CHUNK_TOKENS = 20   # window size
CHUNK_STRIDE = 15   # => 5-token overlap between consecutive chunks


@register(
    "q116_doc_chunking",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(text, '\\s+') AS toks
      FROM documents
    ), c AS (
      SELECT doc_id, u.i AS chunk_start,
             list_slice(toks, u.i, least(u.i + {CHUNK_TOKENS} - 1,
                                         len(toks))) AS chunk
      FROM t CROSS JOIN UNNEST(range(1, len(toks) + 1, {CHUNK_STRIDE})) AS u(i)
    )
    SELECT doc_id,
           CAST((chunk_start - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_no,
           CAST(chunk_start AS BIGINT) AS chunk_start,
           CAST(len(chunk) AS BIGINT) AS chunk_len,
           md5(array_to_string(chunk, ' ')) AS chunk_md5
    FROM c
    """,
)
def q116_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking — the RAG/embedding
    preprocessing step that splits long docs into {CHUNK_TOKENS}-token
    windows every {CHUNK_STRIDE} tokens (trailing chunks may be
    short). The inverse of q71's packing: packing merges short docs to
    fill sequences, chunking splits long docs to fit them. Chunk
    content is pinned by md5 so the oracle verifies the actual token
    windows, not just counts.

    Scale: pure per-row array arithmetic (sequence + slice inside one
    codegen projection, then explode) — no shuffle at all; output size
    ~ n_tokens/stride rows per doc, streamed straight to the sink or
    the downstream embedding stage.
    """
    d = spread(table(spark, sf_dir, "documents"))
    toks = F.split(F.col("text"), "\\s+")
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(CHUNK_STRIDE))
    c = (
        d.select("doc_id", toks.alias("toks"), starts.alias("starts"))
        .select("doc_id", "toks", F.explode("starts").alias("chunk_start"))
        .select(
            "doc_id",
            ((F.col("chunk_start") - 1) / CHUNK_STRIDE).cast("bigint")
            .alias("chunk_no"),
            F.col("chunk_start").cast("bigint").alias("chunk_start"),
            F.slice(F.col("toks"), F.col("chunk_start"), F.lit(CHUNK_TOKENS))
            .alias("chunk"),
        )
    )
    return c.select(
        "doc_id", "chunk_no", "chunk_start",
        F.size("chunk").cast("bigint").alias("chunk_len"),
        F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_md5"),
    )


# --- q129: exact-Jaccard verification of LSH candidates ------------------

VERIFY_JACCARD = 0.5


@register(
    "q129_dedup_verified_pairs",
    oracle=None,  # set below — needs dedup's candidate SQL
)
def q129_dedup_verified_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VERIFY stage of MinHash dedup: every q52 LSH candidate pair
    is checked by exact Jaccard over its distinct word-bigram shingle
    sets, keeping pairs >= {VERIFY_JACCARD}. Candidate-then-verify is
    the canonical production shape — LSH bounds the comparison count,
    the exact pass removes the sketch's false positives before docs
    are dropped.

    Scale: the exact comparison runs ONLY on candidate pairs (LSH-
    bounded, ~linear in corpus size), never all pairs; the
    intersection is a join on (pair, shingle) with map-side distinct,
    set sizes are a shuffle-free size(array_distinct) projection
    (bigrams_of output is already distinct), and the candidate list
    reuses the session-checkpointed edge graph shared with
    q56/q108/q120 instead of recomputing the whole q52 signature
    pipeline. Jaccard = one IEEE division of exact integers (registry
    rules).
    """
    from .dedup import _candidate_edges, bigrams_of, normalized

    d = spread(table(spark, sf_dir, "documents"))
    sh = (
        d.select("doc_id", normalized(F.col("text")).alias("norm"))
        .select("doc_id", "norm", F.split("norm", " ").alias("toks"))
        .select("doc_id",
                F.explode(bigrams_of(F.col("toks"), F.col("norm"))).alias("s"))
    )
    sizes = (
        d.select("doc_id", normalized(F.col("text")).alias("norm"))
        .select("doc_id", F.split("norm", " ").alias("toks"), "norm")
        .select("doc_id",
                F.size(bigrams_of(F.col("toks"), F.col("norm"))).alias("sz"))
    )
    edges = _candidate_edges(spark, sf_dir)
    cand = edges.where(F.col("a") < F.col("b")).select(
        F.col("a").alias("d1"), F.col("b").alias("d2"))
    inter = (
        cand.join(sh.select(F.col("doc_id").alias("d1"), "s"), "d1")
        .join(sh.select(F.col("doc_id").alias("d2"), "s"), ["d2", "s"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    j = (
        inter
        .join(sizes.select(F.col("doc_id").alias("d1"),
                           F.col("sz").alias("sz1")), "d1")
        .join(sizes.select(F.col("doc_id").alias("d2"),
                           F.col("sz").alias("sz2")), "d2")
        .select(
            "d1", "d2",
            F.col("inter").cast("bigint").alias("n_common"),
            (F.col("inter").cast("double")
             / (F.col("sz1") + F.col("sz2") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= VERIFY_JACCARD)
    )
    return j


def _verified_pairs_sql() -> str:
    from .dedup import _MINHASH_SQL, SQL_WORD_BIGRAMS, SQL_NORM_TEXT

    shingles = SQL_WORD_BIGRAMS.format(t=SQL_NORM_TEXT)
    return f"""
    WITH cand AS (SELECT d1, d2 FROM ({_MINHASH_SQL}) mh),
    sh AS (
      SELECT DISTINCT doc_id, unnest({shingles}) AS s FROM documents),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.d1, c.d2, COUNT(*) AS inter
      FROM cand c
      JOIN sh a ON a.doc_id = c.d1
      JOIN sh b ON b.doc_id = c.d2 AND b.s = a.s
      GROUP BY c.d1, c.d2)
    SELECT i.d1, i.d2,
           CAST(i.inter AS BIGINT) AS n_common,
           CAST(i.inter AS DOUBLE) / (s1.sz + s2.sz - i.inter) AS jaccard
    FROM inter i
    JOIN sizes s1 ON s1.doc_id = i.d1
    JOIN sizes s2 ON s2.doc_id = i.d2
    WHERE CAST(i.inter AS DOUBLE) / (s1.sz + s2.sz - i.inter)
          >= {VERIFY_JACCARD}
    """


from ..registry import QUERIES as _Q  # noqa: E402

_Q["q129_dedup_verified_pairs"].oracle = _verified_pairs_sql()


# --- q132: deterministic negative sampling ------------------------------

N_NEGATIVES = 3

# The hash ring is split into 16^RING_BUCKET_CHARS independent
# sub-rings keyed by the md5 prefix — 2 hex chars = 256 buckets. Pick
# chars so bucket count ≳ cluster parallelism (3 chars = 4096 for a
# 1000-executor run); each bucket is a hash-random 1/256th of the
# corpus, so per-bucket rings are statistically identical to one
# global ring for random-negative purposes.
RING_BUCKET_CHARS = 2


@register(
    "q132_negative_sampling",
    # NB: the lead()s must be computed BEFORE the rank unpivot — a
    # lead over the cross-joined relation would walk the tripled
    # sequence
    oracle=f"""
    WITH ring AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    ), led AS (
      SELECT doc_id AS anchor_id,
             lead(doc_id, 1) OVER (PARTITION BY substr(hx, 1, {RING_BUCKET_CHARS})
                                   ORDER BY hx) AS n1,
             lead(doc_id, 2) OVER (PARTITION BY substr(hx, 1, {RING_BUCKET_CHARS})
                                   ORDER BY hx) AS n2,
             lead(doc_id, 3) OVER (PARTITION BY substr(hx, 1, {RING_BUCKET_CHARS})
                                   ORDER BY hx) AS n3
      FROM ring
    )
    SELECT anchor_id,
           CAST(u.k AS BIGINT) AS neg_rank,
           CASE u.k WHEN 1 THEN n1 WHEN 2 THEN n2 WHEN 3 THEN n3 END AS negative_id
    FROM led CROSS JOIN UNNEST(range(1, {N_NEGATIVES} + 1)) AS u(k)
    WHERE CASE u.k WHEN 1 THEN n1 WHEN 2 THEN n2 WHEN 3 THEN n3 END IS NOT NULL
    """,
)
def q132_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic random-negative assignment for contrastive
    training pairs: docs are placed on an md5 hash ring and each
    anchor takes its next {N_NEGATIVES} ring successors as negatives —
    uniformly random with respect to content (md5 order is
    content-independent) yet fully reproducible across engines,
    retries, and partitionings, unlike an RNG-based sampler.

    The ring is BUCKETED by md5 prefix (RING_BUCKET_CHARS hex chars →
    256 sub-rings): lead() runs under
    ``Window.partitionBy(bucket).orderBy(hx)``, so the sort is a
    per-bucket window, never a single-partition global window (lead()
    is not rank-like — WindowGroupLimit cannot rescue an unpartitioned
    plan, and Spark would otherwise move the whole corpus into ONE
    task). Anchors at each sub-ring's tail simply yield fewer pairs
    (no wraparound — the filter drops null successors, pinned by the
    oracle, which buckets identically). Because md5 is uniform, every
    bucket is an unbiased random sample of the corpus, so successors
    within a bucket are exactly as random as successors on the global
    ring — the bucketing changes WHICH random negatives are drawn, not
    their distribution.

    Scale: the q86 bucketing pattern (SCALING.md) — 256-way parallel
    window, one shuffle on the bucket key; raise RING_BUCKET_CHARS to
    3 (4096 buckets) for 1000-executor runs.
    """
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("hx"))
    d = d.withColumn("ring_bucket", F.substring("hx", 1, RING_BUCKET_CHARS))
    w = Window.partitionBy("ring_bucket").orderBy("hx")
    out = d.select(
        F.col("doc_id").alias("anchor_id"),
        *[F.lead("doc_id", k).over(w).alias(f"_n{k}")
          for k in range(1, N_NEGATIVES + 1)],
    )
    pairs = out.select(
        "anchor_id",
        F.posexplode(F.array(*[F.col(f"_n{k}")
                               for k in range(1, N_NEGATIVES + 1)]))
        .alias("pos", "negative_id"),
    )
    return (
        pairs.filter(F.col("negative_id").isNotNull())
        .select("anchor_id",
                (F.col("pos") + 1).cast("bigint").alias("neg_rank"),
                "negative_id")
    )


# --- q133: token-budget corpus selection --------------------------------

TOKEN_BUDGET = 20_000  # per-source token budget


@register(
    "q133_budget_selection",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
             n_chars AS score
      FROM documents
    ), ranked AS (
      SELECT doc_id, source, n_tokens, score,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY score DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM scored
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(n_tokens) AS BIGINT) AS tokens_selected,
           CAST(MIN(score) AS BIGINT) AS worst_score
    FROM ranked
    WHERE cum_before + n_tokens <= {TOKEN_BUDGET}
    GROUP BY source
    """,
)
def q133_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget-aware corpus selection: per source, take documents
    best-first (score = length here; any deterministic quality score
    slots in) while the running token total stays within the budget —
    the "give me the best N tokens per domain" step that sets corpus
    mixtures under a fixed training budget. A doc is kept iff it fits
    ENTIRELY (cum_before + its tokens <= budget), so the kept set is
    well-defined under the (score, doc_id) total order.

    Scale: one window per source partition (exclusive running sum) —
    the same N-way-parallel pack shape as q86; sources are the
    parallelism unit, and a skewed mega-source would bucket-split
    exactly like q86's N_PACK_BUCKETS.
    """
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source",
        F.size(F.split(F.col("text"), "\\s+")).alias("n_tokens"),
        F.col("n_chars").alias("score"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = d.withColumn(
        "cum_before", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
    return (
        ranked.filter(F.col("cum_before") + F.col("n_tokens") <= TOKEN_BUDGET)
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_selected"),
            F.sum("n_tokens").cast("bigint").alias("tokens_selected"),
            F.min("score").cast("bigint").alias("worst_score"),
        )
    )


# --- q210: sequence packing (concat-and-chunk) ---------------------------

PACK_CAPACITY = 128  # tokens per training sequence (context window)
PACK_BUCKETS = 32    # independent packing streams


@register(
    "q210_sequence_packing",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             doc_id % {PACK_BUCKETS} AS bucket,
             CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT)
               AS n_tok
      FROM documents),
    c AS (
      SELECT bucket, n_tok,
             SUM(n_tok) OVER (PARTITION BY bucket ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM d)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
           CAST(CEIL(CAST(SUM(n_tok) AS DOUBLE) / {PACK_CAPACITY})
                AS BIGINT) AS n_seqs,
           (CAST(SUM(n_tok) AS DOUBLE)
            / (CEIL(CAST(SUM(n_tok) AS DOUBLE) / {PACK_CAPACITY})
               * {PACK_CAPACITY}.0)) AS fill_frac,
           CAST(SUM(CASE WHEN (cum - n_tok) // {PACK_CAPACITY}
                              <> (cum - 1) // {PACK_CAPACITY}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
    FROM c GROUP BY bucket
    """,
)
def q210_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEQUENCE PACKING for pretraining, concat-and-chunk policy (the
    GPT recipe — q71 is the OTHER policy, greedy whole-doc first-fit
    where no document splits; the two answer different training
    setups and have opposite execution shapes, iterative
    applyInPandas there vs closed-form windows here): within each of
    {PACK_BUCKETS} independent packing streams (doc_id mod bucket —
    the distributed unit), documents are concatenated in doc_id order
    and chunked into fixed {PACK_CAPACITY}-token training sequences.
    Per stream: sequence count, fill fraction (concat-chunk wastes
    padding only in the last chunk, so fill approaches 1 — the reason
    pretraining uses it over first-fit), and how many documents
    straddle a chunk boundary (the attention-mask/document-separator
    cost of the recipe, the number q71's no-split policy drives to
    zero at the price of padding).

    Everything is closed-form from a per-bucket running token count —
    a document straddles a boundary iff its start and end-1 offsets
    land in different chunks — so the whole operator is two JVM window
    passes, no UDF, no recursion, and the oracle expresses the exact
    same prefix-sum relationally.

    Scale: one hash shuffle on the bucket key (32 streams here, tens
    of thousands in production — the stream count is the parallelism
    knob and packing quality is bucket-local, so no global order is
    ever needed); the window runs per bucket in one pass. At 100 TB
    this is scan + one exchange of (bucket, n_tok) pairs — the text
    itself never moves."""
    d = spread(table(spark, sf_dir, "documents")).select(
        "doc_id",
        (F.col("doc_id") % PACK_BUCKETS).alias("bucket"),
        F.size(F.split(F.col("text"), "\\s+")).cast("bigint")
        .alias("n_tok"))
    w = (Window.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    c = d.withColumn("cum", F.sum("n_tok").over(w))
    cap = F.lit(PACK_CAPACITY).cast("bigint")
    straddles = (((F.col("cum") - F.col("n_tok")) / cap).cast("bigint")
                 != ((F.col("cum") - 1) / cap).cast("bigint"))
    n_seqs = F.ceil(F.sum("n_tok").cast("double") / cap)
    return c.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("total_tokens"),
        n_seqs.cast("bigint").alias("n_seqs"),
        (F.sum("n_tok").cast("double")
         / (n_seqs * cap).cast("double")).alias("fill_frac"),
        F.sum(F.when(straddles, 1).otherwise(0)).cast("bigint")
        .alias("n_split_docs"))
