"""Extended relational surface: exact percentiles, pivot, correlated
subqueries (EXISTS / IN / scalar), higher-order array functions,
unpivot (melt), and regex text functions.

Like everything in operators/, the reference
(satyakalla890/columnar-format) has no query surface (SURVEY.md §2.2);
these queries widen the engine's native Spark coverage with the DuckDB
oracle as the correctness gate. Determinism rules: registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register, table
from .relational import cents, dsum, sql_cents, sql_dsum

# ---------------------------------------------------------------------------
# Exact percentiles / quantiles


@register(
    "q08_exact_quartiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(l_quantity AS BIGINT), 0.00) AS q0,
           quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS q25,
           quantile_cont(CAST(l_quantity AS BIGINT), 0.50) AS q50,
           quantile_cont(CAST(l_quantity AS BIGINT), 0.75) AS q75,
           quantile_cont(CAST(l_quantity AS BIGINT), 1.00) AS q100
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q08_exact_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated quartiles of l_quantity per flag.

    Determinism: l_quantity is integer-valued; at quarter fractions
    the interpolation a + (b-a)·k/4 is exact in IEEE double for any
    algebraically equivalent formula, so Spark's percentile and
    DuckDB's quantile_cont agree bit-for-bit.

    Scale: exact percentile needs the full sorted multiset per group —
    Spark aggregates a count-map per group (map-side partial), fine for
    bounded value domains like quantities; for unbounded domains the
    scale path is approx_percentile (t-digest sketch, mergeable).
    """
    li = table(spark, sf_dir, "lineitem").withColumn(
        "qty_i", F.col("l_quantity").cast("bigint"))
    pct = F.percentile(F.col("qty_i"),
                       F.lit([0.0, 0.25, 0.5, 0.75, 1.0])).alias("p")
    return (
        li.groupBy("l_returnflag").agg(pct)
        .select(
            "l_returnflag",
            F.col("p")[0].alias("q0"), F.col("p")[1].alias("q25"),
            F.col("p")[2].alias("q50"), F.col("p")[3].alias("q75"),
            F.col("p")[4].alias("q100"),
        )
    )


# ---------------------------------------------------------------------------
# Pivot / unpivot

PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIO_ALIAS = ["urgent", "high", "medium", "not_specified", "low"]


@register(
    "q09_pivot_status_priority",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS urgent,
           COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS high,
           COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS medium,
           COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS not_specified,
           COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS low,
           COUNT(*) AS total
    FROM orders GROUP BY o_orderstatus
    """,
)
def q09_pivot_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts, status rows × priority columns.

    The explicit pivot-value list matters at scale: without it Spark
    runs an extra distinct-collect job over the pivot column to
    discover values (a full pass over the fact table).
    """
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", PRIORITIES)
        .agg(F.count(F.lit(1)))
    )
    renamed = piv.select(
        "o_orderstatus",
        *[F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(a)
          for v, a in zip(PRIORITIES, _PRIO_ALIAS)],
    )
    total = sum(F.col(a) for a in _PRIO_ALIAS)
    return renamed.withColumn("total", total)


@register(
    "q39_unpivot_metrics",
    oracle=f"""
    WITH long AS (
      SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
      UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
    SELECT metric, COUNT(*) AS n_rows, {sql_dsum('val')} AS sum_val,
           MIN(val) AS min_val, MAX(val) AS max_val
    FROM long GROUP BY metric
    """,
)
def q39_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) four measure columns into (metric, val) rows,
    then profile each metric — the wide→long reshape operator.

    Scale: unpivot is a flatMap (no shuffle); the single groupBy on the
    4-value metric key aggregates map-side first.
    """
    li = table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[], values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="metric", valueColumnName="val",
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("val")).alias("sum_val"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


# ---------------------------------------------------------------------------
# Subqueries

_SUBQ_SQL = """
    SELECT 'exists_ship_after' AS variant, o_orderpriority,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'in_high_quantity', o_orderpriority, COUNT(*)
    FROM orders
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
    GROUP BY o_orderpriority
    UNION ALL
    SELECT 'key_below_max_li', o_orderpriority, COUNT(*)
    FROM orders
    WHERE o_orderkey <= (SELECT MAX(l_orderkey) FROM lineitem)
    GROUP BY o_orderpriority
"""


@register("q19_subqueries", oracle=_SUBQ_SQL)
def q19_subqueries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H-Q4-shaped), uncorrelated IN, and a
    scalar subquery — one variant column per subquery form, identical
    SQL text on both engines.

    Scale: Catalyst rewrites EXISTS/IN to left-semi joins (shuffle or
    broadcast by size) and the scalar subquery to a one-row broadcast
    — no per-row re-execution anywhere.
    """
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_SUBQ_SQL)


# ---------------------------------------------------------------------------
# Higher-order array functions (over int64-quantized embeddings: exact)


@register(
    "q38_higher_order_arrays",
    oracle="""
    WITH qv AS (
      SELECT vec_id,
             list_transform(embedding, x ->
               CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(8,6)) * 1000000 AS BIGINT)) AS q
      FROM embeddings WHERE vec_id < 1000)
    SELECT vec_id,
           len(list_filter(q, x -> x > 0)) AS n_pos,
           CAST(list_sum(q) AS BIGINT) AS sum_q,
           CAST(list_max(q) AS BIGINT) AS max_q,
           CAST(list_min(q) AS BIGINT) AS min_q,
           (len(list_filter(q, x -> abs(x) > 2000000)) > 0) AS any_big,
           array_to_string(list_slice(list_reverse_sort(q), 1, 3), ',') AS top3
    FROM qv
    """,
)
def q38_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function sampler — transform / filter /
    exists / aggregate / sort+slice — over int64-quantized embeddings
    so every result is exact integer math (engine-identical).

    Scale: all lambdas evaluate per-row inside the scan stage — no
    shuffle, no UDF; the quantized array column prunes to a single
    parquet field read.
    """
    from ..functions.similarity import qvec

    e = (
        table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 1000)
        .select("vec_id", qvec(F.col("embedding")).alias("q"))
    )
    return e.select(
        "vec_id",
        F.size(F.filter("q", lambda x: x > 0)).alias("n_pos"),
        F.aggregate("q", F.lit(0).cast("bigint"), lambda a, x: a + x).alias("sum_q"),
        F.array_max("q").alias("max_q"),
        F.array_min("q").alias("min_q"),
        F.exists("q", lambda x: F.abs(x) > 2000000).alias("any_big"),
        # serialized to a string: the driver's canonicalizer sorts rows
        # with pandas, which cannot sort list-typed cells
        F.array_join(
            F.transform(F.slice(F.sort_array("q", asc=False), 1, 3),
                        lambda x: x.cast("string")),
            ",",
        ).alias("top3"),
    )


# ---------------------------------------------------------------------------
# Regex text functions


@register(
    "q45_regex_text",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+')) AS n_words,
           regexp_extract(text, '(s[a-z]+)', 1) AS first_s_word,
           regexp_matches(text, 'spark') AS has_spark,
           length(regexp_replace(text, '[aeiou]', '', 'g')) AS novowel_len
    FROM documents WHERE doc_id % 10 = 0
    """,
)
def q45_regex_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar functions over documents: extract-all count, first
    capture-group match, boolean match, global replace. Patterns stick
    to character classes + literals, where Java and RE2 semantics
    coincide.

    Scale: pure per-row JVM built-ins inside codegen — no shuffle.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).alias("n_words"),
        F.regexp_extract("text", "(s[a-z]+)", 1).alias("first_s_word"),
        F.col("text").rlike("spark").alias("has_spark"),
        F.length(F.regexp_replace("text", "[aeiou]", "")).alias("novowel_len"),
    )


# ---------------------------------------------------------------------------
# Schema-enforced JSON parsing (from_json, vs q31's path extraction)


@register(
    "q46_from_json_typed",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 5 AS k_mod,
           COUNT(*) AS n_events,
           CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
           CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
           COUNT(*) FILTER (WHERE json_extract(props, '$.missing') IS NULL) AS n_no_extra
    FROM events GROUP BY 1
    """,
)
def q46_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-enforced JSON parsing: from_json with an explicit struct
    schema (typed columns, absent keys → NULL) — the production path
    for semi-structured columns, vs q31's per-path string extraction.

    Scale: from_json parses each document ONCE per row for all fields;
    N get_json_object calls parse N times. Inside codegen either way,
    but single-parse wins when the struct is wide.
    """
    e = table(spark, sf_dir, "events")
    parsed = e.select(
        F.from_json("props", "k bigint, missing string").alias("p"))
    return parsed.groupBy((F.col("p.k") % 5).alias("k_mod")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("p.k").alias("min_k"),
        F.max("p.k").alias("max_k"),
        F.count(F.when(F.col("p.missing").isNull(), 1)).alias("n_no_extra"),
    )


# ---------------------------------------------------------------------------
# Datetime function family


@register(
    "q47_datetime_sampler",
    oracle="""
    SELECT o_orderkey,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
           CAST(dayofweek(o_orderdate) AS INTEGER) AS dow,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d %H:%M:%S') AS due_ts,
           CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start
    FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def q47_datetime_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function family: truncation, month boundaries, calendar
    fields, interval arithmetic, date difference. DuckDB's dayofweek is
    0-based Sunday; Spark's dayofweek is 1-based Sunday — bridged with
    an explicit -1 so both report the same convention.

    Scale: per-row codegen built-ins, no shuffle.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return o.select(
        "o_orderkey",
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.last_day("o_orderdate"), "yyyy-MM-dd").alias("month_end"),
        (F.dayofweek("o_orderdate") - 1).alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
                      "yyyy-MM-dd HH:mm:ss").alias("due_ts"),
        F.datediff(F.col("o_orderdate").cast("date"),
                   F.lit("1992-01-01").cast("date")).cast("bigint")
        .alias("days_since_epoch_start"),
    )


# ---------------------------------------------------------------------------
# Map functions


@register(
    "q48_map_functions",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_linestatus)
    SELECT l_returnflag,
           CAST(cardinality(map_from_entries(list((l_linestatus, n)))) AS INTEGER) AS n_statuses,
           array_to_string(list_sort(map_keys(map_from_entries(list((l_linestatus, n))))), ',') AS statuses,
           CAST(list_sum(map_values(map_from_entries(list((l_linestatus, n))))) AS BIGINT) AS total
    FROM m GROUP BY l_returnflag
    """,
)
def q48_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map column family: build a status→count map per flag
    (map_from_entries over collected pairs), then interrogate it with
    map_keys / map_values / size. Maps have no defined entry order, so
    every output is order-canonicalized (sorted keys, summed values).

    Scale: the map is per-group metadata (≤ a few entries), built after
    the aggregation — never a per-row map of unbounded size.
    """
    li = table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))
    mp = F.map_from_entries(F.collect_list(F.struct("l_linestatus", "n")))
    return (
        m.groupBy("l_returnflag")
        .agg(mp.alias("mp"))
        .select(
            "l_returnflag",
            F.size("mp").alias("n_statuses"),
            # string-serialized for the driver's pandas row-sort (no lists)
            F.array_join(F.sort_array(F.map_keys("mp")), ",").alias("statuses"),
            F.aggregate(F.map_values("mp"), F.lit(0).cast("bigint"),
                        lambda a, x: a + x).alias("total"),
        )
    )


# ---------------------------------------------------------------------------
# Null semantics


@register(
    "q49_null_semantics",
    oracle="""
    WITH src AS (
      SELECT event_id,
             CASE WHEN event_id % 3 = 0 THEN NULL ELSE value END AS v,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE user_id END AS u
      FROM events WHERE event_id % 10 = 0)
    SELECT event_id,
           COALESCE(v, -1.0) AS v_filled,
           NULLIF(u, 42) AS u_not42,
           (v IS NOT DISTINCT FROM NULL) AS v_is_null,
           (u IS NOT DISTINCT FROM u) AS selfsame,
           CASE WHEN v IS NULL AND u IS NULL THEN 'both'
                WHEN v IS NULL THEN 'v_only'
                WHEN u IS NULL THEN 'u_only' ELSE 'neither' END AS null_shape
    FROM src
    """,
)
def q49_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling family: coalesce, nullif, null-safe equality
    (Spark <=> / SQL IS NOT DISTINCT FROM), and CASE-based null
    classification over synthesized null patterns.

    Scale: per-row built-ins; null bitmaps ride the columnar batches.
    """
    e = table(spark, sf_dir, "events").filter(F.col("event_id") % 10 == 0)
    src = e.select(
        "event_id",
        F.when(F.col("event_id") % 3 == 0, None).otherwise(F.col("value")).alias("v"),
        F.when(F.col("event_id") % 5 == 0, None).otherwise(F.col("user_id")).alias("u"),
    )
    return src.select(
        "event_id",
        F.coalesce("v", F.lit(-1.0)).alias("v_filled"),
        F.nullif("u", F.lit(42)).alias("u_not42"),
        F.col("v").eqNullSafe(F.lit(None).cast("double")).alias("v_is_null"),
        F.col("u").eqNullSafe(F.col("u")).alias("selfsame"),
        F.when(F.col("v").isNull() & F.col("u").isNull(), "both")
        .when(F.col("v").isNull(), "v_only")
        .when(F.col("u").isNull(), "u_only")
        .otherwise("neither").alias("null_shape"),
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: crossmodal join, schema evolution, redaction


@register(
    "q64_crossmodal_join",
    oracle="""
    WITH txt AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    vec AS (
      SELECT vec_id, label,
             sqrt(CAST(list_sum(list_transform(range(1, 65), i ->
               CAST(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(8,6)) * 1000000 AS BIGINT)
               * CAST(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(8,6)) * 1000000 AS BIGINT)))
               AS DOUBLE) / 1e12) AS nrm
      FROM embeddings)
    SELECT lang, label, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(nrm) AS min_norm, MAX(nrm) AS max_norm
    FROM txt JOIN vec ON doc_id = vec_id
    GROUP BY lang, label
    """,
)
def q64_crossmodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crossmodal join: text stats ⋈ embedding norms on the shared id —
    the shape of any doc↔vector pairing (retrieval training, filtering
    docs by embedding properties, joining captions to image vectors).

    Scale: both sides shuffle on the id (or co-bucket by it when the
    corpus is written bucketed); the per-side feature computation is
    map-only BEFORE the join so the shuffle carries scalars, not text
    or vectors.
    """
    from ..functions.similarity import int_norm, qvec

    d = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens"))
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", int_norm(qvec(F.col("embedding"))).alias("nrm"))
    return (
        d.join(e, d.doc_id == e.vec_id)
        .groupBy("lang", "label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.min("nrm").alias("min_norm"),
            F.max("nrm").alias("max_norm"),
        )
    )


@register(
    "q65_union_schema_evolution",
    oracle="""
    SELECT doc_id, source, n_chars, lang
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, source, NULL AS n_chars, lang
    FROM documents WHERE doc_id % 2 = 1
    """,
)
def q65_union_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two corpus snapshots with different
    column sets combined via unionByName(allowMissingColumns=True) —
    the absent column padded with NULL, matched BY NAME not position
    (positional unionAll would silently misalign evolved schemas).

    Scale: union is plan-level (no shuffle, no data movement); each
    side keeps its own scan + pushdown.
    """
    d = table(spark, sf_dir, "documents")
    old_snapshot = d.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "source", "n_chars", "lang")
    new_snapshot = d.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "source")  # n_chars dropped, order shuffled
    return old_snapshot.unionByName(new_snapshot, allowMissingColumns=True)


@register(
    "q66_redaction",
    oracle="""
    SELECT doc_id,
           regexp_replace(regexp_replace(text, '[0-9]+', '<num>', 'g'),
                          '[a-z0-9.]+@[a-z0-9.]+', '<email>', 'g') AS redacted,
           (length(text) <> length(regexp_replace(text, '[0-9]+', '', 'g'))) AS had_digits,
           len(regexp_extract_all(text, '[0-9]+')) AS n_digit_runs
    FROM documents WHERE doc_id % 5 = 0
    """,
)
def q66_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern redaction: digit runs and email-shaped spans replaced by
    placeholder tokens, with per-doc flags — the scrubbing pass every
    training corpus goes through before tokenization.

    Scale: per-row regex inside codegen, map-only; at 100 TB this is
    scan-bound, which is exactly the ceiling you want for a scrub.
    """
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    digits_gone = F.regexp_replace("text", "[0-9]+", "<num>")
    return d.select(
        "doc_id",
        F.regexp_replace(digits_gone, "[a-z0-9.]+@[a-z0-9.]+", "<email>")
        .alias("redacted"),
        (F.length("text")
         != F.length(F.regexp_replace("text", "[0-9]+", ""))).alias("had_digits"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias("n_digit_runs"),
    )


# ---------------------------------------------------------------------------
# TPC-H-Q14-shaped ratio aggregate


@register(
    "q72_promo_revenue",
    oracle="""
    WITH j AS (
      SELECT p_type,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               * (100 - CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)) AS rev_i
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00')
    SELECT (100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_i ELSE 0 END) AS DOUBLE)
            / CAST(SUM(rev_i) AS DOUBLE)) AS promo_pct,
           (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_i ELSE 0 END) AS DOUBLE) / 10000.0)
             AS promo_revenue,
           (CAST(SUM(rev_i) AS DOUBLE) / 10000.0) AS total_revenue,
           COUNT(*) AS n_items
    FROM j
    """,
)
def q72_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-shaped promotion-revenue ratio: one month of lineitem
    joined to part, promo share of revenue as a percentage. The ratio
    divides two exact int64 sums — a single IEEE division, identical in
    both engines.

    Scale: part is broadcast after pruning to (partkey, type); the
    month filter pushes into the lineitem scan, so the join touches
    ~1/84th of the fact table.
    """
    from .relational import cents

    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp")))
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_i = cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))
    promo_i = F.sum(F.when(F.col("p_type") == "PROMO", rev_i).otherwise(F.lit(0)))
    total_i = F.sum(rev_i)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * promo_i.cast("double") / total_i.cast("double"))
            .alias("promo_pct"),
            (promo_i.cast("double") / F.lit(1.0e4)).alias("promo_revenue"),
            (total_i.cast("double") / F.lit(1.0e4)).alias("total_revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q89_grouped_collect",
    oracle="""
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           array_to_string(list_slice(list_sort(list(o_orderkey)), 1, 5), ',') AS first5_keys,
           array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS priorities
    FROM orders
    WHERE o_custkey < 500
    GROUP BY o_custkey
    """,
)
def q89_grouped_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type aggregation: per customer, the sorted first-5 order
    keys and the sorted set of distinct priorities — collect_list/
    collect_set into array columns, which no other query family
    exercises on the output side. Sorting the collected arrays is what
    makes the result engine-comparable: bare collect order is
    partition-dependent.

    Scale: a hash aggregate whose state is the collected arrays —
    bounded here by the per-customer order count; for unbounded groups
    the right tool is a window top-k (q20) instead of collect+slice.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 500)
    return o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        # string-serialized: the driver's pandas-based row canonicalizer
        # cannot sort list-typed cells, so arrays leave as CSV strings
        F.array_join(
            F.transform(F.slice(F.array_sort(F.collect_list("o_orderkey")), 1, 5),
                        lambda x: x.cast("string")),
            ",",
        ).alias("first5_keys"),
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias("priorities"),
    )


@register(
    "q92_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS view_ts,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS click_ts,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS purchase_ts
      FROM events GROUP BY user_id
    ), staged AS (
      SELECT user_id, view_ts, click_ts, purchase_ts,
             (view_ts IS NOT NULL AND click_ts >= view_ts) AS s2,
             (view_ts IS NOT NULL AND click_ts >= view_ts
              AND purchase_ts >= click_ts) AS s3,
             epoch_us(click_ts) - epoch_us(view_ts) AS v2c_us
      FROM per_user
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN view_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
           CAST(SUM(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel,
           (CAST(SUM(CASE WHEN s2 THEN v2c_us ELSE 0 END) AS DOUBLE)
             / SUM(CASE WHEN s2 THEN 1 ELSE 0 END) / 1000000.0) AS avg_view_to_click_s
    FROM staged
    """,
)
def q92_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event funnel view→click→purchase by first occurrence per user:
    a user advances a stage when their earliest click is not before
    their earliest view, and their earliest purchase not before that
    click (the standard first-touch funnel; NULL comparisons fail the
    stage, matching both engines' three-valued logic). The mean
    view→click delay sums exact int64 microseconds and divides once.

    Scale: ONE shuffle on user_id into a partial-then-final hash
    aggregate; the funnel logic is a map over the per-user row. No
    self-joins per stage — at 100 TB the three-join formulation would
    shuffle the events table three times instead of once.
    """
    ev = table(spark, sf_dir, "events")
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        first("view").alias("view_ts"),
        first("click").alias("click_ts"),
        first("purchase").alias("purchase_ts"),
    )
    s2 = F.col("view_ts").isNotNull() & (F.col("click_ts") >= F.col("view_ts"))
    s3 = s2 & (F.col("purchase_ts") >= F.col("click_ts"))
    # cast handles both TIMESTAMP and TIMESTAMP_NTZ inputs (parquet
    # writers differ); session tz is UTC so the instant is unchanged
    v2c = (F.unix_micros(F.col("click_ts").cast("timestamp"))
           - F.unix_micros(F.col("view_ts").cast("timestamp")))
    staged = per_user.select(
        "view_ts",
        s2.alias("s2"), s3.alias("s3"), v2c.alias("v2c_us"))
    one = lambda c: F.sum(F.when(c, 1).otherwise(0)).cast("bigint")  # noqa: E731
    return staged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        one(F.col("view_ts").isNotNull()).alias("n_view"),
        one(F.col("s2")).alias("n_view_click"),
        one(F.col("s3")).alias("n_full_funnel"),
        (F.sum(F.when(F.col("s2"), F.col("v2c_us")).otherwise(0)).cast("double")
         / one(F.col("s2")) / F.lit(1000000.0)).alias("avg_view_to_click_s"),
    )


@register(
    "q93_retention",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS d0
      FROM events GROUP BY user_id
    ), a AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
      FROM events
    )
    SELECT strftime(u.d0, '%Y-%m-%d') AS cohort,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS cohort_size,
           CAST(COUNT(DISTINCT CASE WHEN a.d = u.d0 + INTERVAL 1 DAY
                                    THEN a.user_id END) AS BIGINT) AS d1_retained,
           CAST(COUNT(DISTINCT CASE WHEN a.d = u.d0 + INTERVAL 7 DAY
                                    THEN a.user_id END) AS BIGINT) AS d7_retained
    FROM u JOIN a ON u.user_id = a.user_id
    GROUP BY u.d0
    """,
)
def q93_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users cohorted by first-activity day; D1/D7
    retention = distinct users from the cohort active exactly 1 / 7
    days later. The companion to q92 for event analytics — cohort
    assignment is an aggregation property (MIN), retention a
    self-comparison of the activity set against it.

    Scale: both sides reduce BEFORE the join — u is one row per user,
    a is one row per (user, active-day) — so the join shuffles
    user-day granularity, never raw events; both shuffles key on
    user_id and Spark reuses the exchange.
    """
    ev = table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    u = ev.groupBy("user_id").agg(F.min(day.alias("x")).cast("date").alias("d0"))
    a = ev.select("user_id", day.alias("d")).distinct()
    j = u.join(a, "user_id")
    ret = lambda n: F.countDistinct(  # noqa: E731
        F.when(F.col("d") == F.date_add(F.col("d0"), n), F.col("user_id"))
    ).cast("bigint")
    return (
        j.groupBy("d0")
        .agg(
            F.countDistinct("user_id").cast("bigint").alias("cohort_size"),
            ret(1).alias("d1_retained"),
            ret(7).alias("d7_retained"),
        )
        .select(F.date_format("d0", "yyyy-MM-dd").alias("cohort"),
                "cohort_size", "d1_retained", "d7_retained")
    )


@register(
    "q94_variance_outliers",
    oracle=f"""
    WITH c AS (
      SELECT event_type, {sql_cents('value')} AS c FROM events
    ), s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(c) AS sum_c, SUM(c*c) AS sumsq
      FROM c GROUP BY event_type
    ), j AS (
      SELECT c.event_type, c.c, s.n,
             CAST(s.sum_c AS DOUBLE) / s.n AS mean_c,
             CAST(s.n * s.sumsq - s.sum_c * s.sum_c AS DOUBLE)
               / (s.n * s.n) AS var_c2
      FROM c JOIN s USING (event_type)
    )
    SELECT event_type,
           MIN(n) AS n_events,
           MIN(mean_c) / 100.0 AS mean_value,
           MIN(var_c2) / 10000.0 AS var_value,
           sqrt(MIN(var_c2)) / 100.0 AS stddev_value,
           CAST(SUM(CASE WHEN abs(c - mean_c) > 3 * sqrt(var_c2)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers_3s
    FROM j GROUP BY event_type
    """,
)
def q94_variance_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact population variance / stddev per event type plus 3-sigma
    outlier counts — the statistical-aggregate family (built-in
    var_pop/stddev accumulate doubles order-dependently, so this
    computes variance from exact integer sums instead: var =
    (n·Σx² − (Σx)²) / n², one IEEE division of exact operands, and
    IEEE sqrt is correctly rounded, so both engines agree to the bit).

    Scale: one groupBy for the sums (Σx in int64 cents, Σx² in
    Decimal128 — x²≈1e10/row means int64 would overflow past ~1e9
    rows/group), then stats broadcast back (5 rows) for the outlier
    map-pass. n·n stays in int64: revisit past ~3e9 rows per group.
    """
    ev = table(spark, sf_dir, "events")
    c = cents("value")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(c).alias("sum_c"),
        F.sum((c * c).cast("decimal(38,0)")).alias("sumsq"),
    )
    mean_c = F.col("sum_c").cast("double") / F.col("n")
    var_c2 = (
        (F.col("n").cast("decimal(38,0)") * F.col("sumsq")
         - F.col("sum_c").cast("decimal(38,0)") * F.col("sum_c")).cast("double")
        / (F.col("n") * F.col("n"))
    )
    j = (
        ev.select("event_type", c.alias("c"))
        .join(F.broadcast(stats), "event_type")
        .select("event_type", "c", "n",
                mean_c.alias("mean_c"), var_c2.alias("var_c2"))
    )
    return j.groupBy("event_type").agg(
        F.min("n").alias("n_events"),
        (F.min("mean_c") / F.lit(100.0)).alias("mean_value"),
        (F.min("var_c2") / F.lit(10000.0)).alias("var_value"),
        (F.sqrt(F.min("var_c2")) / F.lit(100.0)).alias("stddev_value"),
        F.sum(
            F.when(F.abs(F.col("c") - F.col("mean_c"))
                   > F.lit(3) * F.sqrt(F.col("var_c2")), 1).otherwise(0)
        ).cast("bigint").alias("n_outliers_3s"),
    )
