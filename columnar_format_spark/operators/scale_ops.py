"""Cluster-scale layout techniques as registered, oracle-checked
queries: bucketed co-located joins (shuffle elimination for the
recurring fact-fact join), z-order clustering (multi-column zone-map
pruning), and time-sorted layouts (disjoint zone maps on the sort
key). None exists in the reference (single-file format, no dataset
layout concept — SURVEY.md §1.1); all are standard techniques a
100 TB deployment of this engine would lean on, so each is pinned
here with an in-query plan/pruning assertion plus an exact DuckDB
oracle on the data values.
"""

from __future__ import annotations

import contextlib
import io
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register, table

BUCKETS = 8


def _plan_str(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _safe_tag(sf_dir: str) -> str:
    import hashlib

    return hashlib.md5(sf_dir.encode()).hexdigest()[:8]


@register(
    "q156_bucketed_join",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           (CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS DOUBLE) / 100.0) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderstatus
    """,
)
def q156_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-fact join via bucketing: orders and lineitem are
    written ONCE as bucketed tables (same key, same bucket count, both
    hash-partitioned by Spark's Murmur3), after which every join
    between them is exchange-free — the scan's bucket layout satisfies
    the join's distribution requirement. The query asserts the plan
    property it exists for (SortMergeJoin with ZERO Exchange below the
    join) before returning the aggregate, which the oracle checks
    value-exactly against the plain parquet join.

    Scale: this is THE technique for a 100 TB fact-fact join that
    recurs (orders x lineitem on every report): pay the layout shuffle
    once at ingest, then every subsequent join reads co-located
    buckets — no repeated shuffle of the big tables, no skew
    re-planning, and bucket-pruning on point predicates for free.
    The write side keeps one file per bucket by pre-partitioning on
    the bucket key with the same hash family the bucketing uses.
    """
    tag = _safe_tag(sf_dir)
    t_orders, t_lineitem = f"orders_bkt_{tag}", f"lineitem_bkt_{tag}"

    if not spark.catalog.tableExists(t_orders):
        d = tempfile.mkdtemp(prefix="bucketed_")
        o = table(spark, sf_dir, "orders").select("o_orderkey",
                                                  "o_orderstatus")
        li = table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                     "l_extendedprice")
        # repartition by the bucket key with BUCKETS tasks: Spark's
        # bucketing uses the same Murmur3 hash, so each task holds
        # exactly one bucket's rows -> one file per bucket (without
        # this, every write task emits a sliver of every bucket)
        (o.repartition(BUCKETS, "o_orderkey").write
         .bucketBy(BUCKETS, "o_orderkey").sortBy("o_orderkey")
         .option("path", f"{d}/orders").mode("overwrite")
         .saveAsTable(t_orders))
        (li.repartition(BUCKETS, "l_orderkey").write
         .bucketBy(BUCKETS, "l_orderkey").sortBy("l_orderkey")
         .option("path", f"{d}/lineitem").mode("overwrite")
         .saveAsTable(t_lineitem))

    o = spark.table(t_orders)
    li = spark.table(t_lineitem)
    # hint("merge") pins SortMergeJoin: letting the small side
    # broadcast here would "win" the no-shuffle assertion without
    # exercising the bucket co-location that matters at 100 TB
    j = li.join(o.hint("merge"),
                li.l_orderkey == o.o_orderkey, "inner")
    plan = _plan_str(j)
    if "SortMergeJoin" not in plan:
        raise AssertionError("bucketed join did not plan as SortMergeJoin")
    if "Exchange" in plan:
        raise AssertionError(
            "bucketed co-located join still shuffles:\n" + plan)
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * 100)
         .cast("bigint").cast("double") / F.lit(100.0)).alias("revenue"),
    )


Z_FILES = 16


def _interleave_bits(a: str, b: str) -> F.Column:
    """Morton/z-value of two non-negative ints: interleave the low 16
    bits of each (a in the even positions, b in the odd) with built-in
    expressions only — no UDF in the layout path. 16 bits cover the
    testdata key ranges; for arbitrary/skewed ranges, rank-normalize
    each dimension into the fixed-width domain first (q169_zorder_rank,
    _rank_cuts/_rank_bucket — the Delta OPTIMIZE ZORDER approach)."""
    terms = []
    for i in range(16):
        terms.append(
            f"shiftleft(CAST(shiftright({a}, {i}) & 1 AS BIGINT), {2 * i})")
        terms.append(
            f"shiftleft(CAST(shiftright({b}, {i}) & 1 AS BIGINT), {2 * i + 1})")
    return F.expr(" + ".join(terms))


@register(
    "q157_zorder_pruning",
    oracle="""
    WITH bounds AS (
      SELECT (MAX(l_partkey) * 3) // 10 AS lo_p,
             (MAX(l_partkey) * 4) // 10 AS hi_p,
             (MAX(l_suppkey) * 3) // 10 AS lo_s,
             (MAX(l_suppkey) * 4) // 10 AS hi_s
      FROM lineitem)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           (CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS DOUBLE) / 100.0) AS sum_price,
           CAST(MIN(l_partkey) AS BIGINT) AS min_p,
           CAST(MAX(l_partkey) AS BIGINT) AS max_p
    FROM lineitem, bounds
    WHERE l_partkey BETWEEN lo_p AND hi_p
      AND l_suppkey BETWEEN lo_s AND hi_s
    """,
)
def q157_zorder_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering for multi-column pruning: lineitem is laid
    out by the Morton interleave of (l_partkey, l_suppkey) and written
    as a COLF dataset, so each part file's zone maps cover a small
    RECTANGLE of the two-key space instead of a stripe of one key. A
    two-column range predicate (a ~10%x10% rectangle) then prunes most
    files from their manifest stats alone. The query asserts the
    pruning property (the z-ordered layout's overlapping-file count
    must be well under the naive layout's, which overlaps everything)
    and returns the rectangle's aggregate, which the oracle checks
    value-exactly — pruning must never change an answer.

    Scale: single-column range partitioning only prunes the lead
    column; at 100 TB any selective filter on a SECOND column rescans
    everything. Z-ordering is the standard fix (Delta OPTIMIZE ZORDER,
    Iceberg sort orders): one layout shuffle at write time buys
    metadata-level pruning for every future query on either key. The
    in-query check reads ONLY the manifest sidecar — the decision is
    metadata-sized, exactly as it must be on a million-file dataset.
    """
    from ..colf.datasource import load_manifest
    from ..colf.datasource import register as register_ds
    from ..staging import stage_once

    register_ds(spark)
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("int").alias("l_partkey"),
        F.col("l_suppkey").cast("int").alias("l_suppkey"),
        F.col("l_extendedprice"))

    def write(d: str) -> None:
        z = li.withColumn("zval", _interleave_bits("l_partkey", "l_suppkey"))
        (z.repartitionByRange(Z_FILES, "zval").drop("zval")
         .write.format("colf").option("version", "2")
         .mode("append").save(d + "/zorder"))
        (li.repartition(Z_FILES).write.format("colf").option("version", "2")
         .mode("append").save(d + "/naive"))

    base = stage_once(("zorder", sf_dir), "colf_zorder_", write)
    zdir, ndir = base + "/zorder", base + "/naive"

    # predicate bounds from the MANIFEST zone maps (global max = max of
    # file maxes) — planning reads metadata, not data
    man = load_manifest(zdir)
    mx_p = max(s["columns"]["l_partkey"]["max"] for s in man.values())
    mx_s = max(s["columns"]["l_suppkey"]["max"] for s in man.values())
    lo_p, hi_p = mx_p * 3 // 10, mx_p * 4 // 10
    lo_s, hi_s = mx_s * 3 // 10, mx_s * 4 // 10

    def overlapping(path: str) -> int:
        m = load_manifest(path)
        n = 0
        for s in m.values():
            p, sp = s["columns"]["l_partkey"], s["columns"]["l_suppkey"]
            if (p["min"] <= hi_p and p["max"] >= lo_p
                    and sp["min"] <= hi_s and sp["max"] >= lo_s):
                n += 1
        return n

    z_hit, n_hit = overlapping(zdir), overlapping(ndir)
    if not z_hit * 2 <= n_hit:
        raise AssertionError(
            f"z-order layout overlaps {z_hit}/{Z_FILES} files vs naive "
            f"{n_hit}/{Z_FILES} — clustering is not pruning")

    back = spark.read.format("colf").load(zdir).filter(
        (F.col("l_partkey") >= lo_p) & (F.col("l_partkey") <= hi_p)
        & (F.col("l_suppkey") >= lo_s) & (F.col("l_suppkey") <= hi_s))
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * 100)
         .cast("bigint").cast("double") / F.lit(100.0)).alias("sum_price"),
        F.min("l_partkey").cast("bigint").alias("min_p"),
        F.max("l_partkey").cast("bigint").alias("max_p"),
    )


RANK_BITS = 8  # rank-normalized z-order: 8-bit rank domain per dimension


def _rank_cuts(df: DataFrame, col: str, bits: int = RANK_BITS) -> list[float]:
    """Approximate quantile cut points dividing ``col`` into 2**bits
    equal-population buckets. approxQuantile runs distributed
    (Greenwald-Khanna per partition, merged); the driver receives
    2**bits - 1 doubles — metadata-sized at any corpus scale."""
    n = (1 << bits) - 1
    return df.stat.approxQuantile(col, [(i + 1) / (n + 1) for i in range(n)],
                                  0.001)


def _rank_cuts2(df: DataFrame, col_a: str, col_b: str,
                bits: int = RANK_BITS) -> tuple[list[float], list[float]]:
    """Cut points for TWO dimensions from a single distributed
    approxQuantile pass (the multi-column form builds every sketch in
    one scan) — the layout job's quantile cost is one scan no matter
    how many z-order dimensions it normalizes."""
    n = (1 << bits) - 1
    probs = [(i + 1) / (n + 1) for i in range(n)]
    cuts = df.stat.approxQuantile([col_a, col_b], probs, 0.001)
    return cuts[0], cuts[1]


def _rank_bucket(col: str, cuts: list[float]) -> F.Column:
    """Map a value to its rank bucket = #cuts <= value, as a single
    JVM-side higher-order filter over the literal cut array — no UDF,
    no join. O(2**bits) branch-free compares per row inside codegen;
    monotone in the value, so range predicates on the original column
    stay range predicates in the rank domain. Built as ONE expr()
    string (a py4j call per F.lit() made a 255-cut array ~255 gateway
    round trips — the colf.cluster fix, applied here too)."""
    from ..colf.cluster import rank_bucket

    return rank_bucket(col, cuts)


@register(
    "q169_zorder_rank",
    oracle="""
    WITH bounds AS (
      SELECT (MAX(l_partkey) * 3) // 10 AS lo_p,
             (MAX(l_partkey) * 4) // 10 AS hi_p,
             (MAX(l_suppkey) * 3) // 10 AS lo_s,
             (MAX(l_suppkey) * 4) // 10 AS hi_s
      FROM lineitem)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           (CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT)) AS DOUBLE) / 100.0) AS sum_price,
           CAST(MIN(l_partkey) AS BIGINT) AS min_p,
           CAST(MAX(l_partkey) AS BIGINT) AS max_p
    FROM lineitem, bounds
    WHERE l_partkey BETWEEN lo_p AND hi_p
      AND l_suppkey BETWEEN lo_s AND hi_s
    """,
)
def q169_zorder_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-normalized z-order on SKEWED, WIDE-RANGE keys — the case
    where q157's fixed-width interleave degrades. The clustering keys
    here are (l_partkey, l_suppkey) each scaled by an odd constant
    (40503): a monotone transform whose range blows far past the
    16-bit interleave domain at every SF, so the fixed-width z-value
    keeps only hash-like low bits and its file zone maps overlap
    nearly everything. The fix is what
    Delta's OPTIMIZE ZORDER does: rank-normalize each dimension into a
    fixed-width domain first — here via distributed approxQuantile cut
    points and a JVM-side bucket expression (no UDF) — then interleave
    the ranks. The query lays lineitem out BOTH ways, asserts from the
    manifest sidecars alone that the rank layout's overlapping-file
    count for a 10%x10% rectangle is at most half the fixed-width
    layout's AND no worse than half the files (parity with q157's
    benign-key skip ratio), then returns the rectangle aggregate the
    oracle value-checks — layout must never change an answer.

    Scale: rank normalization is insensitive to key range and skew by
    construction (equal-population buckets), so the one layout shuffle
    keeps its pruning power on arbitrary real-world keys; the cut
    points are 2**RANK_BITS doubles per dimension — metadata-sized on
    a million-file dataset.
    """
    from ..colf.datasource import load_manifest
    from ..colf.datasource import register as register_ds
    from ..staging import stage_once

    register_ds(spark)
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").cast("int").alias("l_partkey"),
        F.col("l_suppkey").cast("int").alias("l_suppkey"),
        F.col("l_extendedprice")).withColumns({
            "wk_p": F.col("l_partkey").cast("bigint") * F.lit(40503),
            "wk_s": F.col("l_suppkey").cast("bigint") * F.lit(40503)})

    def write(d: str) -> None:
        # the projection feeds FOUR jobs (quantiles + two layout
        # shuffles): cache it once instead of re-scanning the parquet
        li.persist()
        try:
            # degraded baseline: fixed 16-bit interleave of the wide keys
            zf = li.withColumn("zval", _interleave_bits("wk_p", "wk_s"))
            (zf.repartitionByRange(Z_FILES, "zval")
             .drop("zval", "wk_p", "wk_s")
             .write.format("colf").option("version", "2")
             .mode("append").save(d + "/fixed"))
            # rank-normalized: equal-population buckets per dimension,
            # then interleave the 8-bit ranks. ONE two-column
            # approxQuantile pass — half the quantile scans of
            # per-column calls
            cuts_p, cuts_s = _rank_cuts2(li, "wk_p", "wk_s")
            zr = (li.withColumn("rk_p", _rank_bucket("wk_p", cuts_p))
                  .withColumn("rk_s", _rank_bucket("wk_s", cuts_s))
                  .withColumn("zval", _interleave_bits("rk_p", "rk_s")))
            (zr.repartitionByRange(Z_FILES, "zval")
             .drop("zval", "rk_p", "rk_s", "wk_p", "wk_s")
             .write.format("colf").option("version", "2")
             .mode("append").save(d + "/rank"))
        finally:
            li.unpersist()

    base = stage_once(("zorder-rank", sf_dir), "colf_zrank_", write)
    fdir, rdir = base + "/fixed", base + "/rank"

    man = load_manifest(rdir)
    mx_p = max(s["columns"]["l_partkey"]["max"] for s in man.values())
    mx_s = max(s["columns"]["l_suppkey"]["max"] for s in man.values())
    lo_p, hi_p = mx_p * 3 // 10, mx_p * 4 // 10
    lo_s, hi_s = mx_s * 3 // 10, mx_s * 4 // 10

    def overlapping(path: str) -> int:
        m = load_manifest(path)
        n = 0
        for s in m.values():
            p, sp = s["columns"]["l_partkey"], s["columns"]["l_suppkey"]
            if (p["min"] <= hi_p and p["max"] >= lo_p
                    and sp["min"] <= hi_s and sp["max"] >= lo_s):
                n += 1
        return n

    r_hit, f_hit = overlapping(rdir), overlapping(fdir)
    if not (r_hit * 2 <= f_hit and r_hit * 2 <= Z_FILES):
        raise AssertionError(
            f"rank z-order overlaps {r_hit}/{Z_FILES} files vs fixed-width "
            f"{f_hit}/{Z_FILES} — rank normalization is not restoring "
            f"pruning on wide-range keys")

    back = spark.read.format("colf").load(rdir).filter(
        (F.col("l_partkey") >= lo_p) & (F.col("l_partkey") <= hi_p)
        & (F.col("l_suppkey") >= lo_s) & (F.col("l_suppkey") <= hi_s))
    return back.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * 100)
         .cast("bigint").cast("double") / F.lit(100.0)).alias("sum_price"),
        F.min("l_partkey").cast("bigint").alias("min_p"),
        F.max("l_partkey").cast("bigint").alias("max_p"),
    )


SORT_FILES = 8


@register(
    "q163_sorted_layout",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(MIN(l_orderkey) AS BIGINT) AS min_key
    FROM lineitem
    WHERE strftime(l_shipdate, '%Y-%m-%d') >= '1996-01-01'
      AND strftime(l_shipdate, '%Y-%m-%d') < '1996-02-01'
    GROUP BY l_returnflag
    """,
)
def q163_sorted_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-sorted dataset layout (the terasort/ingest-order pattern):
    lineitem is range-partitioned by ship date (sampled boundaries via
    repartitionByRange — Spark's global-sort machinery) and written as
    a COLF dataset, which makes the per-file zone maps PAIRWISE
    DISJOINT on the sort key. The query asserts both layout properties
    from the manifest sidecar alone — disjointness, and that a
    one-month window overlaps at most 2 of the 8 files — then returns
    the window's aggregate, value-checked by the oracle.

    Scale: sorting by event/ship time at write is the cheapest pruning
    investment a 100 TB pipeline can make — every time-ranged query
    (most of them) then opens only boundary files. Range partitioning
    with sampled boundaries is exactly how Spark's own orderBy plans,
    so the layout write is one shuffle, skew-handled by AQE. The date
    rides as 'yyyy-MM-dd' utf8 (lexicographic==chronological), staying
    inside COLF's three-type system with working string zone maps.
    """
    from ..colf.datasource import load_manifest
    from ..colf.datasource import register as register_ds
    from ..staging import stage_once

    register_ds(spark)
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").cast("int").alias("l_orderkey"),
        F.col("l_quantity").alias("l_quantity"),
        F.col("l_returnflag").alias("l_returnflag"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("l_shipdate_s"))

    def write(d: str) -> None:
        (li.repartitionByRange(SORT_FILES, "l_shipdate_s")
         .write.format("colf").option("version", "2")
         .mode("append").save(d + "/ds"))

    base = stage_once(("sorted-layout", sf_dir), "colf_sorted_", write)
    path = base + "/ds"

    lo, hi = "1996-01-01", "1996-02-01"
    man = load_manifest(path)
    spans = sorted((s["columns"]["l_shipdate_s"]["min"],
                    s["columns"]["l_shipdate_s"]["max"])
                   for s in man.values() if s.get("num_rows"))
    for (_, pmax), (nmin, _) in zip(spans, spans[1:]):
        if nmin < pmax:
            raise AssertionError(
                f"range-partitioned files overlap on the sort key: "
                f"{pmax} vs {nmin} — layout is not sorted")
    hit = sum(1 for mn, mx in spans if mn < hi and mx >= lo)
    if hit > 2:
        raise AssertionError(
            f"one-month window overlaps {hit}/{len(spans)} sorted files "
            f"— zone maps are not pruning a sorted layout")

    back = spark.read.format("colf").load(path).filter(
        (F.col("l_shipdate_s") >= lo) & (F.col("l_shipdate_s") < hi))
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.min(F.col("l_orderkey").cast("bigint")).alias("min_key"),
    )
