"""Deduplication operators over `documents`: exact, n-gram Jaccard,
MinHash+LSH, SimHash.

Design for 100 TB:
- Exact dedup groups on a 128-bit md5 fingerprint, never on the full
  text — the shuffle carries 16 bytes + doc_id per row.
- MinHash/LSH: signatures are built by exploding shingles and taking
  MIN per (doc, seed) — Spark plans partial (map-side) MIN so the
  shuffle carries ncols×nseeds rows per task, not per shingle. Band
  buckets then self-join only within equal band keys: candidate pairs,
  not the quadratic cross product.
- All hashes derive from md5 (stable across engines and runs) rather
  than Spark's Murmur `hash()` so the DuckDB oracle can reproduce the
  results bit-for-bit.

The reference format has no dedup surface (SURVEY.md §2.2); these are
engine extensions mandated by BASELINE.json's north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import QUERIES, register, spread, table

# 8 hashes in 2 bands of 4: pair-collision probability j^4-ish per
# band — a 0.9-Jaccard near-dup collides with p≈0.93, a 0.5-Jaccard
# unrelated doc with p≈0.12. (3-char shingles with 2-row bands made
# ~half of all pairs candidates on word-soup corpora — useless.)
N_HASHES = 8          # minhash signature length
BAND_ROWS = 4         # rows per LSH band → 2 bands
SHINGLE_K = 5         # character shingle width (on ws-normalized text)


def normalized(c: Column) -> Column:
    return F.lower(F.regexp_replace(c, "\\s+", " "))


def shingles(c: Column, k: int = SHINGLE_K) -> Column:
    """Distinct character k-shingles of a string column (JVM-side:
    sequence + transform + array_distinct — no Python)."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c) - (k - 1), F.lit(1))),
            lambda i: c.substr(i, F.lit(k)),
        )
    )


SQL_SHINGLES = (
    f"list_distinct(list_transform(range(1, greatest(length({{t}}) - {SHINGLE_K - 1}, 1) + 1),"
    f" i -> substr({{t}}, i, {SHINGLE_K})))"
)


@register(
    "q50_dedup_exact",
    oracle="""
    SELECT md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint,
           MIN(doc_id) AS keeper_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def q50_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: group by md5 fingerprint of normalized text, keep
    the lowest doc_id (deterministic keeper, unlike dropDuplicates)."""
    d = table(spark, sf_dir, "documents")
    return (
        d.select(normalized(F.col("text")).alias("norm"), "doc_id")
        .select(F.md5("norm").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )


SQL_NORM_TEXT = "lower(regexp_replace(text, '\\s+', ' ', 'g'))"
_SQL_SHINGLES_NORM = SQL_SHINGLES.format(t=SQL_NORM_TEXT)

_JACCARD_SQL = f"""
    WITH docs AS (
      SELECT doc_id, {_SQL_SHINGLES_NORM} AS sh
      FROM documents WHERE doc_id < 40),
    sizes AS (SELECT doc_id, len(sh) AS n FROM docs),
    pairs AS (
      SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter
      FROM (SELECT doc_id, unnest(sh) AS s FROM docs) a
      JOIN (SELECT doc_id, unnest(sh) AS s FROM docs) b
        ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT d1, d2,
           (CAST(inter AS DOUBLE) / (s1.n + s2.n - inter)) AS jaccard
    FROM pairs JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
    WHERE inter * 2 > (s1.n + s2.n - inter)
"""


@register("q51_ngram_jaccard", oracle=_JACCARD_SQL)
def q51_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise character-SHINGLE_K-gram Jaccard similarity (docs 0-39,
    pairs above 0.5). Explode-join-count: |A∩B| via equi-join on shingle,
    |A∪B| = |A|+|B|−|A∩B|. The doc_id<40 cap bounds the demo; the
    scale path for all-pairs similarity is q52's LSH candidates."""
    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", shingles(normalized(F.col("text"))).alias("sh"))
    )
    sizes = d.select("doc_id", F.size("sh").alias("n"))
    ex = d.select("doc_id", F.explode("sh").alias("s"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    return (
        inter.join(s1, "d1").join(s2, "d2")
        .withColumn("union_n", F.col("n1") + F.col("n2") - F.col("inter"))
        .filter(F.col("inter") * 2 > F.col("union_n"))
        .select("d1", "d2",
                (F.col("inter").cast("double") / F.col("union_n")).alias("jaccard"))
    )


def bigrams_of(toks: Column, orig: Column) -> Column:
    """Distinct word-bigram shingles from a pre-split token array.

    Takes the token array as an ATTRIBUTE on purpose: expressions
    referenced from multiple spots (and from inside higher-order-
    function lambdas, where codegen does no common-subexpression
    elimination) are re-evaluated per use — passing `split(regexp(...))`
    inline here re-ran the normalization regex per array element,
    turning O(tokens) shingling into O(tokens^2) regex work (measured
    6x slowdown on the documents corpus). Materialize norm/tokens in a
    prior projection; CollapseProject leaves multi-use non-cheap
    producers alone, so the split really does run once per row.
    """
    grams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, y: F.concat_ws(" ", x, y),
    )
    return F.array_distinct(F.when(F.size(toks) < 2, F.array(orig)).otherwise(grams))


def word_bigrams(c: Column) -> Column:
    """Word-bigram shingles of a string column (convenience wrapper —
    for hot paths pre-split and call `bigrams_of`, see its docstring)."""
    return bigrams_of(F.split(c, " "), c)


SQL_WORD_BIGRAMS = (
    "list_distinct(CASE WHEN len(regexp_split_to_array({t}, ' ')) < 2 THEN [{t}] "
    "ELSE list_transform(range(1, len(regexp_split_to_array({t}, ' '))), "
    "i -> regexp_split_to_array({t}, ' ')[i] || ' ' || regexp_split_to_array({t}, ' ')[i+1]) END)"
)


# Universal-hash "permutations": mh_i = MIN((A_i*h + B_i) mod P) where
# h is a 32-bit integer derived from ONE md5 per shingle (8 hex-nibble
# lookups) — vs. the naive N_HASHES full md5 calls per shingle, this
# hashes each shingle once and derives the family arithmetically, and
# needs no seed-explode row multiplication (6.5x faster measured).
# A_i*(h%P) < 2^62, so bigint arithmetic is exact in both engines.
_MH_P = 2147483647  # 2^31 - 1, prime
_MH_A = [1299721, 2750161, 4256233, 5800079, 7368787, 8960453, 10570841, 12195257]
_MH_B = [15485863, 32452843, 49979687, 67867967, 86028121, 104395301, 122949823, 141650939]
assert len(_MH_A) == len(_MH_B) == N_HASHES

# h32: decode md5 hex nibbles 25..32 arithmetically (strpos/instr-based
# nibble lookup works identically in Spark and DuckDB).
_SQL_H32 = " + ".join(
    f"{16 ** k} * (strpos('0123456789abcdef', substr(md5(s), {32 - k}, 1)) - 1)"
    for k in range(8)
)
_SQL_MINS = ",\n             ".join(
    f"MIN(({a} * (h % {_MH_P}) + {b}) % {_MH_P}) AS mh{i}"
    for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
)
_SQL_BAND_KEYS = [
    "concat_ws(',', " + ", ".join(f"mh{i}" for i in range(lo, lo + BAND_ROWS)) + ")"
    for lo in range(0, N_HASHES, BAND_ROWS)
]

_MINHASH_SQL = f"""
    WITH ex AS (
      SELECT doc_id, unnest({SQL_WORD_BIGRAMS.format(t=SQL_NORM_TEXT)}) AS s
      FROM documents),
    hh AS (SELECT doc_id, CAST({_SQL_H32} AS BIGINT) AS h FROM ex),
    sig AS (SELECT doc_id, {_SQL_MINS}
            FROM hh GROUP BY doc_id),
    bands AS (
      {" UNION ALL ".join(f"SELECT doc_id, {band} AS band, {key} AS band_key FROM sig" for band, key in enumerate(_SQL_BAND_KEYS))}),
    buckets AS (
      SELECT band, band_key, list_sort(list(doc_id)) AS ids
      FROM bands GROUP BY band, band_key
      HAVING COUNT(*) BETWEEN 2 AND {{maxb}}),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM (SELECT unnest(ids) AS doc_id, band, band_key FROM buckets) a
      JOIN (SELECT unnest(ids) AS doc_id, band, band_key FROM buckets) b
        ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
    SELECT d1, d2 FROM cand
"""

# Buckets larger than this are "junk clusters" (boilerplate / empty
# docs) whose pair expansion is quadratic; both engines drop them, so
# the cap is part of the operator's defined semantics.
LSH_MAX_BUCKET = 1000
_MINHASH_SQL = _MINHASH_SQL.format(maxb=LSH_MAX_BUCKET)


def minhash_signature(d: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """(id, mh0..mh{N_HASHES-1}): one md5 per distinct shingle, then
    N_HASHES min-aggregates of (A_i*h + B_i) mod P in a single groupBy
    — map-side partial MIN means the shuffle carries one signature row
    per (task, doc), never per shingle."""
    ex = (
        spread(d)
        .select(F.col(id_col), normalized(F.col(text_col)).alias("norm"))
        .select(id_col, "norm", F.split("norm", " ").alias("toks"))
        .select(F.col(id_col), F.explode(bigrams_of(F.col("toks"), F.col("norm"))).alias("s"))
    )
    nib = lambda pos: F.expr(
        f"instr('0123456789abcdef', substring(md5(s), {pos}, 1)) - 1"
    ).cast("long")
    h32 = sum(F.lit(16 ** k).cast("long") * nib(32 - k) for k in range(8))
    hp = (h32 % _MH_P).alias("hp")
    return (
        ex.select(id_col, hp)
        .groupBy(id_col)
        .agg(*[
            F.min((F.lit(a) * F.col("hp") + F.lit(b)) % _MH_P).alias(f"mh{i}")
            for i, (a, b) in enumerate(zip(_MH_A, _MH_B))
        ])
    )


@register("q52_minhash_lsh", oracle=_MINHASH_SQL)
def q52_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH candidate pairs: 8-hash signature, 2 bands × 4
    rows; pairs agreeing on any full band are candidates.

    Scale: the band self-join only touches equal (band, band_key)
    buckets, so cost is Σ bucket², not n² — the standard fuzzy-dedup
    pipeline shape for 100 TB corpora. Downstream, verify candidates
    with q51's exact Jaccard.
    """
    d = table(spark, sf_dir, "documents")
    sig = minhash_signature(d)
    band_key = [
        F.concat_ws(",", *[F.col(f"mh{i}") for i in range(lo, lo + BAND_ROWS)])
        for lo in range(0, N_HASHES, BAND_ROWS)
    ]
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(band).alias("band"), key.alias("band_key"))
            for band, key in enumerate(band_key)
        ])).alias("bk"),
    ).select("doc_id", "bk.band", "bk.band_key")
    # Bucket-then-expand instead of a band self-join: the join would
    # recompute the whole signature subtree for each side (Spark plans
    # self-joins as two scans), and shuffle the bands twice. One
    # groupBy shuffles signatures once; pairs come from intra-bucket
    # expansion (sorted ids → i<j gives d1<d2). LSH_MAX_BUCKET bounds
    # the quadratic blowup of junk clusters at 100 TB.
    ids = F.array_sort(F.collect_list("doc_id"))
    pairs = F.flatten(F.transform(
        F.col("ids"),
        lambda x, i: F.transform(
            F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
            lambda y: F.struct(x.alias("d1"), y.alias("d2")),
        ),
    ))
    return (
        bands.groupBy("band", "band_key")
        .agg(ids.alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= LSH_MAX_BUCKET))
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.d1").alias("d1"), F.col("p.d2").alias("d2"))
        .distinct()
    )


# 16-bit token hash = last 4 hex digits of md5, decoded arithmetically
# (strpos-based nibble lookup — identical construct in Spark below, no
# engine-specific hex/bit casts involved).
_SQL_H16 = ("((strpos('0123456789abcdef', substr(md5(tok), 32, 1)) - 1)"
            " + 16 * (strpos('0123456789abcdef', substr(md5(tok), 31, 1)) - 1)"
            " + 256 * (strpos('0123456789abcdef', substr(md5(tok), 30, 1)) - 1)"
            " + 4096 * (strpos('0123456789abcdef', substr(md5(tok), 29, 1)) - 1))")

_SIMHASH_SQL = f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(text), '\\s+'))) AS tok
      FROM documents),
    bits AS (
      SELECT doc_id, b.bit,
             CASE WHEN ({_SQL_H16} >> b.bit) & 1 = 1 THEN 1 ELSE -1 END AS v
      FROM toks, range(0, 16) b(bit)),
    agg AS (SELECT doc_id, bit, CAST(SUM(v) AS BIGINT) AS s FROM bits GROUP BY doc_id, bit)
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN (1 << bit) ELSE 0 END) AS BIGINT) AS simhash
    FROM agg GROUP BY doc_id
"""


@register("q53_simhash", oracle=_SIMHASH_SQL)
def q53_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per document from md5-derived token hashes: each
    distinct token votes ±1 per bit position; the sign becomes the bit.
    Near-dup docs differ in few bits (Hamming distance). Integer
    arithmetic only → engine-identical.

    Scale: one explode + one groupBy(doc, bit) with map-side partial
    sums; signature comparison downstream is a cheap bigint XOR.
    """
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower(F.col("text")), "\\s+"))).alias("tok"),
    )

    # 16-bit token hash: last 4 hex digits of md5, nibble-decoded (same
    # arithmetic as _SQL_H16; F.expr because instr's needle is dynamic)
    def nib(pos: int) -> Column:
        return F.expr(f"instr('0123456789abcdef', substring(md5(tok), {pos}, 1)) - 1")

    h16 = nib(32) + 16 * nib(31) + 256 * nib(30) + 4096 * nib(29)
    bits = (
        toks.select("doc_id", h16.alias("h"))
        .select("doc_id", "h",
                F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit"))
        .select(
            "doc_id", "bit",
            # (h >> bit) & 1, via exact power-of-two arithmetic (pyspark's
            # shiftright wants a literal bit count)
            F.when(F.floor(F.col("h") / F.pow(F.lit(2), F.col("bit"))) % 2 == 1, 1)
            .otherwise(-1).alias("v"),
        )
    )
    agg = bits.groupBy("doc_id", "bit").agg(F.sum("v").alias("s"))
    return agg.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.pow(F.lit(2), F.col("bit")).cast("bigint")).otherwise(0)
        ).cast("bigint").alias("simhash")
    )


# ---------------------------------------------------------------------------
# Survivor selection + cluster dedup


@register(
    "q55_dedup_survivors",
    oracle="""
    WITH fp AS (
      SELECT doc_id,
             md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fingerprint
      FROM documents)
    SELECT doc_id, fingerprint,
           MIN(doc_id) OVER (PARTITION BY fingerprint) AS survivor_id,
           (doc_id = MIN(doc_id) OVER (PARTITION BY fingerprint)) AS is_survivor,
           COUNT(*) OVER (PARTITION BY fingerprint) AS cluster_size
    FROM fp
    """,
)
def q55_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level survivor selection: every document annotated with its
    exact-dup cluster's keeper (lowest doc_id per fingerprint) — the
    form a pipeline actually consumes (filter is_survivor, or remap
    references to survivor_id), complementing q50's per-cluster view.

    Scale: one shuffle on the 128-bit fingerprint; the window runs
    inside each fingerprint partition (tiny groups), no second pass.
    """
    from pyspark.sql import Window

    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("fingerprint")
    return (
        d.select("doc_id", F.md5(normalized(F.col("text"))).alias("fingerprint"))
        .select(
            "doc_id", "fingerprint",
            F.min("doc_id").over(w).alias("survivor_id"),
            (F.col("doc_id") == F.min("doc_id").over(w)).alias("is_survivor"),
            F.count(F.lit(1)).over(w).alias("cluster_size"),
        )
    )


# candidate-pair graph, symmetrized — THE edge definition shared by
# q56 (components) and q108 (pagerank), Spark side and oracle side
_EDGES_CTE = f"""pairs AS (
      SELECT d1, d2 FROM ({_MINHASH_SQL}) mh),
    edges AS (
      SELECT d1 AS a, d2 AS b FROM pairs
      UNION SELECT d2, d1 FROM pairs)"""


_EDGES_CACHE: dict[tuple[str, str], DataFrame] = {}


def _candidate_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q52's candidate pairs as a symmetric, deduped, checkpointed
    edge list (a, b) — the graph every clustering/centrality stage
    shares.  Memoized per (session, sf_dir): q56, q108, bench reps and
    invariance probes all reuse ONE checkpointed RDD instead of
    accumulating a new set of storage blocks per invocation."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _EDGES_CACHE.get(key)
    if cached is not None:
        return cached
    pairs = QUERIES["q52_minhash_lsh"].fn(spark, sf_dir)
    edges = pairs.select(F.col("d1").alias("a"), F.col("d2").alias("b")).unionAll(
        pairs.select(F.col("d2").alias("a"), F.col("d1").alias("b"))).distinct()
    _EDGES_CACHE[key] = edges.localCheckpoint(eager=True)
    return _EDGES_CACHE[key]


_COMPONENTS_SQL = f"""
    WITH RECURSIVE {_EDGES_CTE},
    reach(src, dst) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
    comp AS (SELECT src AS doc_id, MIN(dst) AS component_id
             FROM reach GROUP BY src)
    SELECT doc_id, component_id,
           COUNT(*) OVER (PARTITION BY component_id) AS component_size
    FROM comp
"""


def _two_phase_components(edges: DataFrame, max_rounds: int = 12) -> DataFrame:
    """Alternating large-star / small-star connected components (the
    two-phase MapReduce CC of Kiveris et al., "Connected Components in
    MapReduce and Beyond"): O(log^2 n) rounds worst-case and 2-3 rounds
    on real near-dup graphs, vs O(diameter) for one-hop min-label
    propagation. Each phase is one groupBy + one join on the current
    edge list; the list only shrinks (toward a forest of depth-1 stars
    rooted at each component's minimum id).

    Input: symmetric edge list (a, b). Output: (doc_id, label) for
    every node that appears in the graph, label = component min id.
    localCheckpoint per round truncates lineage (iterative-Spark
    discipline); the convergence probe is one tiny aggregate per round
    — count + order-independent hash of the edge set — instead of an
    anti-join, because any change by either phase strictly decreases
    the algorithm's potential function (no oscillation can hash-alias
    a changed set back, barring a 64-bit collision; max_rounds caps
    that, and the star-forest label read-out is correct at any
    fixpoint)."""
    nodes = edges.select(F.col("a").alias("doc_id")).distinct() \
        .localCheckpoint(eager=True)
    e = (edges.filter(F.col("a") < F.col("b"))
         .select(F.col("a").alias("u"), F.col("b").alias("v")).distinct()
         .localCheckpoint(eager=True))
    prev_sig = None
    converged = False
    for _ in range(max_rounds):
        # large-star: for each node, link every LARGER neighbor to the
        # minimum of the closed neighborhood min(N(u) ∪ {u})
        sym = e.unionAll(e.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(
            F.least(F.col("u"), F.min("v")).alias("m"))
        e = (sym.join(mins, "u")
             .filter(F.col("v") > F.col("u"))
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .filter(F.col("u") != F.col("v")).distinct())
        # small-star: orient every edge toward the smaller endpoint,
        # then link each node AND its smaller neighbors to the minimum
        down = e.select(F.greatest("u", "v").alias("u"),
                        F.least("u", "v").alias("v"))
        mins2 = down.groupBy("u").agg(F.min("v").alias("m"))
        e = (down.join(mins2, "u")
             .select(F.col("v").alias("u"), F.col("m").alias("v"))
             .unionAll(mins2.select("u", F.col("m").alias("v")))
             .filter(F.col("u") != F.col("v")).distinct()
             .select(F.least("u", "v").alias("w"),
                     F.greatest("u", "v").alias("x"))
             .select(F.col("x").alias("u"), F.col("w").alias("v"))
             ).localCheckpoint(eager=True)
        # bit_xor, not sum: order-independent over the distinct edge
        # set and immune to ANSI-mode long-overflow on the aggregate
        sig = tuple(e.agg(F.count(F.lit(1)),
                          F.bit_xor(F.xxhash64("u", "v"))).first())
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        # the star read-out is only proven correct at a true fixpoint;
        # exhausting max_rounds would silently return under-merged
        # component labels — fail loud instead (callers can retry with
        # a larger budget; 12 rounds covers graphs far beyond 2^12
        # nodes at the algorithm's O(log^2 n) bound)
        raise RuntimeError(
            f"connected components did not converge within {max_rounds} "
            "large-star/small-star rounds; labels would be under-merged")
    # fixpoint is a star forest: u -> component-min v for every
    # non-root; roots (the minima) have no outgoing edge. groupBy(min)
    # instead of a bare join so a max_rounds truncation can at worst
    # under-merge, never duplicate a node's row
    star = e.groupBy(F.col("u").alias("doc_id")).agg(
        F.min("v").alias("label"))
    return (nodes.join(star, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("label", "doc_id").alias("label")))


@register("q56_dedup_components", oracle=_COMPONENTS_SQL)
def q56_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash candidate-pair graph
    (q52's edges) via alternating large-star/small-star (see
    _two_phase_components), so transitively-linked near-dups share one
    cluster id (min doc_id in the component) — the fuzzy-dedup
    clustering stage. The oracle is a recursive-CTE transitive
    closure: an ITERATIVE Spark algorithm still checked exactly
    against SQL.

    Scale: 2-3 alternations on shallow near-dup graphs and O(log^2 n)
    worst-case — vs O(diameter) for one-hop label propagation — with
    each phase one groupBy + one join on an only-shrinking edge list;
    localCheckpoint per round truncates lineage (the classic
    iterative-Spark failure mode), GraphX-free.
    """
    edges = _candidate_edges(spark, sf_dir)  # memoized per session
    labels = _two_phase_components(edges)
    from pyspark.sql import Window

    w = Window.partitionBy("component_id")
    return labels.select(
        "doc_id", F.col("label").alias("component_id")
    ).withColumn("component_size", F.count(F.lit(1)).over(w))


_KEEP_BEST_SQL = f"""
    WITH RECURSIVE {_EDGES_CTE},
    reach(src, dst) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
    comp AS (SELECT src AS doc_id, MIN(dst) AS component_id
             FROM reach GROUP BY src),
    everyone AS (
      SELECT d.doc_id, COALESCE(c.component_id, d.doc_id) AS component_id,
             CAST(d.n_chars AS BIGINT) AS n_chars
      FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
    ranked AS (
      SELECT doc_id, component_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY component_id
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM everyone)
    SELECT doc_id, component_id, n_chars, (rn = 1) AS keep
    FROM ranked
"""


@register("q111_dedup_keep_best", oracle=_KEEP_BEST_SQL)
def q111_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-copy selection over near-dup clusters: every document
    joins its q56 connected component (docs outside the candidate
    graph are their own singleton component), and within each component
    the LONGEST document wins (n_chars desc, doc_id tiebreak) — the
    quality-aware alternative to q55's min-id survivors, which is how
    production dedup picks the copy to keep (boilerplate-stripped dups
    are shorter, truncated crawls lose to full pages).

    Scale: one broadcast-size join against the component labels (the
    label table is |graph docs|, orders smaller than the corpus) plus
    one window partitioned by component_id — singleton components
    dominate, so partitions are tiny and the shuffle is the corpus's
    (doc_id, component_id, n_chars) triple, never text.
    """
    from pyspark.sql import Window

    labels = QUERIES["q56_dedup_components"].fn(spark, sf_dir).select(
        "doc_id", "component_id")
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"))
    everyone = (
        d.join(labels, "doc_id", "left")
        .select("doc_id",
                F.coalesce("component_id", "doc_id").alias("component_id"),
                "n_chars")
    )
    w = Window.partitionBy("component_id").orderBy(
        F.col("n_chars").desc(), F.col("doc_id"))
    return everyone.select(
        "doc_id", "component_id", "n_chars",
        (F.row_number().over(w) == 1).alias("keep"))


_HIST_CUT = 80  # doc_bucket < 80 = historical corpus, rest = new batch


def _incremental_sql() -> str:
    from .text import _SQL_DOC_BUCKET

    return f"""
    WITH fp AS (
      SELECT doc_id, md5({SQL_NORM_TEXT}) AS fingerprint,
             {_SQL_DOC_BUCKET} AS b
      FROM documents),
    hist AS (SELECT DISTINCT fingerprint FROM fp WHERE b < {_HIST_CUT}),
    inc AS (SELECT doc_id, fingerprint FROM fp WHERE b >= {_HIST_CUT})
    SELECT i.doc_id, i.fingerprint,
           CASE WHEN h.fingerprint IS NOT NULL THEN 'dup_of_history'
                WHEN i.doc_id > MIN(i.doc_id) OVER (PARTITION BY i.fingerprint)
                     THEN 'dup_within_batch'
                ELSE 'new' END AS status
    FROM inc i LEFT JOIN hist h ON i.fingerprint = h.fingerprint
"""


@register("q113_incremental_dedup", oracle=_incremental_sql())
def q113_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact dedup — the daily-ingestion shape: the corpus
    splits deterministically into a historical set (doc_bucket < 80,
    the q67 hash) and an incoming batch; each incoming doc is labeled
    'dup_of_history' (fingerprint already survived a past run),
    'dup_within_batch' (first occurrence in this batch wins by min
    doc_id), or 'new'. Only fingerprints cross the join — at 100 TB
    the history side is a fingerprint table, not a corpus scan.

    Scale: one left join on the 16-byte md5 (history side is
    distinct-compacted, orders smaller than the batch) plus one window
    per batch fingerprint (tiny partitions). Nothing touches text
    after the fingerprint projection.
    """
    from pyspark.sql import Window

    from .text import doc_bucket

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.md5(normalized(F.col("text"))).alias("fingerprint"),
        doc_bucket().alias("b"))
    hist = (d.filter(F.col("b") < _HIST_CUT)
            .select("fingerprint").distinct()
            .withColumn("in_hist", F.lit(1)))
    inc = d.filter(F.col("b") >= _HIST_CUT).select("doc_id", "fingerprint")
    w = Window.partitionBy("fingerprint")
    return (
        inc.join(hist, "fingerprint", "left")
        .select(
            "doc_id", "fingerprint",
            F.when(F.col("in_hist").isNotNull(), "dup_of_history")
            .when(F.col("doc_id") > F.min("doc_id").over(w), "dup_within_batch")
            .otherwise("new").alias("status"))
    )


# ---------------------------------------------------------------------------
# Integer PageRank over the candidate-pair graph

PR_ITERS = 5
PR_SCALE = 1_000_000      # rank unit: 1.0 == 1e6 micro-units
PR_TELEPORT = 150_000     # 0.15 in micro-units
PR_DAMP_NUM, PR_DAMP_DEN = 850, 1000  # 0.85 as an exact ratio


def _pagerank_sql() -> str:
    its = []
    prev = "r0"
    for k in range(1, PR_ITERS + 1):
        its.append(
            f"r{k} AS (SELECT e.b AS doc_id, "
            f"CAST({PR_TELEPORT} + ({PR_DAMP_NUM} * SUM(r.rank // d.deg))"
            f" // {PR_DAMP_DEN} AS BIGINT) AS rank "
            f"FROM edges e JOIN {prev} r ON r.doc_id = e.a "
            f"JOIN deg d ON d.a = e.a GROUP BY e.b)")
        prev = f"r{k}"
    return f"""
    WITH {_EDGES_CTE},
    deg AS (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg
            FROM edges GROUP BY a),
    r0 AS (SELECT a AS doc_id, CAST({PR_SCALE} AS BIGINT) AS rank
           FROM deg),
    {", ".join(its)}
    SELECT r.doc_id, r.rank, d.deg AS degree
    FROM {prev} r JOIN deg d ON d.a = r.doc_id
    """


@register("q108_pagerank_integer", oracle=_pagerank_sql())
def q108_pagerank_integer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the MinHash candidate-pair graph (q52's edges,
    undirected so every node has out-degree >= 1 — no dangling-node
    term needed), 5 fixed iterations in EXACT integer arithmetic:
    ranks live in int64 micro-units, each contribution is integer
    division rank // degree, and damping applies as the exact ratio
    850/1000 — so Spark and the oracle's five unrolled SQL iterations
    agree bit-for-bit, with no IEEE summation-order dependence. The
    centrality stage of a dedup pipeline: within a near-dup cluster,
    high-rank docs are the canonical copies.

    Scale: textbook distributed PageRank — each iteration is one join
    of edges against current ranks (both keyed on the node id, so the
    partitioning is reused) plus a groupBy(dst) sum with map-side
    partials. Unlike q56's open-ended loop, the FIXED iteration count
    means one action executes a 5-join-deep plan — no per-iteration
    checkpoint jobs (the edge list alone is checkpointed, reused by
    all 5 iterations); convergence-delta stopping is q56's pattern if
    ever needed.
    """
    edges = _candidate_edges(spark, sf_dir)
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    ranks = deg.select(F.col("a").alias("doc_id"),
                       F.lit(PR_SCALE).cast("bigint").alias("rank"))
    for _ in range(PR_ITERS):
        contribs = (
            edges.join(ranks.withColumnRenamed("doc_id", "a"), "a")
            .join(deg, "a")
            .select("b", F.expr("rank div deg").alias("contrib"))
        )
        ranks = (
            contribs.groupBy("b")
            .agg(F.sum("contrib").alias("s"))
            .select(
                F.col("b").alias("doc_id"),
                (F.lit(PR_TELEPORT)
                 + F.expr(f"({PR_DAMP_NUM} * s) div {PR_DAMP_DEN}"))
                .cast("bigint").alias("rank"),
            )
        )
    return ranks.join(deg.select(F.col("a").alias("doc_id"),
                                 F.col("deg").alias("degree")), "doc_id")


@register(
    "q120_graph_triangles",
    oracle=f"""
    WITH {_EDGES_CTE},
    e AS (SELECT a, b FROM edges WHERE a < b),
    t AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e e1
      JOIN e e2 ON e2.a = e1.b
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    ), n AS (
      SELECT x AS doc_id FROM t
      UNION ALL SELECT y FROM t
      UNION ALL SELECT z FROM t
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM n GROUP BY doc_id
    """,
)
def q120_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over the near-dup candidate graph —
    the clustering-coefficient numerator that separates tight
    duplicate cliques (template spam: many triangles) from chains of
    borderline matches (few). Completes the graph-analytics trio with
    q56 (components) and q108 (PageRank) on the shared checkpointed
    edge list.

    Scale: the canonical two-join triangle enumeration over the
    oriented (a < b) edge list — each triangle counted exactly once,
    joins keyed on node ids so AQE reuses one exchange layout. The
    id-orientation is the standard degree-orientation trick's cheap
    cousin; on a power-law graph at 100 TB you'd orient by (degree,
    id) instead so high-degree hubs never fan out as join sources.
    Integer counts only — exact under any partitioning.
    """
    edges = _candidate_edges(spark, sf_dir)
    e = edges.where(F.col("a") < F.col("b"))
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    nodes = (
        tri.select(F.col("x").alias("doc_id"))
        .unionAll(tri.select(F.col("y").alias("doc_id")))
        .unionAll(tri.select(F.col("z").alias("doc_id")))
    )
    return nodes.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_triangles"))


# --- q191: exact substring dedup with span removal -----------------------

SPAN_K = 8  # duplicated-span width in whitespace tokens


@register(
    "q191_exact_substring_dedup",
    oracle=f"""
    WITH tk AS (
      SELECT doc_id, source, regexp_split_to_array(text, '\\s+') AS t
      FROM documents
    ), g AS (
      SELECT doc_id, u.i AS pos,
             array_to_string(t[u.i:u.i+{SPAN_K - 1}], ' ') AS gram
      FROM tk CROSS JOIN UNNEST(range(1, len(t) - {SPAN_K - 2})) AS u(i)
    ), marked AS (
      SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               ROW_NUMBER() OVER (PARTITION BY gram
                                  ORDER BY doc_id, pos) AS rn
        FROM g) WHERE rn > 1
    ), removed AS (
      SELECT DISTINCT m.doc_id, p.p
      FROM marked m
      CROSS JOIN UNNEST(range(m.pos, m.pos + {SPAN_K})) AS p(p)
    ), rmc AS (
      SELECT doc_id, COUNT(*) AS n_rm FROM removed GROUP BY doc_id
    )
    SELECT tk.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(tk.t)) AS BIGINT) AS total_tokens,
           CAST(SUM(COALESCE(rmc.n_rm, 0)) AS BIGINT) AS removed_tokens,
           CAST(SUM(CASE WHEN COALESCE(rmc.n_rm, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_affected
    FROM tk LEFT JOIN rmc USING (doc_id)
    GROUP BY tk.source
    """,
)
def q191_exact_substring_dedup(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING dedup with span REMOVAL (the Lee et al.
    "Deduplicating Training Data Makes Language Models Better"
    ExactSubstr policy, hash-gram formulation): every {SPAN_K}-token
    span that occurs anywhere else in the corpus keeps its FIRST
    occurrence (global (doc_id, pos) order) and is excised from every
    other location — overlapping duplicated spans coalesce naturally
    because removal is position-set union, not per-span. Differs from
    q85 (which MEASURES duplicated-shingle fractions) and q50/q52
    (which drop whole documents): this is the token-level surgery that
    keeps the unique remainder of boilerplate-carrying documents.
    Output: per-source token totals, removed-token counts, and
    affected-doc counts — all exact integers.

    Scale: one shuffle keyed by the gram's 128-bit fingerprint (two
    independent xxhash64 values — the ~40-60-byte gram STRING is
    dropped before the exchange, roughly halving shuffle bytes)
    decides keep-first (row_number over (doc_id, pos) — the paper's
    suffix array replaced by a distributed hash-gram pass, the
    standard scale adaptation). At 128 bits a corpus of 10^12 grams
    has ~10^-15 collision odds (a 64-bit key alone would already
    expect thousands of false excisions at that scale — that is why
    there are two). Marked occurrences expand to at most {SPAN_K}
    positions each and dedupe per (doc, position) map-side before the
    per-doc count. No driver state, no cartesian anywhere.
    """
    from pyspark.sql import Window

    from .text import ws_tokens

    d = (spread(table(spark, sf_dir, "documents"))
         .select("doc_id", "source", ws_tokens(F.col("text")).alias("t")))
    n = F.size("t")
    k = SPAN_K
    grams = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.struct(
                i.alias("pos"),
                F.concat_ws(" ", F.slice("t", i, k)).alias("gram"))),
    ).otherwise(F.array().cast("array<struct<pos:int,gram:string>>"))
    g = (d.select("doc_id", F.explode(grams).alias("o"))
         .select("doc_id", F.col("o.pos").alias("pos"),
                 F.xxhash64(F.col("o.gram")).alias("h1"),
                 F.xxhash64(F.col("o.gram"), F.lit(1)).alias("h2")))
    w = Window.partitionBy("h1", "h2").orderBy("doc_id", "pos")
    marked = (g.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") > 1).select("doc_id", "pos"))
    removed = (marked.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"),
                             F.col("pos") + (k - 1))).alias("p"))
        .distinct())
    rmc = removed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_rm"))
    docs = d.select("doc_id", "source", n.alias("n_tok"))
    return (docs.join(rmc, "doc_id", "left")
            .withColumn("n_rm", F.coalesce("n_rm", F.lit(0)))
            .groupBy("source")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.sum("n_tok").cast("bigint").alias("total_tokens"),
                 F.sum("n_rm").cast("bigint").alias("removed_tokens"),
                 F.sum(F.when(F.col("n_rm") > 0, 1).otherwise(0))
                 .cast("bigint").alias("docs_affected")))
