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


@register(
    "q37_grouped_agg_pandas",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(round(value * 100, 0) AS BIGINT) * user_id) AS BIGINT)
             AS weighted_cents,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q37_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-AGGREGATE pandas UDF (one scalar out per group) — the
    third pandas UDF flavor after scalar (q62) and grouped-map (q34).
    The payload is a user_id-weighted cents total: integer arithmetic
    inside numpy, so any accumulation order gives the oracle's exact
    value. Spark refuses to mix grouped-agg pandas UDFs with built-in
    aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the
    row count is a second pandas UDF.

    Scale: the Python worker receives each group's column slices
    (Arrow-batched), not per-row calls; one shuffle on the group key.
    """
    import numpy as np

    # functionType passed explicitly: `from __future__ import
    # annotations` stringifies type hints, which breaks pandas_udf's
    # signature-based GROUPED_AGG inference
    @F.pandas_udf("bigint", F.PandasUDFType.GROUPED_AGG)
    def weighted_cents(value, user_id):
        cents = np.rint(value.to_numpy() * 100).astype(np.int64)
        return int((cents * user_id.to_numpy()).sum())

    @F.pandas_udf("bigint", F.PandasUDFType.GROUPED_AGG)
    def n_rows(value):
        return len(value)

    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        weighted_cents("value", "user_id").alias("weighted_cents"),
        n_rows("value").alias("n"),
    )


@register(
    "q57_mapinarrow_tokenstats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_unique
    FROM documents
    """,
)
def q57_mapinarrow_tokenstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics via mapInArrow: batches arrive as
    raw pyarrow RecordBatches (no pandas conversion at all) and leave
    the same way — the lowest-overhead Python extension point, the
    shape a tokenizer/codec integration takes (the Arrow buffers can be
    handed zero-copy to a native library). Exact integer outputs from a
    deterministic single-space split → oracle-exact.

    Scale: map-only (no shuffle); Arrow batch size bounds peak memory
    per worker regardless of partition size.
    """
    def stats(batches):
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        def distinct_len(toks: "pa.ListArray") -> "pa.Array":
            # distinct-per-list isn't in pyarrow.compute; a small pass
            # over the list offsets does it without per-row pandas
            offs = toks.offsets.to_numpy(zero_copy_only=False)
            vals = toks.values.to_pylist()
            out = np.empty(len(toks), dtype=np.int64)
            for i in range(len(toks)):
                out[i] = len(set(vals[offs[i]:offs[i + 1]]))
            return pa.array(out, type=pa.int64())

        for batch in batches:
            toks = pc.split_pattern(batch.column("text"), " ")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.list_value_length(toks), pa.int64()),
                    pc.cast(pc.utf8_length(batch.column("text")), pa.int64()),
                    distinct_len(toks),
                ],
                names=["doc_id", "n_tokens", "n_chars", "n_unique"],
            )

    d = spread(table(spark, sf_dir, "documents")).select("doc_id", "text")
    return d.mapInArrow(
        stats, "doc_id long, n_tokens long, n_chars long, n_unique long")


PACK_BUDGET = 512     # token budget per packed sequence
PACK_CHUNK = 100      # docs per packing shard (the parallelism unit)


@register(
    "q71_sequence_packing",
    oracle=f"""
    WITH RECURSIVE d AS (
      SELECT doc_id, doc_id // {PACK_CHUNK} AS chunk,
             len(string_split(text, ' ')) AS n,
             ROW_NUMBER() OVER (PARTITION BY doc_id // {PACK_CHUNK}
                                ORDER BY doc_id) AS rn
      FROM documents),
    walk(chunk, rn, doc_id, n, seq_no, acc) AS (
      SELECT chunk, rn, doc_id, n, 0, n FROM d WHERE rn = 1
      UNION ALL
      SELECT d.chunk, d.rn, d.doc_id, d.n,
             CASE WHEN w.acc + d.n > {PACK_BUDGET} THEN w.seq_no + 1
                  ELSE w.seq_no END,
             CASE WHEN w.acc + d.n > {PACK_BUDGET} THEN d.n
                  ELSE w.acc + d.n END
      FROM walk w JOIN d ON d.chunk = w.chunk AND d.rn = w.rn + 1)
    SELECT doc_id, chunk, seq_no,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(acc - n AS BIGINT) AS seq_offset
    FROM walk
    """,
)
def q71_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: documents packed in doc_id order into
    fixed token-budget sequences (per 100-doc shard), emitting each
    doc's sequence number and token offset — the batch-construction op
    between tokenization and training. Inherently sequential per shard
    (each doc's placement depends on the running remainder), so it runs
    as applyInPandas per chunk; the oracle is the same walk as a
    recursive CTE — an order-dependent iterative op, still checked
    exactly.

    Scale: shards pack independently (one shuffle on chunk id); the
    budget/shard-size dials trade packing efficiency against
    parallelism, exactly as in production packers.
    """
    import pandas as pd

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq, acc = 0, 0
        seqs, offs = [], []
        for n in pdf["n"]:
            if acc + n > PACK_BUDGET and acc > 0:
                seq, acc = seq + 1, 0
            seqs.append(seq)
            offs.append(acc)
            acc += n
        return pd.DataFrame({
            "doc_id": pdf["doc_id"], "chunk": pdf["chunk"],
            "seq_no": seqs, "n_tokens": pdf["n"], "seq_offset": offs,
        })

    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.floor(F.col("doc_id") / PACK_CHUNK).cast("bigint").alias("chunk"),
        F.size(F.split("text", " ")).cast("bigint").alias("n"),
    )
    return d.groupBy("chunk").applyInPandas(
        pack, "doc_id long, chunk long, seq_no int, n_tokens long, seq_offset long")


@register(
    "q74_cogroup_user_orders",
    oracle="""
    WITH e AS (
      SELECT user_id AS uid, COUNT(*) AS n_events,
             CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS event_cents
      FROM events GROUP BY user_id),
    o AS (
      SELECT o_custkey AS uid, COUNT(*) AS n_orders,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS BIGINT) AS order_cents
      FROM orders WHERE o_custkey < 150 GROUP BY o_custkey)
    SELECT COALESCE(e.uid, o.uid) AS user_id,
           COALESCE(n_events, 0) AS n_events,
           COALESCE(event_cents, 0) AS event_cents,
           COALESCE(n_orders, 0) AS n_orders,
           COALESCE(order_cents, 0) AS order_cents
    FROM e FULL OUTER JOIN o ON e.uid = o.uid
    """,
)
def q74_cogroup_user_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas — the remaining pandas extension-point
    flavor: both sides of a key arrive as two pandas DataFrames per
    group (events and orders for one user), the shape of custom
    entity-level merges (feature joins, reconciliation, per-user
    models) when a SQL join can't express the logic. The demo payload
    is integer-cents totals from both sides, so the oracle is the
    equivalent FULL OUTER JOIN of two aggregates.

    Scale: one shuffle per side on the key (same as the join Catalyst
    would plan); each cogroup must fit worker memory — per-entity
    groups, the same discipline as q34.
    """
    import numpy as np
    import pandas as pd

    def merge(ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        uid = ev["user_id"].iloc[0] if len(ev) else od["o_custkey"].iloc[0]
        ev_cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64).sum() if len(ev) else 0
        od_cents = od["cents"].to_numpy().sum() if len(od) else 0
        return pd.DataFrame({
            "user_id": [uid],
            "n_events": [len(ev)],
            "event_cents": [int(ev_cents)],
            "n_orders": [len(od)],
            "order_cents": [int(od_cents)],
        })

    ev = table(spark, sf_dir, "events").select("user_id", "value")
    od = table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 150).select(
        "o_custkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"))
    return ev.groupBy("user_id").cogroup(od.groupBy("o_custkey")).applyInPandas(
        merge,
        "user_id long, n_events long, event_cents long, n_orders long, order_cents long")
