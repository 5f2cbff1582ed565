"""Final query registry: importing this module registers every query
from the operator/function modules into registry.QUERIES.

Registration ORDER matters: the driver's per-round CORRECTNESS gate
checks exactly the first 50 queries in registration order.  Rounds 1-2
proved the relational/extended basics green twice, so round 3 rotates
the never-driver-checked families (COLF, dedup, similarity, text/
quality, UDF, time-series, TPC-H, SCD2/temporal, audit, streaming)
into the 50-slot window via DRIVER_WINDOW below.  Everything stays
covered locally by tests/test_queries_oracle.py regardless of order.
"""

from __future__ import annotations

from . import operators  # noqa: F401
from . import functions  # noqa: F401
from .colf import roundtrip  # noqa: F401
from . import sources  # noqa: F401
from .streaming import stream_queries  # noqa: F401
from .registry import QUERIES, QuerySpec  # noqa: F401

# Round-3 driver window: 49 queries with no CORRECTNESS row yet, plus
# q33 (oracle-typing fix this round — kept in-window to prove it).
# Round-4 rotation note: q111-q133 (added during round 3) have no
# driver row yet — next round swap them plus the remaining unchecked
# families (q80-q84 streaming, q92-q94, q58/q59/q61/q64-q66/q72) into
# this window; everything below has its r03 green row by then.
DRIVER_WINDOW = [
    # COLF connector + ingest (the reference's core surface)
    "q70_colf_roundtrip", "q73_csv_ingest", "q75_colf_selective_read",
    "q76_colf_zonemap_pruning", "q109_colf_stream_agg", "q102_jsonl_ingest",
    # dedup family
    "q50_dedup_exact", "q51_ngram_jaccard", "q52_minhash_lsh",
    "q53_simhash", "q55_dedup_survivors", "q56_dedup_components",
    "q108_pagerank_integer",
    # similarity / ANN
    "q60_cosine_topk", "q54_embedding_neardup", "q62_ann_lsh", "q63_ann_ivf",
    # text analysis / quality / corpus ops
    "q40_token_count", "q41_text_quality", "q42_lang_stats",
    "q43_fingerprint", "q77_decontamination", "q78_tfidf_keywords",
    "q79_repetition_quality", "q85_shingle_dup_frac", "q87_bm25_search",
    "q86_corpus_shards", "q90_training_pipeline", "q91_hybrid_retrieval",
    # UDF / UDAF / UDTF / Arrow
    "q34_grouped_pandas_stats", "q35_udtf_tokenize",
    "q37_grouped_agg_pandas", "q57_mapinarrow_tokenstats",
    "q71_sequence_packing", "q74_cogroup_user_orders",
    "q69_multimodal_features",
    # time-series / warehouse maintenance
    "q95_gapfill_locf", "q96_median_mode", "q97_interval_overlap",
    "q98_fuzzy_blocked", "q99_sliding_window_batch", "q100_scd2_upsert",
    "q110_temporal_join", "q106_data_quality_audit", "q107_incremental_agg",
    # TPC-H trio
    "q103_tpch_q3", "q104_tpch_q7", "q105_tpch_q13",
    # streaming (highest-integration representatives; q109 above)
    "q101_stream_sliding",
    # re-prove the q33 oracle-typing fix
    "q33_sessionize",
]


def _reorder() -> None:
    window = [n for n in DRIVER_WINDOW if n in QUERIES]
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    rest = [n for n in QUERIES if n not in set(window)]
    ordered = {n: QUERIES[n] for n in window + rest}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()


def spark_queries():
    """name -> fn(spark, sf_dir) for __spark_entry__.queries()."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_queries():
    """name -> DuckDB SQL for __spark_entry__.oracle_sql() (only the
    SQL-expressible subset)."""
    return {name: spec.oracle for name, spec in QUERIES.items() if spec.oracle}
