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

# Round-4 driver window: the 34 queries that have never had a driver
# CORRECTNESS row (everything added in round 3 plus the q44/q58/q59/
# q61/q67/q68 and q80-q84 stragglers), the 4 COLF batch retests (red
# in r03 on the pushdown-conf bug — fixed in datasource.register(),
# kept in-window to prove it), the new q135 ANN-recall audit, and 11
# high-integration repeats (the four r03 bench-regression queries
# among them, so their driver rows double as fresh evidence).
# After this round every registered query has ≥1 green driver row.
DRIVER_WINDOW = [
    # COLF batch retests — r03's four red rows, one shared root cause
    "q70_colf_roundtrip", "q73_csv_ingest", "q75_colf_selective_read",
    "q76_colf_zonemap_pruning",
    # COLF data-management layer (added r03, never driver-checked)
    "q112_colf_compact", "q122_colf_time_travel", "q134_colf_incremental_read",
    # streaming (never driver-checked)
    "q80_stream_tumbling", "q81_stream_session", "q82_stream_dedup",
    "q83_stream_stateful", "q84_stream_stream_join",
    "q127_stream_incremental_dedup",
    # dedup / graph (never driver-checked)
    "q111_dedup_keep_best", "q113_incremental_dedup", "q120_graph_triangles",
    "q129_dedup_verified_pairs",
    # pipeline ops (never driver-checked; q132 re-done this round)
    "q114_pii_redaction", "q115_stratified_sample", "q116_doc_chunking",
    "q117_percentile_exact", "q118_skew_exact_distinct",
    "q119_rare_bigram_score", "q121_strict_funnel", "q128_percentile_sketch",
    "q132_negative_sampling", "q133_budget_selection",
    # TPC-H additions (never driver-checked)
    "q124_tpch_q5", "q125_tpch_q10", "q126_tpch_q18",
    # text / embedding / sampling stragglers (never driver-checked)
    "q44_multimodal_meta", "q58_ngram_vocabulary", "q59_length_histogram",
    "q61_embedding_stats", "q67_deterministic_split", "q68_corpus_mixture",
    # multimodal (never driver-checked)
    "q130_frame_sampling", "q131_image_resize",
    # NEW this round: ANN recall audit + vacuum retention, both with
    # exact oracles
    "q135_ann_recall", "q136_colf_vacuum",
    # high-integration repeats + r03 bench-regression re-evidence
    "q109_colf_stream_agg", "q101_stream_sliding", "q52_minhash_lsh",
    "q90_training_pipeline", "q50_dedup_exact", "q99_sliding_window_batch",
    "q104_tpch_q7", "q107_incremental_agg", "q60_cosine_topk",
    "q86_corpus_shards",
]

# Round-5 rotation plan: the queries ADDED in round 4 have no driver
# row yet — q137 (COLF v2 round-trip), q138-q147 (TPC-H Q4/Q6/Q8/Q9/
# Q15/Q16/Q17/Q19/Q21/Q22), q148 (CoW delete), q149 (CoW merge),
# q150 (OOV rate), q151 (kNN labeling). Rotate all 15 into the next
# window, backfill the remaining 35 slots with the queries whose last
# green row is oldest (r01/r02 era first).


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
