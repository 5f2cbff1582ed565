"""Final query registry: importing this module registers every query
from the operator/function modules into registry.QUERIES.

Registration ORDER matters: the driver's per-round CORRECTNESS gate
checks exactly the first 50 queries in registration order; the
DRIVER_WINDOW list below picks them under a standing rotation rule:
(1) queries with no driver row yet, (2) queries whose oracle or plan
changed this round, (3) backfill by oldest green evidence first.
Everything stays covered locally by tests/test_queries_oracle.py
(sf0.001, every query, every run) regardless of order; rounds 5, 6
and 7 additionally verified the ENTIRE registry driver-style at
sf0.01 AND sf0.1 with zero failures (tools/sweep_oracle.py) before
shipping the window — round 7 ran the sf0.01 full sweep twice (once
after the last writer change) and covered all 181 at sf0.1 across
four targeted sweeps.

Registry size: 182 queries (q01-q183, no q123). Round-6 additions were
q169-q174 (layout/metadata tier); round-7 additions are q175-q178 —
TPC-H Q2/Q11/Q12/Q20, completing the full 22-query TPC-H suite (Q1=q01,
Q14=q72; partsupp-dependent shapes adapted via a lineitem-derived
supply relation, see operators/tpch.py) — q179 (partition-spec
evolution: Iceberg-style spec-as-table-metadata with per-file layout
coexistence and compact()-to-latest-spec), q180 (bucket(N,col)
transform partitioning with reader-side probe-to-bucket pruning),
q181 (spec-aware partitions metadata table over a mixed layout), and
q182 (recorded sort orders: in-file-sorted writes, compact() re-clusters
by the recorded order instead of scrambling it), and q183 (row-accurate
snapshot diff between table versions via time travel + exceptAll).
"""

from __future__ import annotations

from . import operators  # noqa: F401
from . import functions  # noqa: F401
from .colf import roundtrip  # noqa: F401
from . import sources  # noqa: F401
from .streaming import stream_queries  # noqa: F401
from .registry import QUERIES, QuerySpec  # noqa: F401

# Round-7 driver window, per the rotation discipline (oldest evidence
# first; every changed query re-proves itself the round it changes):
# - the 9 round-7 additions with no driver row yet: q175-q178 (TPC-H
#   Q2/Q11/Q12/Q20 — full 22-query suite), q179 (partition-spec
#   evolution), q180 (bucket-transform partitioning), q181 (spec-aware
#   partition stats), q182 (recorded sort orders), q183 (snapshot
#   diff);
# - the 3 queries whose staging/write path changed this round: q169
#   (cached projection + one two-column approxQuantile pass), q170 and
#   q171 (the writer now records the partition spec in the snapshot
#   log, and maintenance rewrites consult it);
# - 34 backfill slots: the ENTIRE r03-era cohort (last driver row in
#   CORRECTNESS_r03 — the oldest evidence in the ledger): q33-q35,
#   q37, q40-q43, q51-q57, q69, q71, q74, q77-q79, q85, q91, q95-q98,
#   q100, q102, q103, q105, q106, q108, q110;
# - 4 remaining slots: r04-era, lowest query number first (q44, q50,
#   q58, q59).
# Per-query last-green ledger after round 6 (CORRECTNESS_r06 50/50
# green): r06 = the full round-6 window (q169-q174, q148/q149/q155/
# q161/q164-q168, q15-q32, q36, q38, q39, q45-q49, q64-q66, q72, q88,
# q89, q92-q94); r05 = q137-q168 cohort not re-proven in r06, plus
# q01-q14, q62, q63, q87, q128; r03 = the 34 above; r04 = everything
# else. Round-8 plan: backfill the remaining r04-era set (q60, q61, q67, q68, q70, q73,
# q75, q76, q80-q84, q86, q90, q99, q101, q104, q107, q109, q111-q122,
# q124-q127, q129-q136), oldest first, then r05-era.
DRIVER_WINDOW = [
    # new this round — no driver row yet
    "q175_tpch_q2", "q176_tpch_q11", "q177_tpch_q12", "q178_tpch_q20",
    "q179_colf_spec_evolution", "q180_colf_bucket_transform",
    "q181_partition_stats_evolved", "q182_colf_sorted_maintenance",
    "q183_colf_snapshot_diff",
    # changed this round — spec-recording writes / staging path
    "q169_zorder_rank", "q170_colf_size_compact", "q171_colf_partitioned",
    # oldest-evidence backfill: the whole r03-era cohort
    "q33_sessionize", "q34_grouped_pandas_stats", "q35_udtf_tokenize",
    "q37_grouped_agg_pandas", "q40_token_count", "q41_text_quality",
    "q42_lang_stats", "q43_fingerprint", "q51_ngram_jaccard",
    "q52_minhash_lsh", "q53_simhash", "q54_embedding_neardup",
    "q55_dedup_survivors", "q56_dedup_components",
    "q57_mapinarrow_tokenstats", "q69_multimodal_features",
    "q71_sequence_packing", "q74_cogroup_user_orders",
    "q77_decontamination", "q78_tfidf_keywords", "q79_repetition_quality",
    "q85_shingle_dup_frac", "q91_hybrid_retrieval", "q95_gapfill_locf",
    "q96_median_mode", "q97_interval_overlap",
    "q98_fuzzy_blocked", "q100_scd2_upsert",
    "q102_jsonl_ingest", "q103_tpch_q3", "q105_tpch_q13",
    "q106_data_quality_audit", "q108_pagerank_integer",
    "q110_temporal_join",
    # r04-era, oldest first
    "q44_multimodal_meta", "q50_dedup_exact", "q58_ngram_vocabulary",
    "q59_length_histogram",
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
