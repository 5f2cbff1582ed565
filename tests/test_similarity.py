"""Similarity-search quality checks beyond the oracle gate."""

import columnar_format_spark.queries  # noqa: F401  (registers queries)

from tests.conftest import SF_SMALL


def test_ann_recall_vs_exact(spark):
    """LSH-bucketed ANN must recover a reasonable share of the exact
    top-k pairs (8 hyperplanes / 256 buckets on 500 vectors is a
    coarse index; recall is traded for a 256x candidate reduction)."""
    from columnar_format_spark.registry import QUERIES

    exact = QUERIES["q60_cosine_topk"].fn(spark, SF_SMALL).collect()
    approx = QUERIES["q62_ann_lsh"].fn(spark, SF_SMALL).collect()
    exact_pairs = {(r["qid"], r["cid"]) for r in exact}
    approx_pairs = {(r["qid"], r["cid"]) for r in approx}
    assert exact_pairs, "exact baseline empty"
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.2, f"ANN recall collapsed: {recall}"
    # every ANN hit must be a genuine neighbor score (cosine in [-1,1])
    assert all(-1.0 <= r["cosine"] <= 1.0 for r in approx)


def test_minhash_candidates_are_sparse(spark):
    """LSH candidates must prune the pair space, not reproduce it."""
    from columnar_format_spark.registry import QUERIES, table

    n_docs = table(spark, SF_SMALL, "documents").count()
    n_pairs = n_docs * (n_docs - 1) // 2
    cands = QUERIES["q52_minhash_lsh"].fn(spark, SF_SMALL).count()
    assert cands < 0.2 * n_pairs, (cands, n_pairs)


def test_ivf_recall_vs_exact(spark):
    """q63's audit row must self-certify (the in-query bound checks
    the driver oracle pins to true) with consistent exact counts."""
    from columnar_format_spark.functions.similarity import TOP_K
    from columnar_format_spark.registry import QUERIES

    rows = QUERIES["q63_ann_ivf"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_queries"] == 10
    assert r["exact_pairs"] == r["n_queries"] * TOP_K
    assert r["recall_met"], "IVF recall fell below the audited floor"
    assert r["probe_cost_met"], "IVF probed more than the audited ceiling"


def test_ann_recall_audit_counts(spark):
    """q135's integer-LSH audit must report a real recall signal: every
    query has exact_k = TOP_K ground-truth rows, hits is bounded by
    both exact_k and the candidate count, at least some queries score a
    hit, and the candidate sets genuinely prune (no query's candidate
    set is the whole corpus)."""
    from columnar_format_spark.functions.similarity import TOP_K
    from columnar_format_spark.registry import QUERIES, table

    n_vecs = table(spark, SF_SMALL, "embeddings").count()
    rows = QUERIES["q135_ann_recall"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 10
    assert all(r["exact_k"] == TOP_K for r in rows)
    assert all(0 <= r["hits"] <= min(r["exact_k"], r["n_candidates"])
               for r in rows)
    assert sum(r["hits"] for r in rows) > 0, "integer LSH found nothing"
    assert all(r["n_candidates"] < n_vecs - 1 for r in rows), "no pruning"


def test_pq_fit_is_deterministic_and_shaped():
    import numpy as np

    from columnar_format_spark.functions.similarity import (
        PQ_K, PQ_M, _pq_fit)

    rng = np.random.default_rng(11)
    X = rng.normal(size=(300, 64))
    a, b = _pq_fit(X.copy()), _pq_fit(X.copy())
    assert len(a) == PQ_M
    for Ca, Cb in zip(a, b):
        assert Ca.shape == (PQ_K, 64 // PQ_M)
        assert np.array_equal(Ca, Cb), "codebook fit is not deterministic"
    # no empty-cluster NaNs even on degenerate (constant) input
    for C in _pq_fit(np.zeros((50, 64))):
        assert np.isfinite(C).all()


def test_pq_query_meets_bounds(spark):
    from columnar_format_spark.registry import QUERIES

    r = QUERIES["q165_ann_pq"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_queries"] == 10 and r["exact_pairs"] == 50
    assert r["compression_ratio"] == 16.0
    assert r["recall_met"], "PQ->ADC->rerank recall fell below the floor"
    assert r["shortlist_cost_met"]


def test_ivfpq_query_meets_bounds(spark):
    from columnar_format_spark.registry import QUERIES

    r = QUERIES["q166_ann_ivfpq"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_queries"] == 10 and r["exact_pairs"] == 50
    assert r["recall_met"], "IVF-PQ recall fell below the floor"
    assert r["cand_cost_met"], "IVF-PQ scanned more than the ceiling"


def test_persisted_index_meets_bounds(spark):
    from columnar_format_spark.registry import QUERIES

    r = QUERIES["q168_ann_index_colf"].fn(spark, SF_SMALL).collect()[0]
    assert r["n_queries"] == 10 and r["exact_pairs"] == 50
    assert r["recall_met"], "persisted-index recall fell below the floor"
    assert r["cand_cost_met"]


def test_pca_recovers_planted_low_rank(spark, tmp_path):
    """q190's fit on EXACTLY rank-3 data: the residual eigenvalue sum
    is ~0, so reconstruction error must be ~0 and the audit booleans
    all hold — a broken covariance fold or projection fails loudly."""
    import numpy as np
    import pandas as pd

    from columnar_format_spark.registry import QUERIES

    rng = np.random.RandomState(7)
    basis = np.linalg.qr(rng.randn(64, 3))[0]        # 64x3 orthonormal
    coords = rng.randn(400, 3) * [5.0, 2.0, 0.5]
    emb = (coords @ basis.T).astype(np.float32)      # exactly rank 3
    d = str(tmp_path)
    pd.DataFrame({
        "vec_id": np.arange(400, dtype=np.int64),
        "embedding": [row.tolist() for row in emb],
        "label": np.zeros(400, dtype=np.int32),
    }).to_parquet(f"{d}/embeddings.parquet")

    row = QUERIES["q190_embedding_pca"].fn(spark, d).first()
    assert row["n_vectors"] == 400 and row["n_projected"] == 400
    assert row["orthonormal_ok"] and row["variance_order_ok"]
    assert row["variance_share_ok"] and row["reconstruction_ok"]
