"""Edge-case robustness: the dedup / text-analysis / fingerprint
queries must stay oracle-exact on adversarial corpora, not just the
generated testdata — empty and whitespace-only docs, single tokens,
unicode soup, and a flood of identical documents (the LSH junk-cluster
path).

Each case builds a crafted documents.parquet in a temp dir and runs
the same engine-vs-DuckDB comparison the driver runs.
"""

import os
import tempfile

import pandas as pd
import pytest

import columnar_format_spark.queries  # noqa: F401  (registers)
from columnar_format_spark.oracle import compare_query

TEXT_QUERIES = [
    "q40_token_count",
    "q41_text_quality",
    "q43_fingerprint",
    "q50_dedup_exact",
    "q51_ngram_jaccard",
    "q52_minhash_lsh",
    "q53_simhash",
    "q55_dedup_survivors",
    "q57_mapinarrow_tokenstats",
    "q58_ngram_vocabulary",
    "q59_length_histogram",
    "q114_pii_redaction",
    "q115_stratified_sample",
    "q116_doc_chunking",
    "q119_rare_bigram_score",
    "q120_graph_triangles",
    "q129_dedup_verified_pairs",
    "q130_frame_sampling",
    "q131_image_resize",
    "q132_negative_sampling",
    "q133_budget_selection",
    "q158_heavy_hitters",
]


def _stage_documents(texts: list[str]) -> str:
    d = tempfile.mkdtemp(prefix="edge_docs_")
    pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["probe"] * len(texts),
        "n_chars": [len(t) for t in texts],
    }).to_parquet(os.path.join(d, "documents.parquet"))
    return d


CORPORA = {
    "degenerate": [
        "a",                        # single token
        "a a a a a a a a",          # one repeated token
        "  leading and trailing  ",  # whitespace padding
        "word",
        "word",                      # exact duplicate pair
        "tabs\tand\nnewlines mixed",
        "punctuation!!! ??? ...",
    ],
    "unicode": [
        "héllo wörld ünïcode",
        "日本語 テキスト 処理",
        "mixed ascii と 日本語 and ümlauts",
        "emoji \U0001F600 in \U0001F680 text",
        "héllo wörld ünïcode",       # exact dup of row 0
    ],
    "identical_flood": ["copy pasta boilerplate text"] * 50 + [
        "one unique document among the flood",
        "another distinct text entirely different",
    ],
}


@pytest.mark.parametrize("corpus", sorted(CORPORA))
@pytest.mark.parametrize("name", TEXT_QUERIES)
def test_text_queries_on_crafted_corpora(spark, corpus, name):
    sf_dir = _stage_documents(CORPORA[corpus])
    res = compare_query(spark, sf_dir, name)
    assert res["ok"], res["notes"]
