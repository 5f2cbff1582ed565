"""Repetition-quality / sharding operators: hand-computed expectations
on crafted corpora, plus oracle-exactness on adversarial inputs (the
same engine-vs-DuckDB comparison the driver runs)."""

import os
import tempfile

import pandas as pd
import pytest

import columnar_format_spark.queries  # noqa: F401  (registers)
from columnar_format_spark.functions.quality import SHARD_CHARS
from columnar_format_spark.oracle import compare_query
from columnar_format_spark.registry import QUERIES


def _stage_documents(texts: list[str]) -> str:
    d = tempfile.mkdtemp(prefix="quality_docs_")
    pd.DataFrame({
        "doc_id": range(len(texts)),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["probe"] * len(texts),
        "n_chars": [len(t) for t in texts],
    }).to_parquet(os.path.join(d, "documents.parquet"))
    return d


def test_repetition_hand_computed(spark):
    # doc 0: "a b a b a" — tokens=5, bigrams [a b, b a, a b, b a]:
    # 4 total / 2 distinct -> dup=0.5; trigrams [a b a, b a b, a b a]:
    # 3 total / 2 distinct -> dup=1/3; top token 'a' 3/5.
    # doc 1: all distinct tokens -> zero dup fractions, top 1/4.
    # doc 2: single token -> no n-grams (guard path), top 1.0.
    sf = _stage_documents(["a b a b a", "w x y z", "solo"])
    rows = {r["doc_id"]: r for r in
            QUERIES["q79_repetition_quality"].fn(spark, sf).collect()}
    r0, r1, r2 = rows[0], rows[1], rows[2]
    assert r0["n_tokens"] == 5
    assert r0["dup_2gram_frac"] == pytest.approx(0.5)
    assert r0["dup_3gram_frac"] == pytest.approx(1 / 3)
    assert r0["top_token_frac"] == pytest.approx(3 / 5)
    assert r1["dup_2gram_frac"] == 0.0 and r1["top_token_frac"] == pytest.approx(0.25)
    assert r2["n_tokens"] == 1
    assert r2["dup_2gram_frac"] == 0.0 and r2["dup_3gram_frac"] == 0.0
    assert r2["top_token_frac"] == pytest.approx(1.0)


def test_shingle_dup_hand_computed(spark):
    # Two docs share their full 8-token text (1 shingle each, duplicated
    # across docs); a third is unique; a fourth is too short to shingle.
    eight = "t1 t2 t3 t4 t5 t6 t7 t8"
    sf = _stage_documents([eight, eight, "u1 u2 u3 u4 u5 u6 u7 u8", "short doc"])
    [row] = QUERIES["q85_shingle_dup_frac"].fn(spark, sf).collect()
    assert row["total_shingles"] == 3
    assert row["dup_shingles"] == 2
    assert row["dup_frac"] == pytest.approx(2 / 3)


def test_corpus_shards_partition_docs_exactly(spark, tmp_path):
    # Shards partition the corpus: every doc lands in exactly one shard
    # and per-shard char totals sum to the corpus total. Packing is
    # greedy, so a shard overflows only by its last doc: the running
    # sum *before* that doc is < SHARD_CHARS past the shard boundary.
    sf = "/root/testdata/sf0.001"
    df = QUERIES["q86_corpus_shards"].fn(spark, sf).collect()
    import duckdb
    n_docs, total = duckdb.sql(
        f"SELECT count(*), sum(n_chars) FROM '{sf}/documents.parquet'"
    ).fetchone()
    assert sum(r["n_docs"] for r in df) == n_docs
    assert sum(r["total_chars"] for r in df) == total
    for r in df:
        # every shard starts below the boundary: chars minus its last
        # doc can't already exceed SHARD_CHARS unless it's one big doc
        assert r["n_docs"] == 1 or r["total_chars"] < 2 * SHARD_CHARS


@pytest.mark.parametrize("texts", [
    ["", "   ", "x"],                      # empty / whitespace-only docs
    ["a " * 500, "a"],                     # one maximally repetitive doc
    ["tok"] * 12,                          # identical flood
], ids=["blank", "repeat500", "flood"])
@pytest.mark.parametrize("name", ["q79_repetition_quality", "q85_shingle_dup_frac"])
def test_quality_oracle_on_adversarial_corpora(spark, name, texts):
    res = compare_query(spark, _stage_documents(texts), name)
    assert res["ok"], res["notes"]


def test_bm25_ranks_matching_docs(spark):
    # Docs mentioning more query terms more often (relative to length)
    # must outrank sparse mentions; docs with no query term are absent.
    sf = _stage_documents([
        "spark hash window merge",          # all 4 terms, short -> top
        "spark spark spark",                # one term, repeated
        "nothing relevant here at all",     # no terms -> excluded
        "spark " + "filler " * 50,          # term diluted by length
    ])
    rows = QUERIES["q87_bm25_search"].fn(spark, sf).collect()
    ids = [r["doc_id"] for r in rows]
    assert 2 not in ids
    assert ids[0] == 0
    scores = {r["doc_id"]: r["score"] for r in rows}
    assert scores[1] > scores[3]  # length normalization penalizes doc 3
    assert [r["rnk"] for r in rows] == sorted(r["rnk"] for r in rows)


def test_bm25_oracle_on_adversarial_corpus(spark):
    texts = ["spark"] * 5 + ["", "  ", "spark hash"] + ["merge window"] * 3
    res = compare_query(spark, _stage_documents(texts), "q87_bm25_search")
    assert res["ok"], res["notes"]


def test_right_cross_join_preserves_empty_nations(spark):
    # Every non-AFRICA (region, nation) pair appears even with zero
    # suppliers, and AFRICA pairs appear with zero (join condition
    # excludes their suppliers, the right side preserves the rows).
    rows = QUERIES["q88_right_cross_join"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 125
    africa = [r for r in rows if r["r_name"] == "AFRICA"]
    assert len(africa) == 25 and all(r["n_suppliers"] == 0 for r in africa)


def test_hybrid_retrieval_fuses_both_rankers(spark):
    # RRF output must contain docs from both rankers and score docs
    # found by both above the tail of either single list.
    from columnar_format_spark.functions.quality import RRF_K

    rows = QUERIES["q91_hybrid_retrieval"].fn(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 10
    assert all(r["rnk_sparse"] is not None or r["rnk_dense"] is not None for r in rows)
    for r in rows:
        expect = (1 / (RRF_K + r["rnk_sparse"]) if r["rnk_sparse"] else 0.0) + \
                 (1 / (RRF_K + r["rnk_dense"]) if r["rnk_dense"] else 0.0)
        assert r["rrf"] == pytest.approx(expect, abs=0)
    rrfs = [r["rrf"] for r in rows]
    assert rrfs == sorted(rrfs, reverse=True)


def _stage_events(rows) -> str:
    d = tempfile.mkdtemp(prefix="funnel_events_")
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(os.path.join(d, "events.parquet"))
    return d


def test_funnel_hand_computed(spark):
    # user 1: full ordered funnel; user 2: click BEFORE first view
    # (fails stage 2 by first-touch semantics); user 3: view only;
    # user 4: no view at all (click/purchase don't count).
    sf = _stage_events([
        (1, "2024-01-01 10:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-01 10:00:30", 1, "click", 0.0, "{}"),
        (3, "2024-01-01 11:00:00", 1, "purchase", 9.0, "{}"),
        (4, "2024-01-02 09:00:00", 2, "click", 0.0, "{}"),
        (5, "2024-01-02 10:00:00", 2, "view", 0.0, "{}"),
        (6, "2024-01-03 08:00:00", 3, "view", 0.0, "{}"),
        (7, "2024-01-04 08:00:00", 4, "click", 0.0, "{}"),
        (8, "2024-01-04 09:00:00", 4, "purchase", 5.0, "{}"),
    ])
    [row] = QUERIES["q92_funnel"].fn(spark, sf).collect()
    assert row["n_users"] == 4
    assert row["n_view"] == 3
    assert row["n_view_click"] == 1
    assert row["n_full_funnel"] == 1
    assert row["avg_view_to_click_s"] == pytest.approx(30.0)


def test_retention_hand_computed(spark):
    # cohort 01-01: users 1,2; user 1 returns on day 2 (D1) and day 8
    # (D7); user 2 returns only day 3 (neither D1 nor D7).
    sf = _stage_events([
        (1, "2024-01-01 10:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-02 10:00:00", 1, "click", 0.0, "{}"),
        (3, "2024-01-08 10:00:00", 1, "view", 0.0, "{}"),
        (4, "2024-01-01 12:00:00", 2, "view", 0.0, "{}"),
        (5, "2024-01-03 12:00:00", 2, "view", 0.0, "{}"),
        (6, "2024-01-05 00:00:00", 3, "view", 0.0, "{}"),
    ])
    rows = {r["cohort"]: r for r in QUERIES["q93_retention"].fn(spark, sf).collect()}
    c = rows["2024-01-01"]
    assert (c["cohort_size"], c["d1_retained"], c["d7_retained"]) == (2, 1, 1)
    assert rows["2024-01-05"]["cohort_size"] == 1
    assert rows["2024-01-05"]["d1_retained"] == 0


@pytest.mark.parametrize("name", ["q92_funnel", "q93_retention"])
def test_event_analytics_oracle_on_crafted_events(spark, name):
    # single-event users, same-second funnel steps, and a user whose
    # only activity is the cohort day itself
    sf = _stage_events([
        (1, "2024-01-01 00:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-01 00:00:00", 1, "click", 0.0, "{}"),
        (3, "2024-01-01 00:00:00", 1, "purchase", 1.0, "{}"),
        (4, "2024-01-02 23:59:59", 2, "error", 0.0, "{}"),
        (5, "2024-01-09 00:00:00", 2, "view", 0.0, "{}"),
    ])
    res = compare_query(spark, sf, name)
    assert res["ok"], res["notes"]


def test_repetition_matches_pure_python_on_random_corpus(spark):
    # Differential check against an independent pure-Python
    # implementation on a seeded random corpus (wider coverage than
    # the hand-computed cases; deterministic, so failures reproduce).
    import random

    rng = random.Random(20260813)
    vocab = ["aa", "bb", "cc", "dd", "e"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randint(1, 40)))
             for _ in range(120)]

    def py_metrics(text):
        toks = text.split(" ")
        n = len(toks)
        g2 = [" ".join(toks[i:i + 2]) for i in range(n - 1)] if n >= 2 else []
        g3 = [" ".join(toks[i:i + 3]) for i in range(n - 2)] if n >= 3 else []
        dup = lambda g: (len(g) - len(set(g))) / len(g) if g else 0.0  # noqa: E731
        top = max(toks.count(u) for u in set(toks)) / n
        return n, dup(g2), dup(g3), top

    sf = _stage_documents(texts)
    rows = {r["doc_id"]: r for r in
            QUERIES["q79_repetition_quality"].fn(spark, sf).collect()}
    assert len(rows) == len(texts)
    for i, t in enumerate(texts):
        n, d2, d3, top = py_metrics(t)
        r = rows[i]
        assert r["n_tokens"] == n
        assert r["dup_2gram_frac"] == pytest.approx(d2, abs=1e-15)
        assert r["dup_3gram_frac"] == pytest.approx(d3, abs=1e-15)
        assert r["top_token_frac"] == pytest.approx(top, abs=1e-15)


def test_variance_outliers_hand_computed(spark):
    # values 1..5 for type A: mean 3, pop-var 2; one 100.0 outlier in
    # type B shifts its stats but 4 identical values give var from a
    # known closed form.
    sf = _stage_events(
        [(i, f"2024-01-01 00:00:{i:02d}", i, "A", float(v), "{}")
         for i, v in enumerate([1, 2, 3, 4, 5])]
        + [(10 + i, f"2024-01-02 00:00:{i:02d}", 50 + i, "B", v, "{}")
           for i, v in enumerate([10.0, 10.0, 10.0, 10.0, 100.0])]
    )
    rows = {r["event_type"]: r for r in
            QUERIES["q94_variance_outliers"].fn(spark, sf).collect()}
    a = rows["A"]
    assert a["n_events"] == 5
    assert a["mean_value"] == pytest.approx(3.0)
    assert a["var_value"] == pytest.approx(2.0)
    assert a["stddev_value"] == pytest.approx(2.0 ** 0.5)
    assert a["n_outliers_3s"] == 0
    b = rows["B"]
    assert b["mean_value"] == pytest.approx(28.0)
    # var = (4*18² + 72²)/5 = 1296; 100 is 72 > 3*36 cents... check: std=36
    assert b["var_value"] == pytest.approx(1296.0)
    assert b["stddev_value"] == pytest.approx(36.0)
    assert b["n_outliers_3s"] == 0  # |100-28| = 72 < 3*36 = 108


def test_variance_oracle_on_crafted_events(spark):
    # single-event groups (var 0, sqrt(0) path) and extreme spread
    sf = _stage_events([
        (1, "2024-01-01 00:00:00", 1, "solo", 42.5, "{}"),
        (2, "2024-01-01 00:00:01", 2, "wide", 0.01, "{}"),
        (3, "2024-01-01 00:00:02", 3, "wide", 490.02, "{}"),
        (4, "2024-01-01 00:00:03", 4, "wide", 0.01, "{}"),
    ])
    res = compare_query(spark, sf, "q94_variance_outliers")
    assert res["ok"], res["notes"]


def test_exact_substring_dedup_known_spans(spark, tmp_path):
    """q191 on a crafted corpus with a KNOWN duplicated 8-token span:
    the first occurrence survives, every other occurrence is excised,
    and a doc with no duplicated span loses nothing."""
    import pandas as pd

    from columnar_format_spark.registry import QUERIES

    span = "a b c d e f g h"                     # the duplicated span
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "source": ["s", "s", "s"],
        "text": [
            f"{span} tail1 tail2",               # first occurrence: kept
            f"lead1 lead2 {span} tail3",         # dup: 8 tokens excised
            "q r s t u v w x y z",               # unique: untouched
        ],
    })
    d = str(tmp_path)
    docs.to_parquet(f"{d}/documents.parquet")
    row = QUERIES["q191_exact_substring_dedup"].fn(spark, d).first()
    assert row["n_docs"] == 3
    assert row["total_tokens"] == 10 + 11 + 10
    assert row["removed_tokens"] == 8            # only doc 2's copy
    assert row["docs_affected"] == 1
