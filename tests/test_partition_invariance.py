"""Partition-invariance: results must be byte-identical under any
shuffle width / input partitioning. This is the determinism property
SCALING.md §5 claims — it is what makes speculative execution and
stage retries safe at 1000-executor scale, and it is exactly where
naive implementations break (IEEE sum order, hash()-derived sketches,
untied top-k).

The probe: run each hash-sensitive query under two very different
shuffle widths (3 vs the session default) and with the input
pre-scattered into ragged partitions, then compare canonicalized
results exactly.
"""

import pytest

import columnar_format_spark.queries  # noqa: F401  (registers)
from columnar_format_spark.registry import QUERIES

from tests.conftest import SF_SMALL

# The queries whose implementations contain the determinism traps:
# exact-cents money sums (q01), md5-derived sketches and salts
# (q52/q67/q18), bucketed running structure (q86), window sessionizing
# on ties (q33), LOCF fill (q95), median interpolation + mode
# tie-break (q96), iterative integer rank propagation (q108).
PROBES = [
    "q01_pricing_summary",
    "q18_salted_skew_join",
    "q33_sessionize",
    "q52_minhash_lsh",
    "q67_deterministic_split",
    "q86_corpus_shards",
    "q95_gapfill_locf",
    "q96_median_mode",
    "q108_pagerank_integer",
    # keep-best survivor choice rides on window tiebreaks over iterative
    # component labels; incremental dedup on md5 split + min-id windows
    "q111_dedup_keep_best",
    "q113_incremental_dedup",
]


def _canon(df):
    cols = sorted(df.columns)
    rows = [tuple(row[c] for c in cols) for row in df.select(*cols).collect()]
    return sorted(rows, key=repr)


@pytest.mark.parametrize("name", PROBES)
def test_result_is_shuffle_width_invariant(spark, name):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        narrow = _canon(QUERIES[name].fn(spark, SF_SMALL))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    wide = _canon(QUERIES[name].fn(spark, SF_SMALL))
    assert narrow == wide
