"""The rotation discipline, machine-checked (no Spark session needed).

The external driver gates exactly the first 50 registered queries each
round; tools/ledger.py regenerates LEDGER.json (each query's most
recent driver evidence) from the CORRECTNESS_r*.json files and
validates that the registry's generated window obeys the rotation
rule: no-evidence queries first, then latest-fail, then the declared
CHANGED_THIS_ROUND list, then oldest-evidence backfill — with no older
evidence stranded outside the window. These tests make a stale ledger
or a rule-violating window a red build instead of doc rot."""

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_ledger_check_passes():
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "ledger.py"),
         "--check"],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stdout + res.stderr


def test_ledger_matches_correctness_files():
    """LEDGER.json is exactly the per-query latest row across every
    CORRECTNESS file — byte-stable regeneration."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import ledger as ledger_mod

    with open(os.path.join(REPO, "LEDGER.json")) as f:
        committed = json.load(f)
    assert committed == ledger_mod.build_ledger()


def test_registry_leads_with_window():
    sys.path.insert(0, REPO)
    from columnar_format_spark.queries import (
        QUERIES,
        WINDOW_SIZE,
        driver_window,
    )

    window = driver_window()
    assert len(window) == WINDOW_SIZE
    assert list(QUERIES)[:WINDOW_SIZE] == window


def test_readme_query_count_is_live():
    """README's stated registry size must match the registry (the
    round-7..9 reviews caught this count rotting twice)."""
    sys.path.insert(0, REPO)
    from columnar_format_spark.queries import QUERIES

    with open(os.path.join(REPO, "README.md")) as f:
        text = f.read()
    m = re.search(r"`queries\(\)` \((\d+) named queries\)", text)
    assert m, "README no longer states the registry size"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} queries, registry has {len(QUERIES)}")


def test_docstring_query_count_is_live():
    """queries.py's own docstring count must match too (it rotted
    silently mid-round-10 when a text replace missed)."""
    sys.path.insert(0, REPO)
    import columnar_format_spark.queries as Q
    from columnar_format_spark.queries import QUERIES

    m = re.search(r"Registry size: (\d+) queries", Q.__doc__)
    assert m, "queries.py docstring no longer states the registry size"
    assert int(m.group(1)) == len(QUERIES), (
        f"docstring says {m.group(1)} queries, registry has "
        f"{len(QUERIES)}")
