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
    CORRECTNESS file it could have seen — byte-stable regeneration.
    A CORRECTNESS file from a round NEWER than the ledger's newest
    folded round is the driver's post-round output (it postdates the
    tree's last commit by construction) and is excluded here, exactly
    as tools/ledger.py --check excludes it (round-10 verdict item #1:
    the uncapped comparison failed every judged tree)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import ledger as ledger_mod

    with open(os.path.join(REPO, "LEDGER.json")) as f:
        committed = json.load(f)
    committed_max = max(v["round"] for v in committed.values())
    assert committed == ledger_mod.build_ledger(max_round=committed_max)


def test_ledger_check_tolerates_pending_round(tmp_path):
    """Simulate the judged tree: a CORRECTNESS file one round newer
    than LEDGER.json must NOT fail the gate (it is pending, not
    staleness). Run in a copied repo skeleton so the real tree is
    untouched."""
    import shutil

    work = tmp_path / "repo"
    (work / "tools").mkdir(parents=True)
    (work / "columnar_format_spark").mkdir()
    shutil.copy(os.path.join(REPO, "tools", "ledger.py"),
                work / "tools" / "ledger.py")
    for p in os.listdir(REPO):
        if re.match(r"CORRECTNESS_r\d+\.json$", p):
            shutil.copy(os.path.join(REPO, p), work / p)
    shutil.copy(os.path.join(REPO, "LEDGER.json"), work / "LEDGER.json")
    with open(os.path.join(REPO, "LEDGER.json")) as f:
        committed = json.load(f)
    committed_max = max(v["round"] for v in committed.values())
    # a fake next-round driver file that flips one query's status —
    # must still pass (pending), because the tree cannot have seen it
    some_q = sorted(committed)[0]
    fake = {some_q: {"rows_match": False, "schema_match": True,
                     "hash_match": False, "spark_rows": 0,
                     "oracle_rows": 1, "err": "simulated"}}
    with open(work / f"CORRECTNESS_r{committed_max + 1}.json", "w") as f:
        json.dump(fake, f)
    # minimal queries module so --check can import the registry
    reg = {q: None for q in committed}
    (work / "columnar_format_spark" / "__init__.py").write_text("")
    (work / "columnar_format_spark" / "queries.py").write_text(
        "import json, os\n"
        "_p = os.path.join(os.path.dirname(os.path.dirname("
        "os.path.abspath(__file__))), 'LEDGER.json')\n"
        "with open(_p) as f:\n"
        "    _led = json.load(f)\n"
        f"QUERIES = {{q: None for q in {sorted(reg)!r}}}\n"
        "WINDOW_SIZE = 50\n"
        "CHANGED_THIS_ROUND = []\n"
        "def driver_window():\n"
        "    new = [n for n in QUERIES if n not in _led]\n"
        "    failed = [n for n in QUERIES if n in _led and "
        "_led[n]['status'] == 'fail' and n not in set(new)]\n"
        "    head = set(new) | set(failed)\n"
        "    rest = sorted((n for n in QUERIES if n not in head),\n"
        "                  key=lambda n: (_led[n]['round'], n))\n"
        "    return (new + failed + rest)[:WINDOW_SIZE]\n"
        "_w = driver_window()\n"
        "_rest = [n for n in QUERIES if n not in set(_w)]\n"
        "QUERIES = {n: None for n in _w + _rest}\n")
    res = subprocess.run(
        [sys.executable, str(work / "tools" / "ledger.py"), "--check"],
        capture_output=True, text=True, timeout=300)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "pending" in res.stdout


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
