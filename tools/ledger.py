#!/usr/bin/env python
"""Machine-checked driver-evidence ledger.

The external driver runs the FIRST 50 registered queries each round and
records per-query pass/fail in CORRECTNESS_r{N}.json. The rotation
discipline — every query re-proves itself at a bounded staleness — used
to live as prose in queries.py's docstring, which the round-9 review
flagged as rot-prone. This tool makes it executable:

  python tools/ledger.py          # regenerate LEDGER.json from the
                                  # CORRECTNESS_r*.json files
  python tools/ledger.py --check  # verify the committed LEDGER.json
                                  # matches a fresh regeneration AND the
                                  # registry's window obeys the rotation
                                  # rules (exit 1 on any violation)

LEDGER.json maps each query to its most recent driver evidence:
{"q01_pricing_summary": {"round": 9, "status": "pass"}, ...}. The
driver window itself is GENERATED from this file (queries.py
_driver_window): no-evidence queries first, then the declared
CHANGED_THIS_ROUND re-prove list, then everything else oldest-evidence
first — so the 50 driver slots always hit the queries whose evidence is
newest-needed, and the ledger can't silently diverge from the window.
"""
from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LEDGER_PATH = os.path.join(REPO, "LEDGER.json")


def correctness_files() -> list:
    files = []
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if m:
            files.append((int(m.group(1)), p))
    return sorted(files)


def build_ledger(max_round: int | None = None) -> dict:
    """Latest driver evidence per query, from every CORRECTNESS file
    present (ascending round order, so later rounds win). With
    max_round, only fold files from rounds <= max_round — used by
    --check to ignore a CORRECTNESS file the driver wrote AFTER the
    tree's last commit (it is 'pending', not evidence of staleness)."""
    files = correctness_files()
    if max_round is not None:
        files = [(r, p) for r, p in files if r <= max_round]
    ledger: dict = {}
    for rnd, p in sorted(files):
        with open(p) as f:
            rows = json.load(f)
        for q, rec in rows.items():
            ok = (rec.get("err") is None and rec.get("rows_match")
                  and rec.get("schema_match") is not False
                  and rec.get("hash_match") is not False)
            ledger[q] = {"round": rnd, "status": "pass" if ok else "fail"}
    return ledger


def check() -> int:
    sys.path.insert(0, REPO)
    from columnar_format_spark.queries import (
        CHANGED_THIS_ROUND,
        QUERIES,
        WINDOW_SIZE,
        driver_window,
    )

    problems = []
    try:
        with open(LEDGER_PATH) as f:
            committed = json.load(f)
    except OSError:
        committed = None
        problems.append("LEDGER.json missing — run: python tools/ledger.py")
    # The driver writes CORRECTNESS_r{N}.json AFTER the round's last
    # commit, so on the judged tree there is always one file newer than
    # LEDGER.json's newest folded round. That file is PENDING evidence
    # for the NEXT regeneration, not proof of staleness — compare the
    # committed ledger only against the rounds it could have seen.
    # (Round-10 verdict item #1: the old exact comparison failed the
    # gate on every judged tree by construction.)
    committed_max = max((v["round"] for v in (committed or {}).values()),
                        default=0)
    pending = [r for r, _ in correctness_files() if r > committed_max]
    fresh = build_ledger(max_round=committed_max if committed else None)
    if pending:
        print(f"ledger check: CORRECTNESS rounds {pending} postdate "
              f"LEDGER.json (round {committed_max}) — pending, will "
              f"fold at next regeneration")
    if committed is not None and committed != fresh:
        gone = sorted(set(committed) - set(fresh))
        new = sorted(set(fresh) - set(committed))
        moved = sorted(q for q in set(fresh) & set(committed)
                       if fresh[q] != committed[q])
        problems.append(
            f"LEDGER.json is stale (regenerate with tools/ledger.py): "
            f"missing={gone[:5]} new={new[:5]} changed={moved[:5]}")
    window = driver_window()
    names = list(QUERIES)
    # rule 1: the registry is ordered window-first (the driver takes
    # the first WINDOW_SIZE queries)
    if names[:len(window)] != window:
        problems.append("registry order does not lead with the window")
    # rule 2: every query with NO driver evidence is in the window
    no_evidence = [q for q in names if q not in fresh]
    missing = [q for q in no_evidence if q not in set(window)]
    if missing:
        problems.append(f"no-evidence queries outside the window: {missing}")
    # rule 3: every latest-evidence FAILURE re-proves this round
    failed = [q for q, v in fresh.items()
              if v["status"] == "fail" and q in QUERIES]
    missing = [q for q in failed if q not in set(window)]
    if missing:
        problems.append(f"latest-fail queries outside the window: {missing}")
    # rule 4: every declared changed query is registered and windowed
    bogus = [q for q in CHANGED_THIS_ROUND if q not in QUERIES]
    if bogus:
        problems.append(f"CHANGED_THIS_ROUND names not registered: {bogus}")
    out = [q for q in CHANGED_THIS_ROUND
           if q in QUERIES and q not in set(window)]
    if out:
        problems.append(f"changed queries squeezed out of the window: {out}")
    # rule 5: the backfill is oldest-evidence-first — no query OUTSIDE
    # the window may have older evidence than the newest backfill entry
    priority = set(no_evidence) | set(failed) | set(CHANGED_THIS_ROUND)
    backfill = [q for q in window if q not in priority]
    outside = [q for q in names if q not in set(window)]
    if backfill and outside:
        newest_in = max(fresh[q]["round"] for q in backfill)
        oldest_out = min(fresh[q]["round"] for q in outside)
        if oldest_out < newest_in:
            problems.append(
                f"rotation violated: window backfill reaches round "
                f"{newest_in} while round-{oldest_out} evidence waits "
                f"outside")
    if len(window) != min(WINDOW_SIZE, len(names)):
        problems.append(
            f"window has {len(window)} slots, expected {WINDOW_SIZE}")
    for p in problems:
        print(f"LEDGER CHECK FAIL: {p}")
    if not problems:
        rounds: dict[int, int] = {}
        for q in names:
            if q in fresh:
                rounds[fresh[q]["round"]] = rounds.get(
                    fresh[q]["round"], 0) + 1
        print(f"ledger check OK: {len(names)} queries, "
              f"{len(no_evidence)} without evidence, window "
              f"{len(window)}, evidence by round "
              f"{dict(sorted(rounds.items()))}")
    return 1 if problems else 0


def main() -> int:
    if "--check" in sys.argv[1:]:
        return check()
    ledger = build_ledger()
    with open(LEDGER_PATH, "w") as f:
        json.dump(ledger, f, indent=0, sort_keys=True)
        f.write("\n")
    print(f"wrote {LEDGER_PATH}: {len(ledger)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
