"""Metadata-at-rest bounds (round-12 verdict item #1): on a synthetic
100,000-file / 1,003-commit dataset —

- a COLD `head_snapshot` (fresh process, empty caches) opens only the
  head's base chain, never all 10^3 entry files;
- the checkpoint is zlib-compressed JSON, a fraction of the raw list;
- `compact_log` bounds the at-rest entry count by RETENTION, keeps the
  head bit-identical, and leaves time travel to retained versions
  working;
- the vacuum/compact rewrite stores ONE self-contained replay basis +
  deltas, not every kept entry self-contained.

These are THE 100-TB scale criteria for the metadata layer: at
10^5-10^6 files and unbounded commit counts, every cost here must be
O(retention + head chain + live files), never O(table age x files).

Log-layer tests — no Spark session. The big build is module-scoped and
takes ~30 s; it is the point of the file."""

import json
import os
import zlib

import pytest

import columnar_format_spark.colf.datasource as ds
from columnar_format_spark.colf.datasource import (
    _HEAD_CACHE,
    _LOG_RAW_CACHE,
    LOG_CHECKPOINT_EVERY,
    _parse_log_name,
    commit_snapshot,
    head_snapshot,
    load_snapshots,
    log_dir,
)
from columnar_format_spark.colf.maintenance import compact_log

# >15 s of pure driver-side log I/O (1e5-file history): slow tier,
# run by tools/ship_gates.sh (r13 verdict item #2)
pytestmark = pytest.mark.slow

N_COMMITS = 1003           # not a checkpoint multiple: the head chain
FILES_PER_COMMIT = 100     # must fold deltas + one checkpoint
N_FILES = N_COMMITS * FILES_PER_COMMIT


@pytest.fixture(scope="module")
def big_log(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("at-rest") / "ds")
    os.makedirs(p)
    live, v = [], None
    for i in range(N_COMMITS):
        live = live + [f"part-{i:05d}-{j:02d}.colf"
                       for j in range(FILES_PER_COMMIT)]
        v = commit_snapshot(p, live, expected_parent=v)
    assert v == N_COMMITS
    return p, live


def _cold():
    _LOG_RAW_CACHE.clear()
    _HEAD_CACHE.clear()
    ds._META_COLD_CACHE.clear()


def test_cold_head_snapshot_opens_are_bounded(big_log, monkeypatch):
    """THE bound: a fresh process's first plan against a 10^3-commit
    log must open O(chain) entry files, not O(commits). (10^5 commits
    would otherwise be 10^5 opens before the first data byte.)"""
    p, live = big_log
    _cold()
    opens = []
    real = ds._load_log_member

    def counting(full):
        opens.append(os.path.basename(full))
        return real(full)

    monkeypatch.setattr(ds, "_load_log_member", counting)
    h = head_snapshot(p)
    assert h["version"] == N_COMMITS
    assert len(h["files"]) == N_FILES
    assert sorted(h["files"]) == sorted(live)
    # head chain: the deltas back to the nearest checkpoint (< EVERY)
    # plus that checkpoint itself, plus nothing else
    assert len(opens) <= LOG_CHECKPOINT_EVERY + 2, opens
    assert any(n.endswith(".ckpt.jz") for n in opens)


def test_checkpoint_is_compressed_and_small(big_log):
    p, _ = big_log
    d = log_dir(p)
    cks = sorted(n for n in os.listdir(d)
                 if _parse_log_name(n) and _parse_log_name(n)[1])
    assert cks, "no checkpoints written"
    newest = os.path.join(d, cks[-1])
    assert newest.endswith(".ckpt.jz")
    with open(newest, "rb") as f:
        blob = f.read()
    raw = zlib.decompress(blob)
    entry = json.loads(raw)
    assert len(entry["files"]) >= (N_COMMITS - LOG_CHECKPOINT_EVERY) \
        * FILES_PER_COMMIT
    # the pinned ratio: filename lists compress far below 25%
    assert len(blob) < 0.25 * len(raw), (len(blob), len(raw))
    # absolute sanity at this scale (raw would be ~2.5 MB)
    assert len(blob) < 600_000


def test_commit_entries_stay_o_commit(big_log):
    """Every non-checkpoint member written by the live commit path is
    O(that commit's delta) — the at-rest log is O(files + commits)."""
    p, _ = big_log
    d = log_dir(p)
    entries = [n for n in os.listdir(d)
               if _parse_log_name(n) and not _parse_log_name(n)[1]]
    assert len(entries) == N_COMMITS
    big = [n for n in entries
           if os.path.getsize(os.path.join(d, n)) > 10_000
           and n != "v000000000001.json"]  # v1 is the replay basis
    assert big == [], f"O(table) commit entries: {big[:5]}"


def test_compact_log_bounds_entries_and_preserves_head(big_log):
    p, live = big_log
    before = head_snapshot(p)
    r = compact_log(p, keep_last=5)
    assert r["pruned"] == N_COMMITS - 5 and r["kept"] == 5
    d = log_dir(p)
    entries = [n for n in os.listdir(d)
               if _parse_log_name(n) and not _parse_log_name(n)[1]]
    # at-rest entry count bounded by RETENTION, not table age
    assert len(entries) == 5
    snaps = load_snapshots(p)
    assert [s["version"] for s in snaps] == list(
        range(N_COMMITS - 4, N_COMMITS + 1))
    # the head is bit-identical across the compaction
    _cold()
    after = head_snapshot(p)
    assert after == before
    # delta-preserving rewrite: ONE self-contained replay basis, the
    # rest O(commit) deltas — not every kept entry O(files)
    sizes = sorted(os.path.getsize(os.path.join(d, n)) for n in entries)
    assert sizes[-2] < 10_000, sizes       # all but the basis tiny
    # time travel to every retained version still materializes
    for s in snaps:
        assert len(s["files"]) == s["version"] * FILES_PER_COMMIT
    # and the next commit continues the lineage
    v = commit_snapshot(p, live + ["tail.colf"],
                        expected_parent=N_COMMITS)
    assert v == N_COMMITS + 1
    assert len(head_snapshot(p)["files"]) == N_FILES + 1


def test_compact_log_refuses_concurrent_commit(tmp_path):
    from columnar_format_spark.colf.format import ColfFormatError

    p = str(tmp_path / "ds")
    os.makedirs(p)
    v = commit_snapshot(p, ["a.colf"])
    for i in range(4):
        v = commit_snapshot(p, ["a.colf", f"b{i}.colf"],
                            expected_parent=v)

    import columnar_format_spark.colf.maintenance as mnt

    real = mnt._plan_kept_snapshots

    def racing_plan(path, snaps, keep_last, older_than_s):
        kept = real(path, snaps, keep_last, older_than_s)
        commit_snapshot(path, ["a.colf", "late.colf"])  # racer lands
        return kept

    mnt._plan_kept_snapshots = racing_plan
    try:
        with pytest.raises(ColfFormatError, match="concurrent commit"):
            compact_log(p, keep_last=2)
    finally:
        mnt._plan_kept_snapshots = real
    # retry succeeds and keeps the racer's commit as head
    r = compact_log(p, keep_last=2)
    assert r["head"] == 6
    assert load_snapshots(p)[-1]["files"] == ["a.colf", "late.colf"]


def test_snapshot_summaries_never_materialize(big_log, monkeypatch):
    """The snapshots metadata table's backing fold (round-12 verdict
    item on metadata tables): O(commits) count arithmetic along the
    delta chains — proven structurally by making full materialization
    explode."""
    from columnar_format_spark.colf.datasource import snapshot_summaries

    p, live = big_log

    def bomb(*a, **k):
        raise AssertionError("snapshot_summaries materialized a "
                             "file list")

    monkeypatch.setattr(ds, "_materialize_entry", bomb)
    rows = snapshot_summaries(p)
    # versions may have been compacted by the earlier test in this
    # module; every surviving row's count must be exact
    assert rows, "no summaries"
    for r in rows:
        expect = r["version"] * FILES_PER_COMMIT
        if r["version"] > N_COMMITS:       # the post-compaction append
            expect = N_FILES + 1
        assert r["n_files"] == expect, r
        assert r["staged"] is False and r["branch"] is None


def test_live_file_first_versions_matches_full_fold(tmp_path):
    """The O(files + commits) raw fold must agree with the reference
    full-history fold on a mixed history: appends, a staged WAP
    commit, a vacuum prune with inherited_fseq-style carry."""
    from columnar_format_spark.colf.datasource import (
        file_first_versions, live_file_first_versions, write_snapshots)

    p = str(tmp_path / "ds")
    os.makedirs(p)
    commit_snapshot(p, ["a.colf"])
    commit_snapshot(p, ["a.colf", "b.colf"], expected_parent=1)
    commit_snapshot(p, ["a.colf", "b.colf", "w.colf"], staged=True,
                    added=["w.colf"])
    commit_snapshot(p, ["a.colf", "b.colf", "c.colf"])
    assert live_file_first_versions(p) == \
        file_first_versions(load_snapshots(p))
    # prune to the tail with a carried fseq — precedence must hold
    kept = [s for s in load_snapshots(p) if s["version"] >= 4]
    kept[0] = dict(kept[0], inherited_fseq={"a.colf": 1, "b.colf": 2})
    write_snapshots(p, kept)
    got = live_file_first_versions(p)
    assert got == file_first_versions(load_snapshots(p))
    assert got["a.colf"] == 1 and got["b.colf"] == 2


def test_orphaned_entries_tolerated_by_summaries_and_retention(tmp_path):
    """Interrupted-vacuum recovery (round-12 review finding): entries
    whose base chain was pruned mid-vacuum must not fail the snapshots
    summary fold, and the recovery vacuum/compact_log itself must plan
    around them — load_snapshots' orphan tolerance, everywhere."""
    from columnar_format_spark.colf.datasource import (
        _log_entry_name, snapshot_summaries, write_snapshots)

    p = str(tmp_path / "ds")
    os.makedirs(p)
    v = commit_snapshot(p, ["a.colf"])
    for i in range(4):
        v = commit_snapshot(p, [f"a.colf", f"b{i}.colf"],
                            expected_parent=v)
    # prune to the tail, then fake the interrupted state: a leftover
    # delta entry whose base (v1) no longer exists
    write_snapshots(p, [s for s in load_snapshots(p)
                        if s["version"] >= 4])
    orphan = os.path.join(log_dir(p), _log_entry_name(2))
    with open(orphan, "w") as f:
        json.dump({"version": 2, "base": 1, "files_add": ["x.colf"]}, f)
    ds._invalidate_log_cache(p)

    assert [s["version"] for s in load_snapshots(p)] == [4, 5]
    # summaries: orphan skipped, not fatal (metadata_table backing)
    assert [r["version"] for r in snapshot_summaries(p)] == [4, 5]
    # retention planning spanning the orphan: drops it and succeeds
    r = compact_log(p, keep_last=4)
    assert [s["version"] for s in load_snapshots(p)] == [4, 5]
    assert not os.path.exists(orphan)   # the recovery pruned it
    assert r["kept"] == 2


# ---------------------------------------------------------------------------
# Checkpoint-resolved carried metadata (round-12 verdict item #3): the
# current_* getters (spec / sort / cluster / table_schema) on a COLD
# cache must open O(entries since the newest checkpoint), never the
# whole raw log — checkpoints store the getters' reverse-scan result
# as-of their version under "resolved_meta".
# ---------------------------------------------------------------------------

META_COMMITS = 66   # three checkpoints (20/40/60) + a 6-entry tail


@pytest.fixture(scope="module")
def meta_log(tmp_path_factory):
    from columnar_format_spark.colf.datasource import commit_snapshot

    p = str(tmp_path_factory.mktemp("meta-cold") / "ds")
    os.makedirs(p)
    schema = {"fields": [{"id": 1, "name": "a", "type": "int32"}],
              "name_mapping": {"a": 1}}
    live, v = [], None
    for i in range(1, META_COMMITS + 1):
        live = live + [f"f-{i:03d}.colf"]
        kw = {}
        if i == 7:
            kw["spec"] = ["region"]
        if i == 9:
            kw["sort"] = ["ts"]
        if i == 33:
            kw["table_schema"] = schema
        v = commit_snapshot(p, live, expected_parent=v, **kw)
    # unpublished tail: staged + branch commits must neither answer
    # the getters nor break the bounded walk
    commit_snapshot(p, live + ["w.colf"], staged=True, added=["w.colf"])
    commit_snapshot(p, live + ["b.colf"], branch="dev", added=["b.colf"])
    return p, schema


def test_cold_meta_getters_opens_are_bounded(meta_log, monkeypatch):
    """THE bound: each cold current_* getter opens at most the entries
    since the newest checkpoint plus that checkpoint — at 10^5 commits
    the old full reverse scan would be 10^5 opens per getter."""
    from columnar_format_spark.colf.datasource import (
        current_clustering, current_partition_spec, current_sort_order,
        current_table_schema)

    p, schema = meta_log
    real = ds._load_log_member

    def counting(full):
        opens.append(os.path.basename(full))
        return real(full)

    monkeypatch.setattr(ds, "_load_log_member", counting)
    for getter, want in ((current_partition_spec, ["region"]),
                         (current_sort_order, ["ts"]),
                         (current_clustering, None),
                         (current_table_schema, schema)):
        _cold()
        ds._SIDECAR_CACHE.clear()
        opens = []
        assert getter(p) == want
        # tail since ckpt 60 (6 published + 2 unpublished) + the ckpt
        assert len(opens) <= LOG_CHECKPOINT_EVERY, (getter, opens)
        assert any(n.endswith(".ckpt.jz") for n in opens), getter
    # the bounded walk deliberately does NOT warm the raw-log cache
    assert os.path.realpath(p) not in _LOG_RAW_CACHE


def test_cold_meta_getters_match_warm(meta_log):
    """Parity: the bounded cold walk and the warm full reverse scan
    answer identically for all four slots."""
    from columnar_format_spark.colf.datasource import (
        current_clustering, current_partition_spec, current_sort_order,
        current_table_schema, load_snapshots)

    p, _ = meta_log
    getters = (current_partition_spec, current_sort_order,
               current_clustering, current_table_schema)
    _cold()
    cold_vals = [g(p) for g in getters]
    load_snapshots(p)   # warms the raw cache -> in-memory scan path
    assert os.path.realpath(p) in _LOG_RAW_CACHE
    assert [g(p) for g in getters] == cold_vals


def test_vacuum_rewrite_checkpoint_resolves_meta(tmp_path):
    """compact_log's rewritten head checkpoint must carry
    resolved_meta too (the vacuum path writes checkpoints through
    _delta_encode_history, not the live commit path), so the getters
    stay bounded — and correct via the inherited_* carry-forward —
    after retention pruned the adopting snapshots."""
    from columnar_format_spark.colf.datasource import (
        _load_log_member, commit_snapshot, current_partition_spec,
        current_sort_order)

    p = str(tmp_path / "ds")
    os.makedirs(p)
    v = commit_snapshot(p, ["a.colf"], spec=["region"])
    v = commit_snapshot(p, ["a.colf", "b.colf"], expected_parent=v,
                        sort=["ts"])
    for i in range(24):
        v = commit_snapshot(p, ["a.colf", "b.colf", f"c{i}.colf"],
                            expected_parent=v)
    compact_log(p, keep_last=5)
    d = log_dir(p)
    cks = sorted(n for n in os.listdir(d)
                 if _parse_log_name(n) and _parse_log_name(n)[1])
    rm = _load_log_member(os.path.join(d, cks[-1]))["resolved_meta"]
    assert rm["spec"] == ["region"] and rm["sort"] == ["ts"]
    _cold()
    assert current_partition_spec(p) == ["region"]
    assert current_sort_order(p) == ["ts"]


def test_meta_getters_on_big_log_stay_bounded(big_log, monkeypatch):
    """On the 1,003-commit dataset a cold getter whose slot was NEVER
    recorded still answers (None) after opening only the post-
    checkpoint tail — the resolved checkpoint proves the absence."""
    from columnar_format_spark.colf.datasource import current_sort_order

    p, _ = big_log
    _cold()
    opens = []
    real = ds._load_log_member

    def counting(full):
        opens.append(os.path.basename(full))
        return real(full)

    monkeypatch.setattr(ds, "_load_log_member", counting)
    assert current_sort_order(p) is None
    assert len(opens) <= LOG_CHECKPOINT_EVERY + 2, opens


def test_cold_meta_getters_memoize_across_slots(meta_log, monkeypatch):
    """One cold walk resolves ALL four slots: after the first getter,
    the remaining three (and repeats) answer from the memo with ZERO
    member opens — per-getter re-walks would re-parse the O(live
    files) checkpoint four times per plan (round-13 review
    finding)."""
    from columnar_format_spark.colf.datasource import (
        current_clustering, current_partition_spec, current_sort_order,
        current_table_schema)

    p, schema = meta_log
    _cold()
    assert current_partition_spec(p) == ["region"]   # pays the walk
    opens = []
    real = ds._load_log_member

    def counting(full):
        opens.append(os.path.basename(full))
        return real(full)

    monkeypatch.setattr(ds, "_load_log_member", counting)
    assert current_sort_order(p) == ["ts"]
    assert current_clustering(p) is None
    assert current_table_schema(p) == schema
    assert current_partition_spec(p) == ["region"]
    assert opens == [], opens
