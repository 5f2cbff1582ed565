"""CLI parity with the reference's entry points, so a user of
satyakalla890/columnar-format can switch repos and keep their commands:

  reference                                      this engine
  python writer.py csv_to_custom in.csv out.colf  -> python -m columnar_format_spark.colf.cli csv_to_custom in.csv out.colf
  python reader.py custom_to_csv in.colf out.csv  -> python -m columnar_format_spark.colf.cli custom_to_csv in.colf out.csv
  python reader.py read_columns in.colf a,b       -> python -m columnar_format_spark.colf.cli read_columns in.colf a,b
  (README-promised, missing in reference)         -> python -m columnar_format_spark.colf.cli inspect_header in.colf

Argument order/shape mirrors /root/reference/writer.py:215-228 and
reader.py:223-274. These run on the pure-Python codec (no Spark
session): the reference's CLIs are single-file single-process tools and
starting a JVM to convert one CSV would be the wrong trade. The Spark
path for datasets is spark.read/write.format("colf").

`inspect_header` exists here although the reference repo only promises
it (README.md:56-57 references inspect_header.py; the file is absent).
"""

from __future__ import annotations

import csv
import json
import sys

from . import csv_ingest_pure
from .format import read_all, read_columns, read_schema


def cli_csv_to_custom(argv: list[str]) -> int:
    if "--v2" in argv:
        argv = [a for a in argv if a != "--v2"]
        version = 2
    else:
        version = 1
    if len(argv) != 2:
        print("usage: ... csv_to_custom <in.csv> <out.colf> [--v2]",
              file=sys.stderr)
        return 2
    csv_ingest_pure.csv_file_to_colf(argv[0], argv[1], version=version)
    return 0


def cli_custom_to_csv(argv: list[str]) -> int:
    if len(argv) != 2:
        print("usage: ... custom_to_csv <in.colf> <out.csv>", file=sys.stderr)
        return 2
    schema = read_schema(argv[0])
    names = [c.name for c in schema.columns]
    data = read_all(argv[0])
    with open(argv[1], "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(names)
        for i in range(schema.num_rows):
            w.writerow(["" if data[n][i] is None else data[n][i] for n in names])
    return 0


def cli_read_columns(argv: list[str]) -> int:
    if len(argv) != 2:
        print("usage: ... read_columns <in.colf> <col1,col2>", file=sys.stderr)
        return 2
    cols = [c for c in argv[1].split(",") if c]
    data = read_columns(argv[0], cols)
    n = len(next(iter(data.values()))) if data else 0
    w = csv.writer(sys.stdout)
    w.writerow(cols)
    for i in range(n):
        w.writerow(["" if data[c][i] is None else data[c][i] for c in cols])
    return 0


def cli_inspect_header(argv: list[str]) -> int:
    if len(argv) != 1:
        print("usage: ... inspect_header <in.colf>", file=sys.stderr)
        return 2
    schema = read_schema(argv[0])
    doc = {
        "version": schema.version,
        "num_rows": schema.num_rows,
        "columns": [c.to_json() for c in schema.columns],
    }
    if schema.version == 3:
        from .format import read_stripes_info

        doc["stripes"] = read_stripes_info(argv[0])
    print(json.dumps(doc, indent=2))
    return 0


def cli_snapshots(argv: list[str]) -> int:
    """List a dataset's metadata-log versions (file counts and total
    rows per version, from the zone-map manifest when present)."""
    if len(argv) != 1:
        print("usage: ... snapshots <dataset-dir>", file=sys.stderr)
        return 2
    from .datasource import load_manifest, load_snapshots

    from .datasource import load_refs

    snaps = load_snapshots(argv[0])
    manifest = load_manifest(argv[0])
    by_version: dict[int, list[str]] = {}
    for name, r in load_refs(argv[0]).items():
        by_version.setdefault(r["version"], []).append(name)
    out = []
    for s in snaps:
        rows = [manifest.get(b, {}).get("num_rows") for b in s["files"]]
        counted = [r for r in rows if r is not None]
        out.append({
            "version": s["version"],
            "n_files": len(s["files"]),
            # a partial sum would be indistinguishable from a complete
            # total (e.g. reference-writer files lack manifest rows) —
            # num_rows only when EVERY file has stats, else null plus
            # how many files the partial count covers
            "num_rows": sum(counted) if len(counted) == len(rows) else None,
            "counted_files": len(counted),
            **({"staged": True} if s.get("staged") else {}),
            **({"branch": s["branch"]} if s.get("branch") else {}),
            **({"wap_source": s["wap_source"]}
               if s.get("wap_source") is not None else {}),
            **({"ff_from": s["ff_from"]} if s.get("ff_from") else {}),
            **({"refs": sorted(by_version[s["version"]])}
               if s["version"] in by_version else {}),
        })
    print(json.dumps(out, indent=2))
    return 0


def cli_stats(argv: list[str]) -> int:
    """Dump a dataset's zone-map manifest: per live file, row count,
    per-column min/max/null_count, and stripe row counts (v3) — the
    metadata the scanner prunes with, in human-readable form. Reads
    ONLY the sidecar (no data bytes), so it is instant on any dataset
    size; a file without a manifest entry is listed with stats null."""
    if len(argv) != 1:
        print("usage: ... stats <dataset-dir>", file=sys.stderr)
        return 2
    import os

    from .datasource import (
        dataset_union_columns, live_files, load_blooms, load_manifest)

    files = live_files(argv[0])
    manifest = load_manifest(argv[0])
    blooms = load_blooms(argv[0])
    doc = {
        "n_live_files": len(files),
        "dataset_schema": [c.to_json()
                           for c in dataset_union_columns(argv[0], files)]
        if files else [],
        "files": {os.path.basename(f): manifest.get(os.path.basename(f))
                  for f in files},
    }
    if blooms:
        # Bloom sidecar summary (bit payloads elided — sizes and the
        # realized fpp are the operational signal)
        live_base = {os.path.basename(f) for f in files}
        doc["blooms"] = {
            base: {
                "columns": {col: {k: v for k, v in bl.items() if k != "b64"}
                            for col, bl in per_file.get("columns", {}).items()},
                **({"n_stripe_blooms": len(per_file["stripes"])}
                   if per_file.get("stripes") else {}),
            }
            for base, per_file in blooms.items() if base in live_base
        }
    print(json.dumps(doc, indent=2))
    return 0


def cli_partitions(argv: list[str]) -> int:
    """Partition tuples of a metadata-partitioned dataset with per-
    tuple file and row counts — Iceberg's ``partitions`` metadata
    table as a CLI, folded purely from the zone-map manifest (no data
    bytes). Unpartitioned files (no tuple in their manifest entry) are
    reported separately so a mixed layout is visible, not miscounted."""
    if len(argv) != 1:
        print("usage: ... partitions <dataset-dir>", file=sys.stderr)
        return 2
    import os

    from .datasource import (current_clustering, current_partition_spec,
                             current_sort_order, live_files, load_manifest)

    spec = current_partition_spec(argv[0])
    sort = current_sort_order(argv[0])
    cluster = current_clustering(argv[0])
    manifest = load_manifest(argv[0])
    live = [os.path.basename(f) for f in live_files(argv[0])]
    tuples: dict[str, dict] = {}
    unpartitioned = {"n_files": 0, "num_rows": 0}
    for b in live:
        entry = manifest.get(b) or {}
        part = entry.get("partition")
        rows = entry.get("num_rows") or 0
        if not part:
            unpartitioned["n_files"] += 1
            unpartitioned["num_rows"] += rows
            continue
        key = json.dumps(part, sort_keys=True)
        agg = tuples.setdefault(key, {"partition": part, "n_files": 0,
                                      "num_rows": 0})
        agg["n_files"] += 1
        agg["num_rows"] += rows
    print(json.dumps({
        "n_live_files": len(live),
        # the RECORDED spec (snapshot-log "spec", Iceberg-style) —
        # files written under older specs keep their own tuples below
        **({"current_spec": spec} if spec is not None else {}),
        **({"sort_order": sort} if sort else {}),
        **({"clustering": cluster} if cluster else {}),
        "partitions": sorted(tuples.values(),
                             key=lambda t: json.dumps(t["partition"],
                                                      sort_keys=True)),
        **({"unpartitioned": unpartitioned}
           if unpartitioned["n_files"] else {}),
    }, indent=2))
    return 0


def cli_evolve_spec(argv: list[str]) -> int:
    """Metadata-only partition-spec evolution from the shell:
    ``evolve_spec <dataset-dir> [col-or-transform ...]`` (no args
    after the dir = un-partition future writes). Prints the committed
    metadata-log version."""
    if not argv:
        print("usage: ... evolve_spec <dataset-dir> [col|bucket(N,col)"
              "|truncate(N,col) ...]", file=sys.stderr)
        return 2
    from .maintenance import evolve_partition_spec

    v = evolve_partition_spec(argv[0], list(argv[1:]))
    print(json.dumps({"version": v, "spec": argv[1:]}))
    return 0


def _pick_published(snaps: dict, token: str) -> dict:
    """Resolve a version token for diff/changelog. ``current`` is the
    newest PUBLISHED snapshot — staged (write-audit-publish) and
    branch commits are outside the published lineage, exactly the
    predicate datasource.published_snapshots applies, so a dataset
    whose newest commit is an unpublished branch append diffs against
    the published table, not the branch head. Explicit version numbers
    may name any commit (auditing a staged write is legitimate)."""
    if token == "current":
        pub = [v for v, s in snaps.items()
               if not s.get("staged") and not s.get("branch")]
        if not pub:
            print("no published snapshot", file=sys.stderr)
            raise SystemExit(2)
        return snaps[max(pub)]
    v = int(token)
    if v not in snaps:
        print(f"version {v} not in metadata log "
              f"(have {sorted(snaps)})", file=sys.stderr)
        raise SystemExit(2)
    return snaps[v]


def _union_names(path: str, basenames) -> list[str]:
    """First-seen column-name union over the given part files (the
    dataset schema under additive evolution), refusing when a file was
    vacuumed. Row tuples for diff/changelog must be built against ONE
    fixed column order: binding each file's own header would mislabel
    values and produce never-cancelling tuples of different arity when
    the two diffed versions' files carry different column sets."""
    import os

    names: list[str] = []
    seen: set[str] = set()
    for b in sorted(basenames):
        fp = os.path.join(path, b)
        if not os.path.exists(fp):
            print(f"part file {b} referenced by a diffed version was "
                  f"vacuumed — row-accurate diff impossible",
                  file=sys.stderr)
            raise SystemExit(2)
        for c in read_schema(fp).columns:
            if c.name not in seen:
                seen.add(c.name)
                names.append(c.name)
    return names


def _eq_row_match(group, get) -> bool:
    """Pure-Python twin of the reader's equality-delete evaluation
    (Spark SQL semantics: NULL comparisons FALSE except IS NULL; float
    NaN sorts ABOVE every value, so NaN matches > / >= probes). Same
    conjunct set _delete_where_eq validates at delete time."""
    for s in group:
        x = get(s["col"])
        op, v = s["op"], s.get("value")
        if op == "IsNull":
            if x is not None:
                return False
            continue
        if op == "IsNotNull":
            if x is None:
                return False
            continue
        if op == "EqualNullSafe" and v is None:
            if x is not None:
                return False
            continue
        if x is None:
            return False
        nan = isinstance(x, float) and x != x
        if op in ("EqualTo", "EqualNullSafe"):
            if nan or x != v:
                return False
        elif op == "In":
            if nan or x not in v:
                return False
        elif op == "GreaterThan":
            if not (nan or x > v):
                return False
        elif op == "GreaterThanOrEqual":
            if not (nan or x >= v):
                return False
        elif op == "LessThan":
            if nan or not (x < v):
                return False
        elif op == "LessThanOrEqual":
            if nan or not (x <= v):
                return False
        elif op == "StringStartsWith":
            if not (isinstance(x, str) and x.startswith(v)):
                return False
        else:
            print(f"unknown equality-delete op {op!r} — refusing a "
                  f"possibly wrong diff", file=sys.stderr)
            raise SystemExit(2)
    return True


def _rows_of(path: str, basenames, names: list[str], dmap=None,
             eqs=(), fseq=None):
    """Row multiset of the given part files as tuples in the fixed
    ``names`` order; columns a file lacks read as None (typed NULLs —
    the same semantics the Spark reader gives evolved datasets).
    ``dmap`` ({basename: deleted position array}) masks merge-on-read
    position deletes and ``eqs``/``fseq`` the sequence-gated equality
    deletes, so each side reflects its version's VISIBLE rows."""
    import os
    from collections import Counter

    c: Counter = Counter()
    for b in sorted(basenames):
        fp = os.path.join(path, b)
        data = read_all(fp)
        n = read_schema(fp).num_rows
        dropped = (set(int(p) for p in dmap[b])
                   if dmap and b in dmap else ())
        groups = [e["filters"] for e in eqs
                  if (fseq or {}).get(b, 10 ** 18) < e["seq"]]
        for i in range(n):
            if i in dropped:
                continue
            if groups and any(_eq_row_match(
                    g, lambda nm: data[nm][i] if nm in data else None)
                    for g in groups):
                continue
            c[tuple(data[nm][i] if nm in data else None
                    for nm in names)] += 1
    return c


def _delete_view(path: str, s1: dict, s2: dict, f1: set, f2: set,
                 snaps_all: list[dict]):
    """Merge-on-read awareness for diff/changelog: returns
    (changed_common_files, (dmap1, eq1), (dmap2, eq2), fseq). A common
    file addressed by a position-delete sidecar OR sequence-covered by
    an equality predicate present in only one version changed ROWS
    without changing identity — it must decode on both sides, each
    masked by its own version's deletes. Refuses (like a vacuumed part
    file) when a referenced sidecar is gone."""
    import json as _json
    import os

    from .datasource import (_load_delete_file, delete_positions_map,
                             file_first_versions)

    d1, d2 = set(s1.get("deletes", [])), set(s2.get("deletes", []))
    try:
        changed: set = set()
        for d in d1 ^ d2:
            changed |= set(_load_delete_file(os.path.join(path, d)))
        dmap1 = delete_positions_map(path, sorted(d1))
        dmap2 = delete_positions_map(path, sorted(d2))
    except OSError as exc:
        print(f"delete sidecar referenced by a diffed version was "
              f"vacuumed — row-accurate diff impossible ({exc})",
              file=sys.stderr)
        raise SystemExit(2) from exc
    eq1 = s1.get("eq_deletes") or []
    eq2 = s2.get("eq_deletes") or []
    fseq = (file_first_versions(snaps_all)
            if eq1 or eq2 else {})

    def _ek(e):
        return (e["seq"], _json.dumps(e["filters"], sort_keys=True))

    k1, k2 = {_ek(e) for e in eq1}, {_ek(e) for e in eq2}
    for e in eq1 + eq2:
        if (_ek(e) in k1) != (_ek(e) in k2):
            changed |= {b for b in f1 & f2
                        if fseq.get(b, 10 ** 18) < e["seq"]}
    return changed & f1 & f2, (dmap1, eq1), (dmap2, eq2), fseq


def cli_diff(argv: list[str]) -> int:
    """Row-accurate snapshot diff between two table versions from the
    shell — the CDC audit question "what changed between v1 and v2?"
    (q183's capability, reachable outside the registry). File-level
    first: part files common to both versions cancel exactly (they are
    immutable), so only the files UNIQUE to each side are decoded
    (pure-Python reader, no Spark) and their row multisets subtracted.
    Prints added/removed row counts, per-version totals, and the
    file-level delta. At warehouse scale the Spark exceptAll tier
    (roundtrip.q183) does the same thing distributed; this CLI is the
    operator's single-node twin."""
    if len(argv) != 3:
        print("usage: ... diff <dataset-dir> <v1> <v2|current>",
              file=sys.stderr)
        return 2
    from .datasource import load_manifest, load_snapshots

    path = argv[0]
    snaps = {s["version"]: s for s in load_snapshots(path)}
    if not snaps:
        print("dataset has no metadata log — nothing to diff",
              file=sys.stderr)
        return 2

    s1 = _pick_published(snaps, argv[1])
    s2 = _pick_published(snaps, argv[2])
    f1, f2 = set(s1["files"]), set(s2["files"])
    snaps_all = sorted(snaps.values(), key=lambda s_: s_["version"])
    changed, (dmap1, eq1), (dmap2, eq2), fseq = _delete_view(
        path, s1, s2, f1, f2, snaps_all)
    only1 = sorted((f1 - f2) | changed)
    only2 = sorted((f2 - f1) | changed)
    manifest = load_manifest(path)

    names = _union_names(path, only1 + only2)
    r1 = _rows_of(path, only1, names, dmap1, eq1, fseq)
    r2 = _rows_of(path, only2, names, dmap2, eq2, fseq)
    added = r2 - r1
    removed = r1 - r2

    def total(s, dmap, eqs) -> int | None:
        if eqs:
            return None  # predicate masks defeat metadata arithmetic
        rows = [manifest.get(b, {}).get("num_rows") for b in s["files"]]
        if not all(r is not None for r in rows):
            return None
        fset = set(s["files"])
        return sum(rows) - sum(len(v) for b, v in dmap.items()
                               if b in fset)

    print(json.dumps({
        "v1": s1["version"], "v2": s2["version"],
        "files_added": len(f2 - f1), "files_removed": len(f1 - f2),
        "files_row_changed": len(changed),
        "files_common": len(f1 & f2),
        "n_added": sum(added.values()),
        "n_removed": sum(removed.values()),
        "n_v1": total(s1, dmap1, eq1), "n_v2": total(s2, dmap2, eq2),
    }, indent=2))
    return 0


def cli_set_clustering(argv: list[str]) -> int:
    """Metadata-only z-order clustering change from the shell:
    ``set_clustering <dataset-dir> [col col ...]`` (no cols = clear;
    >=2 numeric cols otherwise). compact() then re-clusters by the
    rank-normalized Morton interleave. Prints the committed version."""
    if not argv:
        print("usage: ... set_clustering <dataset-dir> [col col ...]",
              file=sys.stderr)
        return 2
    from .maintenance import set_clustering

    v = set_clustering(argv[0], list(argv[1:]))
    print(json.dumps({"version": v, "cluster": argv[1:]}))
    return 0


def cli_changelog(argv: list[str]) -> int:
    """Row-level changelog between two versions from the shell:
    ``changelog <dataset-dir> <v1> <v2|current> [limit]`` — one JSON
    line per changed row, ``{"op": "insert"|"delete", ...columns}``,
    deletes first then inserts, each side ordered by its column
    values. Same metadata-level file cancellation as ``diff`` (only
    per-side-unique files decode); the Spark tier
    (maintenance.snapshot_changelog) is the distributed twin."""
    if len(argv) not in (3, 4):
        print("usage: ... changelog <dataset-dir> <v1> <v2|current> "
              "[limit]", file=sys.stderr)
        return 2
    from .datasource import load_snapshots

    path = argv[0]
    limit = int(argv[3]) if len(argv) == 4 else None
    snaps = {s["version"]: s for s in load_snapshots(path)}
    if not snaps:
        print("dataset has no metadata log", file=sys.stderr)
        return 2

    s1 = _pick_published(snaps, argv[1])
    s2 = _pick_published(snaps, argv[2])
    f1, f2 = set(s1["files"]), set(s2["files"])
    snaps_all = sorted(snaps.values(), key=lambda s_: s_["version"])
    changed, (dmap1, eq1), (dmap2, eq2), fseq = _delete_view(
        path, s1, s2, f1, f2, snaps_all)
    only1 = sorted((f1 - f2) | changed)
    only2 = sorted((f2 - f1) | changed)
    names = _union_names(path, only1 + only2)
    r1 = _rows_of(path, only1, names, dmap1, eq1, fseq)
    r2 = _rows_of(path, only2, names, dmap2, eq2, fseq)
    emitted = 0
    for op, delta in (("delete", r1 - r2), ("insert", r2 - r1)):
        for row in sorted(delta, key=lambda t: tuple(
                (x is None, str(x)) for x in t)):
            for _ in range(delta[row]):
                if limit is not None and emitted >= limit:
                    print(json.dumps({"truncated": True,
                                      "limit": limit}))
                    return 0
                print(json.dumps({"op": op,
                                  **dict(zip(names, row))}))
                emitted += 1
    return 0


def cli_tag(argv: list[str]) -> int:
    """Pin an immutable named tag to a snapshot version:
    ``tag <dataset-dir> <name> [version]`` (default: published head).
    Tagged snapshots survive vacuum and are readable via
    ``option("ref", name)``."""
    if len(argv) not in (2, 3):
        print("usage: ... tag <dataset-dir> <name> [version]",
              file=sys.stderr)
        return 2
    from .maintenance import create_tag

    v = create_tag(argv[0], argv[1],
                   int(argv[2]) if len(argv) == 3 else None)
    print(json.dumps({"ref": argv[1], "version": v, "type": "tag"}))
    return 0


def cli_branch(argv: list[str]) -> int:
    """Create a branch lineage: ``branch <dataset-dir> <name>
    [version]`` (default fork point: published head). Append to it
    with writer ``option("branch", name)``; land it with
    ``fast_forward``."""
    if len(argv) not in (2, 3):
        print("usage: ... branch <dataset-dir> <name> [version]",
              file=sys.stderr)
        return 2
    from .maintenance import create_branch

    v = create_branch(argv[0], argv[1],
                      int(argv[2]) if len(argv) == 3 else None)
    print(json.dumps({"ref": argv[1], "forked_at": v, "type": "branch"}))
    return 0


def cli_fast_forward(argv: list[str]) -> int:
    """Land a branch on the published lineage (metadata only):
    ``fast_forward <dataset-dir> <name>``."""
    if len(argv) != 2:
        print("usage: ... fast_forward <dataset-dir> <name>",
              file=sys.stderr)
        return 2
    from .maintenance import fast_forward

    v = fast_forward(argv[0], argv[1])
    print(json.dumps({"ref": argv[1], "version": v}))
    return 0


def cli_vacuum(argv: list[str]) -> int:
    """Expire old snapshots and reclaim their part files (pure
    metadata + filesystem, no Spark): ``vacuum <dataset-dir>
    [keep_last] [older_than_seconds] [--dry-run]``. Ref-pinned,
    staged-unpublished, the published head, and (with an age bound)
    recent snapshots are always retained; ``--dry-run`` reports the
    reclaimable set without touching anything."""
    dry = "--dry-run" in argv
    argv = [a for a in argv if a != "--dry-run"]
    if len(argv) not in (1, 2, 3):
        print("usage: ... vacuum <dataset-dir> [keep_last] "
              "[older_than_seconds] [--dry-run]", file=sys.stderr)
        return 2
    from .maintenance import vacuum

    deleted = vacuum(argv[0],
                     keep_last=int(argv[1]) if len(argv) >= 2 else 1,
                     older_than_s=float(argv[2]) if len(argv) == 3
                     else None,
                     dry_run=dry)
    print(json.dumps({"deleted_files": deleted, "dry_run": dry}))
    return 0


def cli_remove_orphans(argv: list[str]) -> int:
    """Delete files no snapshot references — crashed-writer leftovers
    and abandoned rewrite scratch dirs — WITHOUT expiring snapshots
    (pure metadata + filesystem, no Spark): ``remove_orphans
    <dataset-dir> [older_than_seconds] [--dry-run]``. Grace period
    defaults to Iceberg's 3 days."""
    dry = "--dry-run" in argv
    argv = [a for a in argv if a != "--dry-run"]
    if len(argv) not in (1, 2):
        print("usage: ... remove_orphans <dataset-dir> "
              "[older_than_seconds] [--dry-run]", file=sys.stderr)
        return 2
    from .maintenance import remove_orphan_files

    removed = remove_orphan_files(
        argv[0],
        older_than_s=float(argv[1]) if len(argv) == 2 else 3 * 86400.0,
        dry_run=dry)
    print(json.dumps({"orphans": removed, "dry_run": dry}))
    return 0


def cli_constraints(argv: list[str]) -> int:
    """List or drop table CHECK constraints (sparkless; ADDING one
    requires the validation scan, so it lives in
    maintenance.add_constraint): ``constraints <dataset-dir>`` lists,
    ``constraints <dataset-dir> drop <name>`` drops."""
    if len(argv) not in (1, 3) or (len(argv) == 3 and argv[1] != "drop"):
        print("usage: ... constraints <dataset-dir> [drop <name>]",
              file=sys.stderr)
        return 2
    if len(argv) == 3:
        from .maintenance import drop_constraint

        drop_constraint(argv[0], argv[2])
    from .datasource import load_constraints

    print(json.dumps({"constraints": load_constraints(argv[0])}))
    return 0


def cli_rollback(argv: list[str]) -> int:
    """Restore an earlier version as the published head (metadata
    only): ``rollback <dataset-dir> <version>``."""
    if len(argv) != 2:
        print("usage: ... rollback <dataset-dir> <version>",
              file=sys.stderr)
        return 2
    from .maintenance import rollback

    v = rollback(argv[0], int(argv[1]))
    print(json.dumps({"restored": int(argv[1]), "version": v}))
    return 0


def cli_refs(argv: list[str]) -> int:
    """List a dataset's named refs: ``refs <dataset-dir>``."""
    if len(argv) != 1:
        print("usage: ... refs <dataset-dir>", file=sys.stderr)
        return 2
    from .datasource import load_refs

    refs = load_refs(argv[0])
    print(json.dumps([{"name": n, **r}
                      for n, r in sorted(refs.items())], indent=2))
    return 0


def cli_set_sort_order(argv: list[str]) -> int:
    """Metadata-only sort-order change from the shell:
    ``set_sort_order <dataset-dir> [col ...]`` (no cols = clear).
    Prints the committed metadata-log version."""
    if not argv:
        print("usage: ... set_sort_order <dataset-dir> [col ...]",
              file=sys.stderr)
        return 2
    from .maintenance import set_sort_order

    v = set_sort_order(argv[0], list(argv[1:]))
    print(json.dumps({"version": v, "sort": argv[1:]}))
    return 0


def cli_eq_delete(argv: list[str]) -> int:
    """Equality DELETE from the shell — no Spark session at all:
    ``eq_delete <dataset-dir> "<condition>"`` commits the predicate as
    table metadata with a sequence number (Iceberg v2 equality
    deletes; maintenance._delete_where_eq is spark-free by
    construction). Every reader — Spark scans and the pure-Python
    codec twins alike — masks matching rows in files predating the
    delete. The single-file-tool spirit of the reference's CLIs
    (writer.py/reader.py), extended to row-level DML."""
    if len(argv) != 2:
        print('usage: ... eq_delete <dataset-dir> "<condition>"',
              file=sys.stderr)
        return 2
    from .maintenance import _delete_where_eq

    stats = _delete_where_eq(argv[0], argv[1])
    print(json.dumps(stats))
    return 0


COMMANDS = {
    "csv_to_custom": cli_csv_to_custom,
    "custom_to_csv": cli_custom_to_csv,
    "read_columns": cli_read_columns,
    "inspect_header": cli_inspect_header,
    "snapshots": cli_snapshots,
    "stats": cli_stats,
    "partitions": cli_partitions,
    "evolve_spec": cli_evolve_spec,
    "set_sort_order": cli_set_sort_order,
    "set_clustering": cli_set_clustering,
    "diff": cli_diff,
    "changelog": cli_changelog,
    "tag": cli_tag,
    "refs": cli_refs,
    "rollback": cli_rollback,
    "branch": cli_branch,
    "fast_forward": cli_fast_forward,
    "vacuum": cli_vacuum,
    "remove_orphans": cli_remove_orphans,
    "constraints": cli_constraints,
    "eq_delete": cli_eq_delete,
}


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] not in COMMANDS:
        print(f"usage: python -m columnar_format_spark.colf.cli "
              f"{{{'|'.join(COMMANDS)}}} ...", file=sys.stderr)
        return 2
    return COMMANDS[argv[0]](argv[1:])


if __name__ == "__main__":
    sys.exit(main())
