"""Session-scoped staging of derived test/bench inputs.

Several queries exercise non-parquet sources (CSV ingest, JSONL
ingest, file-stream tailing) and need the testdata re-materialized in
that format once per session. This is THE one implementation of the
stage-once pattern: a process-wide registry keyed by caller-chosen
key, each entry a mkdtemp directory written exactly once.

The directories are process-temporary by design (mkdtemp under
$TMPDIR, reclaimed by the OS); a production pipeline reads its real
sources instead of staging copies, so no cleanup contract is needed
here beyond the OS's.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
from collections.abc import Callable
from typing import Hashable

_STAGED: dict[Hashable, str] = {}
_RUN_DIRS: dict[Hashable, str] = {}


def _cleanup_run_dirs() -> None:
    for d in _RUN_DIRS.values():
        shutil.rmtree(d, ignore_errors=True)


atexit.register(_cleanup_run_dirs)


def run_dir(key: Hashable, prefix: str) -> str:
    """A fresh per-invocation scratch directory for mutation queries.

    CoW queries copy a staged template and mutate the copy, and the
    DataFrame they return reads the mutated path lazily — so the copy
    cannot be deleted inline. Instead each key holds ONE live run dir:
    re-invoking the same query reclaims the previous run's directory
    (its result was collected long before), and whatever remains is
    removed at interpreter exit, so repeated sweeps/bench runs no
    longer accumulate dataset copies under $TMPDIR.
    """
    prev = _RUN_DIRS.pop(key, None)
    if prev is not None:
        shutil.rmtree(prev, ignore_errors=True)
    d = tempfile.mkdtemp(prefix=prefix)
    _RUN_DIRS[key] = d
    return d


def stage_once(key: Hashable, prefix: str, write: Callable[[str], None]) -> str:
    """Return the directory staged for ``key``, writing it on first use.

    ``write(dir)`` materializes the dataset; it runs at most once per
    process per key.
    """
    if key not in _STAGED:
        d = tempfile.mkdtemp(prefix=prefix)
        write(d)
        _STAGED[key] = d
    return _STAGED[key]


def clone_dataset(src: str, dst: str) -> None:
    """Clone a staged COLF dataset via HARDLINKS (fallback: copy).

    Mutation queries (CoW delete/merge/upsert) stage a template once
    and clone it per run; a byte copy of the dataset dominated those
    queries' fixed cost. Hardlinking is sound because the format never
    modifies a file in place: part files are immutable once renamed
    into the dataset (rewrites create new files; vacuum/overwrite
    os.remove() only unlinks), and every sidecar write
    (_manifest/_snapshots/_blooms) is tmp+rename, which rebinds the
    clone's directory entry without touching the template's inode.
    Cross-device clones (EXDEV) fall back to a real copy."""
    import os

    def link_or_copy(a: str, b: str) -> None:
        try:
            os.link(a, b)
        except OSError:
            shutil.copy2(a, b)

    shutil.copytree(src, dst, copy_function=link_or_copy)
