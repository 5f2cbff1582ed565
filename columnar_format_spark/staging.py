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

import tempfile
from collections.abc import Callable
from typing import Hashable

_STAGED: dict[Hashable, str] = {}


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
