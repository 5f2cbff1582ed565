"""End-to-end racing committers against one COLF dataset.

The metadata log is single-writer-per-dataset with an optimistic
``expected_parent`` guard (datasource.commit_snapshot) — the same
contract as Iceberg's HadoopTableOperations on plain filesystems.
test_colf_snapshots pins the guard at the unit level; this file races
REAL writers through the Spark write path: concurrent appenders (and a
retained compaction) with the documented retry-on-ColfFormatError
loop. The invariants that must hold whatever the interleaving:
exactly one committer wins each version (strictly increasing, no
duplicates), NO update is lost (the final row count equals initial +
every successful append), and every surviving snapshot's files are on
disk."""

import threading

import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import (
    load_snapshots,
    register,
)
from columnar_format_spark.colf.format import ColfFormatError


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


def _bind_session(spark) -> None:
    """PySpark 4 pins each Python thread to its own JVM thread, whose
    thread-local active session starts UNSET — and the Python data
    source lookup resolves through the active session, so a child
    thread's very first ``format("colf")`` write dies with
    DATA_SOURCE_NOT_FOUND. Any multi-threaded driver must bind the
    session per thread (generic PySpark behavior, not COLF-specific;
    also noted in register()'s docstring)."""
    spark._jvm.org.apache.spark.sql.classic.SparkSession \
        .setActiveSession(spark._jsparkSession)


def test_racing_appenders_and_compaction_lose_nothing(colf_spark,
                                                      tmp_path):
    from columnar_format_spark.colf.maintenance import compact

    p = str(tmp_path / "raceds")
    (colf_spark.range(1000).select(F.col("id").cast("int").alias("k"))
     .repartition(4).write.format("colf").mode("overwrite").save(p))

    APPENDS_PER_THREAD = 5
    ROWS_PER_APPEND = 10
    errors: list = []
    conflicts = {"n": 0}
    lock = threading.Lock()

    def appender(tid: int) -> None:
        try:
            _bind_session(colf_spark)
            for i in range(APPENDS_PER_THREAD):
                lo = 10_000 * (tid + 1) + i * ROWS_PER_APPEND
                df = (colf_spark.range(lo, lo + ROWS_PER_APPEND)
                      .select(F.col("id").cast("int").alias("k"))
                      .coalesce(1))
                for _ in range(50):  # documented retry loop
                    try:
                        df.write.format("colf").mode("append").save(p)
                        break
                    except Exception as exc:  # noqa: BLE001
                        # only the documented optimistic-concurrency
                        # error is retryable; anything else is a bug
                        if "concurrent commit" not in str(exc):
                            raise
                        with lock:
                            conflicts["n"] += 1
                else:
                    raise AssertionError("append starved after 50 retries")
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    def compactor() -> None:
        try:
            _bind_session(colf_spark)
            for _ in range(50):
                try:
                    compact(colf_spark, p, 2, retain=True)
                    return
                except Exception as exc:  # noqa: BLE001
                    if "concurrent commit" not in str(exc):
                        raise
                    with lock:
                        conflicts["n"] += 1
            raise AssertionError("compaction starved after 50 retries")
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=appender, args=(t,))
               for t in range(2)] + [threading.Thread(target=compactor)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errors, errors

    # no lost update: every append's rows are present exactly once
    expect = 1000 + 2 * APPENDS_PER_THREAD * ROWS_PER_APPEND
    got = colf_spark.read.format("colf").load(p)
    assert got.count() == expect
    assert got.select("k").distinct().count() == expect

    # the log is a clean single-writer history: strictly increasing,
    # duplicate-free versions, and every surviving snapshot readable
    snaps = load_snapshots(p)
    versions = [s["version"] for s in snaps]
    assert versions == sorted(set(versions))
    import os

    for s in snaps:
        for b in s["files"]:
            assert os.path.exists(os.path.join(p, b)), (s["version"], b)
    # 1 overwrite + 10 appends + 1 compaction commit all landed
    assert len(versions) == 12


def test_stale_writer_raises_not_clobbers(colf_spark, tmp_path):
    """A writer whose live set was computed against a superseded
    version must RAISE the documented error, and the interim commit it
    would have clobbered must stay intact — pinned deterministically
    by interleaving the commits by hand through the same API the
    writer uses."""
    from columnar_format_spark.colf.datasource import commit_snapshot

    p = str(tmp_path / "staleds")
    (colf_spark.range(100).select(F.col("id").cast("int").alias("k"))
     .coalesce(1).write.format("colf").mode("overwrite").save(p))
    snaps = load_snapshots(p)
    parent = snaps[-1]["version"]
    # interim committer wins version parent+1
    commit_snapshot(p, list(snaps[-1]["files"]), expected_parent=parent)
    # the stale writer (still believing `parent`) must fail loudly...
    with pytest.raises(ColfFormatError, match="concurrent commit"):
        commit_snapshot(p, [], expected_parent=parent)
    # ...and the interim commit is untouched
    snaps2 = load_snapshots(p)
    assert snaps2[-1]["version"] == parent + 1
    assert snaps2[-1]["files"] == snaps[-1]["files"]
