"""Driver-environment compatibility: COLF must work in a BARE
SparkSession.

Round 3 lesson: every test session is built by ``get_spark()``
(conftest.py), which sets ``spark.sql.python.filterPushdown.enabled``
— so 389 green tests coexisted with all four COLF batch queries
crashing in the external driver's vanilla session
([DATA_SOURCE_PUSHDOWN_DISABLED]: PySpark 4.1 refuses to initialize a
Python DataSourceReader that defines ``pushFilters()`` while that conf
is false, and it defaults to false). The fix lives in
``colf.datasource.register()``, which now sets the conf at runtime.

This test closes the structural blind spot: it runs COLF queries in a
SUBPROCESS whose SparkSession is built with nothing but
``SparkSession.builder.master(...)`` — exactly what an external driver
does — so any future session-factory-only conf dependency fails here
first.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

# deliberately NO columnar_format_spark.session.get_spark(): this is
# the external-driver environment, default confs only.
spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false")
         .appName("vanilla-compat").getOrCreate())

import columnar_format_spark.queries  # noqa: F401  (registers queries)
from columnar_format_spark.registry import QUERIES

sf = "/root/testdata/sf0.001"
for name in ("q70_colf_roundtrip",        # write + full read
             "q75_colf_selective_read",   # selective read (columns option)
             "q76_colf_zonemap_pruning"): # pushFilters + manifest pruning
    n = QUERIES[name].fn(spark, sf).count()
    assert n > 0, f"{{name}} returned {{n}} rows"
    print(f"VANILLA-OK {{name}} rows={{n}}")
spark.stop()
"""


def test_colf_in_bare_spark_session():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT.format(repo=REPO)],
        capture_output=True, text=True, timeout=600,
        env={**os.environ},
    )
    assert proc.returncode == 0, (
        f"bare-session COLF run failed\nstdout:\n{proc.stdout[-4000:]}\n"
        f"stderr:\n{proc.stderr[-4000:]}"
    )
    for name in ("q70_colf_roundtrip", "q75_colf_selective_read",
                 "q76_colf_zonemap_pruning"):
        assert f"VANILLA-OK {name}" in proc.stdout
