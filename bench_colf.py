#!/usr/bin/env python
"""COLF-fidelity microbenchmark: reproduces the reference benchmark's
in-process protocol (BASELINE.md) on this engine's codec and prints one
JSON line comparing against the recorded reference numbers.

Protocol (mirrors /root/reference/benchmark/bench_selective_vs_csv.py
minus its subprocess-timing flaw, and BASELINE.md's in-process reruns):
- 10,000 rows x 5 cols (id int32, price float64 3dp, name/email/city
  utf8 drawn from small pools, faker-like cardinality), deterministic.
- time a full CSV scan extracting column 'name' (csv.DictReader, like
  the reference's csv_scan) vs this codec's selective read of 'name'
  (seeks + decompresses ONLY that block); min of 5 reps each.
- also: full read (all 5 cols), CSV->COLF write, compression ratio.

Reference baselines at the same scale (BASELINE.md, measured 2026-08-13
on this container): selective 6.98 ms, csv scan 17.64 ms, full read
33.97 ms, write 0.116 s, compression 2.56x.
"""

from __future__ import annotations

import csv
import io
import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from columnar_format_spark.colf.format import (  # noqa: E402
    ColfColumn,
    ColfSchema,
    read_all,
    read_columns,
    write_colf,
)

N_ROWS = 10_000


def gen_rows() -> list[dict]:
    rng = random.Random(42)
    firsts = [f"Fname{i:02d}" for i in range(50)]
    lasts = [f"Lastname{i:02d}" for i in range(50)]
    cities = [f"Cityville{i:03d}" for i in range(100)]
    rows = []
    for i in range(1, N_ROWS + 1):
        fn, ln = rng.choice(firsts), rng.choice(lasts)
        rows.append({
            "id": i,
            "price": round(rng.uniform(1.0, 999.0), 3),
            "name": f"{fn} {ln}",
            "email": f"{fn.lower()}.{ln.lower()}@example.com",
            "city": rng.choice(cities),
        })
    return rows


def time_min(fn, reps: int = 5) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    d = tempfile.mkdtemp(prefix="bench_colf_")
    csv_path = os.path.join(d, "medium.csv")
    colf_path = os.path.join(d, "medium.colf")
    rows = gen_rows()
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)

    schema = ColfSchema(N_ROWS, [
        ColfColumn("id", "int32", False),
        ColfColumn("price", "float64", False),
        ColfColumn("name", "utf8", False),
        ColfColumn("email", "utf8", False),
        ColfColumn("city", "utf8", False),
    ])
    columns = {c.name: [r[c.name] for r in rows] for c in schema.columns}

    t0 = time.perf_counter()
    write_colf(colf_path, schema, columns)
    write_s = time.perf_counter() - t0

    colf2_path = os.path.join(d, "medium_v2.colf")
    t0 = time.perf_counter()
    write_colf(colf2_path, schema, columns, version=2)
    write_v2_s = time.perf_counter() - t0

    def csv_scan_name():
        with open(csv_path, newline="") as f:
            return [row["name"] for row in csv.DictReader(f)]

    csv_scan_s = time_min(csv_scan_name)
    selective_s = time_min(lambda: read_columns(colf_path, ["name"]))
    full_read_s = time_min(lambda: read_all(colf_path))
    selective_v2_s = time_min(lambda: read_columns(colf2_path, ["name"]))
    full_read_v2_s = time_min(lambda: read_all(colf2_path))

    assert read_columns(colf_path, ["name"])["name"] == columns["name"]
    assert read_all(colf2_path) == columns

    # v3 striped (4 stripes of 2500): same reader API, per-stripe seeks
    import pyarrow as pa

    from columnar_format_spark.colf.format import (
        read_columns_arrow,
        read_stripes_info,
        write_colf_arrow_v3,
    )

    colf3_path = os.path.join(d, "medium_v3.colf")
    pa_types = {"id": pa.int32(), "price": pa.float64()}
    chunks = {c.name: [pa.array(columns[c.name],
                                type=pa_types.get(c.name, pa.string()))]
              for c in schema.columns}
    t0 = time.perf_counter()
    write_colf_arrow_v3(colf3_path, schema, chunks, stripe_rows=2500)
    write_v3_s = time.perf_counter() - t0
    selective_v3_s = time_min(
        lambda: read_columns_arrow(colf3_path, ["name"]))
    stripe_v3_s = time_min(
        lambda: read_columns_arrow(colf3_path, ["name"], stripe=2))
    assert read_columns(colf3_path, ["name"])["name"] == columns["name"]

    csv_bytes = os.path.getsize(csv_path)
    colf_bytes = os.path.getsize(colf_path)
    colf2_bytes = os.path.getsize(colf2_path)
    from columnar_format_spark.colf.format import read_schema

    print(json.dumps({
        "v2": {  # shipped opt-in encodings (format.py docstring), not
            # a what-if: same file measured through the same reader
            "write_s": round(write_v2_s, 4),
            "selective_read_ms": round(selective_v2_s * 1e3, 3),
            "full_read_ms": round(full_read_v2_s * 1e3, 3),
            "compression_ratio": round(csv_bytes / colf2_bytes, 2),
            "bytes_vs_v1": round(colf2_bytes / colf_bytes, 3),
            "encodings": {c.name: c.encoding
                          for c in read_schema(colf2_path).columns},
        },
        "v3": {  # striped: v2 encodings + independent row groups
            "stripes": read_stripes_info(colf3_path),
            "write_s": round(write_v3_s, 4),
            "selective_read_ms": round(selective_v3_s * 1e3, 3),
            "one_stripe_read_ms": round(stripe_v3_s * 1e3, 3),
            "compression_ratio": round(
                csv_bytes / os.path.getsize(colf3_path), 2),
        },
        "metric": "colf_selective_vs_csv",
        "rows": N_ROWS,
        "selective_read_ms": round(selective_s * 1e3, 3),
        "csv_scan_ms": round(csv_scan_s * 1e3, 3),
        "speedup_csv_over_colf": round(csv_scan_s / selective_s, 2),
        "full_read_ms": round(full_read_s * 1e3, 3),
        "write_s": round(write_s, 4),
        "compression_ratio": round(csv_bytes / colf_bytes, 2),
        "reference_baseline": {
            "selective_read_ms": 6.98, "csv_scan_ms": 17.64,
            "speedup": 2.5, "full_read_ms": 33.97,
            "write_s": 0.116, "compression_ratio": 2.56,
        },
        "note": ("deterministic faker-like synthetic data (same row count/"
                 "shape as the reference's sample_medium, different string "
                 "distribution) - timing comparisons are like-for-like in "
                 "protocol; the compression ratio is distribution-sensitive"),
    }))


if __name__ == "__main__":
    main()
