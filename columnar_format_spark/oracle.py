"""Local replica of the driver's correctness gate: run a registered
query on Spark and its oracle SQL on DuckDB over the same parquet
tables, then compare row count + column names + values exactly
(order-insensitive, columns sorted by name — same shape as the
driver's value-hash)."""

from __future__ import annotations

import datetime as _dt
import decimal as _dec
import math

import duckdb

from .registry import QUERIES

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def duckdb_conn(sf_dir: str):
    """Register every table present in sf_dir as a view (crafted probe
    dirs carry only the tables a query touches)."""
    import os

    con = duckdb.connect()
    for t in TABLES:
        if os.path.exists(f"{sf_dir}/{t}.parquet"):
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
            )
    return con


def _canon(v):
    """Canonicalize a cell for exact comparison across engines."""
    if isinstance(v, _dec.Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="seconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    return v


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(repr(_canon(r[i])) for i in order) for r in rows),
    ), [cols[i] for i in order]


def compare_query(spark, sf_dir: str, name: str) -> dict:
    """Run one query both ways; return a result dict with ok/diffs."""
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    out = {"name": name, "spark_rows": len(srows), "ok": True, "notes": []}
    if spec.oracle is None:
        out["notes"].append("rows-only (no oracle)")
        return out
    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(spec.oracle)
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
    finally:
        con.close()
    out["oracle_rows"] = len(orows)
    if sorted(scols) != sorted(ocols):
        out["ok"] = False
        out["notes"].append(f"column mismatch: spark={sorted(scols)} oracle={sorted(ocols)}")
        return out
    if len(srows) != len(orows):
        out["ok"] = False
        out["notes"].append(f"row count: spark={len(srows)} oracle={len(orows)}")
    sset, _ = _rowset(scols, [[r[c] for c in scols] for r in srows])
    oset, _ = _rowset(ocols, orows)
    if sset != oset:
        out["ok"] = False
        diff_s = [r for r in sset if r not in set(oset)][:3]
        diff_o = [r for r in oset if r not in set(sset)][:3]
        out["notes"].append(f"value mismatch; spark-only={diff_s} oracle-only={diff_o}")
    return out


def pandas_dtype_parity(spark, sf_dir: str, name: str) -> dict:
    """Driver-replica dtype check: the driver hashes values AFTER pandas
    materialization, where engine-level equality can break (e.g. DuckDB
    HUGEINT -> float64 `11.0` vs Spark bigint `11` — the q33 round-1/2
    failure).  Compare the numeric KIND (int vs float vs other) of every
    column after both engines round-trip through pandas."""
    spec = QUERIES[name]
    out = {"name": name, "ok": True, "notes": []}
    if spec.oracle is None:
        out["notes"].append("rows-only (no oracle)")
        return out
    spd = spec.fn(spark, sf_dir).toPandas()
    con = duckdb_conn(sf_dir)
    try:
        opd = con.sql(spec.oracle).df()
    finally:
        con.close()

    def kind(dt):
        k = dt.kind  # i/u int, f float, O object, b bool, M datetime
        return {"i": "int", "u": "int", "f": "float"}.get(k, k)

    for c in sorted(set(spd.columns) & set(opd.columns)):
        ks, ko = kind(spd[c].dtype), kind(opd[c].dtype)
        # nullable int columns legitimately surface as float64 on either
        # side when NULLs are present — only flag int-vs-float skew when
        # the float side has no NaNs (i.e. not NULL-induced).
        if ks != ko:
            null_induced = (
                (ks == "float" and ko == "int" and spd[c].isna().any())
                or (ko == "float" and ks == "int" and opd[c].isna().any())
            )
            if not null_induced:
                out["ok"] = False
                out["notes"].append(f"{c}: spark={spd[c].dtype} oracle={opd[c].dtype}")
    return out


def compare_all(spark, sf_dir: str, names=None) -> list[dict]:
    results = []
    for name in names or sorted(QUERIES):
        try:
            results.append(compare_query(spark, sf_dir, name))
        except Exception as e:  # keep iterating; report the failure
            results.append({"name": name, "ok": False,
                            "notes": [f"exception: {type(e).__name__}: {e}"]})
    return results
