"""Model-based test of the full DML matrix: a seeded random sequence
of append / CoW-delete / MoR-delete / eq-delete / CoW-update /
MoR-update / CoW-merge / MoR-merge / compact / vacuum / rollback ops
runs against one COLF dataset AND an in-memory pandas reference model;
after every op the dataset's visible rows must equal the model
exactly. This is the interplay net — each verb is pinned individually
elsewhere; sequences are where mask inheritance, sequence gating,
materialization, and count arithmetic can disagree."""

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import load_snapshots, register
from columnar_format_spark.colf.format import ColfFormatError
from columnar_format_spark.colf.maintenance import (
    compact,
    delete_where,
    merge_into,
    rename_column,
    rewrite_delete_files,
    rollback,
    update_where,
    vacuum,
)


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


def _visible(colf_spark, path, vname="v") -> pd.DataFrame:
    pdf = colf_spark.read.format("colf").load(path).toPandas()
    if vname != "v":
        # the fuzz may have renamed the value column; compare under
        # the canonical name (rename is pure metadata)
        pdf = pdf.rename(columns={vname: "v"})
    pdf = pdf.sort_values(["k", "v"]).reset_index(drop=True)
    return pdf.astype({"k": "int64", "v": "float64"})


def _model_sorted(model: pd.DataFrame) -> pd.DataFrame:
    return (model.sort_values(["k", "v"]).reset_index(drop=True)
            .astype({"k": "int64", "v": "float64"}))


def _check(colf_spark, path, model, opname, vname="v"):
    got = _visible(colf_spark, path, vname)
    want = _model_sorted(model)
    assert len(got) == len(want), (opname, len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_dtype=True), opname


@pytest.mark.slow
def test_random_dml_sequences_match_pandas_model(colf_spark, tmp_path):
    rng = random.Random(20260815)
    p = str(tmp_path / "modelds")

    def mkrows(lo, n):
        return pd.DataFrame({
            "k": range(lo, lo + n),
            "v": [float((lo + i) % 7) for i in range(n)]})

    model = mkrows(0, 120)
    (colf_spark.createDataFrame(model)
     .select(F.col("k").cast("int"), F.col("v").cast("double"))
     .repartition(3).write.format("colf").mode("overwrite").save(p))
    next_key = 1000

    # per-version model history: rollback restores version v ⇒ the
    # visible rows must equal what the model showed when v committed
    history: dict[int, pd.DataFrame] = {1: model.copy()}

    OPS = ["append", "del_cow", "del_mor", "del_eq", "upd_cow",
           "upd_mor", "mrg_cow", "mrg_mor", "compact", "vacuum",
           "rollback", "rewrite_dels", "rename"]
    vname = "v"  # current physical name of the value column
    for step in range(28):
        op = rng.choice(OPS)
        if op == "append":
            n = rng.randint(3, 15)
            rows = mkrows(next_key, n)
            next_key += n
            (colf_spark.createDataFrame(rows)
             .select(F.col("k").cast("int"),
                     F.col("v").cast("double").alias(vname))
             .coalesce(1).write.format("colf").mode("append").save(p))
            model = pd.concat([model, rows], ignore_index=True)
        elif op.startswith("del"):
            if model.empty:
                continue
            ks = sorted(model["k"])
            lo = rng.choice(ks)
            hi = lo + rng.randint(1, 50)
            cond = f"k >= {lo} AND k < {hi}"
            mode = {"del_cow": "cow", "del_mor": "mor",
                    "del_eq": "eq"}[op]
            s = delete_where(colf_spark, p, cond, mode=mode)
            expect = int(((model["k"] >= lo) & (model["k"] < hi)).sum())
            if mode != "eq":
                assert s["n_deleted_rows"] == expect, (step, op, s)
            model = model[~((model["k"] >= lo) & (model["k"] < hi))]
        elif op.startswith("upd"):
            if model.empty:
                continue
            ks = sorted(model["k"])
            lo = rng.choice(ks)
            hi = lo + rng.randint(1, 40)
            mode = "cow" if op == "upd_cow" else "mor"
            s = update_where(colf_spark, p, {vname: f"{vname} + 100"},
                             f"k >= {lo} AND k < {hi}", mode=mode)
            sel = (model["k"] >= lo) & (model["k"] < hi)
            assert s["n_updated_rows"] == int(sel.sum()), (step, op, s)
            model = model.copy()
            model.loc[sel, "v"] += 100
        elif op.startswith("mrg"):
            upd_keys = (model["k"].sample(
                n=min(5, len(model)), random_state=step).tolist()
                if len(model) else [])
            ins = mkrows(next_key, 4)
            next_key += 4
            src = pd.concat([
                pd.DataFrame({"k": upd_keys,
                              "v": [999.0] * len(upd_keys)}),
                ins], ignore_index=True).drop_duplicates("k")
            sdf = (colf_spark.createDataFrame(src)
                   .select(F.col("k").cast("int"),
                           F.col("v").cast("double").alias(vname)))
            mode = "cow" if op == "mrg_cow" else "mor"
            s = merge_into(colf_spark, p, sdf, ["k"], mode=mode)
            assert s["n_source_rows"] == len(src), (step, op, s)
            model = pd.concat(
                [model[~model["k"].isin(set(src["k"]))], src],
                ignore_index=True)
        elif op == "compact":
            compact(colf_spark, p, rng.randint(1, 3), retain=True)
        elif op == "rewrite_dels":
            # minor compaction is invisible to the model: the same
            # rows stay masked through coalesced sidecars
            s = rewrite_delete_files(colf_spark, p)
            assert s["n_delete_files_after"] <= max(
                1, s["n_delete_files_before"]), (step, s)
        elif op == "rename":
            # field-ID rename is pure metadata and invisible to the
            # model (compared under the canonical name); it must
            # refuse while live eq-deletes reference the column
            new = "v2" if vname == "v" else "v"
            head = load_snapshots(p)[-1]
            try:
                rename_column(p, vname, new)
                vname = new
            except ColfFormatError as exc:
                assert head.get("eq_deletes"), (step, str(exc))
                assert "equality deletes" in str(exc), (step, str(exc))
        elif op == "vacuum":
            vacuum(p, keep_last=rng.randint(1, 3))
        elif op == "rollback":
            snaps = load_snapshots(p)
            target = rng.choice([s["version"] for s in snaps])
            try:
                rollback(p, target)
                assert target in history, (step, target, sorted(history))
                model = history[target].copy()
            except ColfFormatError as exc:
                # vacuumed target: the documented loud refusal is the
                # other acceptable outcome — never wrong rows
                assert "vacuumed" in str(exc), (step, str(exc))
        head = load_snapshots(p)[-1]["version"]
        history[head] = model.copy()
        _check(colf_spark, p, model, f"step {step}: {op}", vname)


def test_merge_stats_gate_drives_discovery(colf_spark, tmp_path):
    """Round-11 stats-driven planning: with NDV sketches on the key,
    a source covering >= half the table's distinct keys makes
    merge_into skip the per-file probe (discovery='stats-full-scan');
    a narrow source keeps metadata pruning; with NO sketches the gate
    stays out of the way (key_ndv_estimate None, legacy behavior).
    Results are identical either way — the gate only moves cost."""
    p = str(tmp_path / "ds")
    base = colf_spark.range(0, 2000).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 9).cast("int").alias("v"))
    (base.repartitionByRange(4, "k").write.format("colf")
     .option("ndvColumns", "k").option("ndvK", "512")
     .mode("overwrite").save(p))

    wide = base.filter(F.col("k") % 3 != 0).select(
        "k", (F.col("v") + 100).cast("int").alias("v"))
    r1 = merge_into(colf_spark, p, wide, ["k"])
    assert r1["discovery"] == "stats-full-scan"
    assert r1["key_ndv_estimate"] is not None
    assert r1["n_replaced_rows"] == wide.count()

    narrow = colf_spark.createDataFrame(
        [(5, 999), (2001, 1)], "k int, v int")
    r2 = merge_into(colf_spark, p, narrow, ["k"])
    assert r2["discovery"] in ("metadata-in", "scan")
    assert r2["key_ndv_estimate"] is not None
    assert r2["n_replaced_rows"] == 1  # k=5 replaced, k=2001 inserted

    got = {r["k"]: r["v"] for r in
           colf_spark.read.format("colf").load(p)
           .filter("k in (5, 7, 2001, 9)").collect()}
    assert got == {5: 999, 7: 107, 2001: 1, 9: 0}

    # same merges on an unsketched dataset: gate inert, results equal
    p2 = str(tmp_path / "ds2")
    (base.repartitionByRange(4, "k").write.format("colf")
     .mode("overwrite").save(p2))
    r3 = merge_into(colf_spark, p2, wide, ["k"])
    assert r3["key_ndv_estimate"] is None
    assert r3["discovery"] != "stats-full-scan"
    assert r3["n_replaced_rows"] == r1["n_replaced_rows"]

    # MoR path honors the same gate
    r4 = merge_into(colf_spark, p2, wide, ["k"], mode="mor")
    assert r4["key_ndv_estimate"] is None
    r5 = merge_into(colf_spark, p, wide, ["k"], mode="mor")
    assert r5["discovery"] == "stats-full-scan"
    assert r5["key_ndv_estimate"] is not None


def test_multi_column_key_ndv_errs_conservative(colf_spark, tmp_path):
    """Round-12 advice: the composite-key NDV estimate must err HIGH
    (row-count-capped product of per-column estimates), so coverage
    errs LOW and the gate prefers probing. The old max-over-columns
    was a LOWER bound: a source covering >50% of ONE column's values
    but a sliver of the composite keys skipped metadata pruning."""
    from columnar_format_spark.colf.maintenance import _key_ndv_estimate

    p = str(tmp_path / "ds")
    # 400 rows, a: 20 distinct, b: 20 distinct, composite: 400 distinct
    base = colf_spark.range(0, 400).select(
        (F.col("id") % 20).cast("int").alias("a"),
        (F.col("id") / 20).cast("int").alias("b"),
        F.col("id").cast("int").alias("v"))
    (base.repartitionByRange(4, "a", "b").write.format("colf")
     .option("ndvColumns", "a,b").option("ndvK", "512")
     .mode("overwrite").save(p))
    est = _key_ndv_estimate(p, ["a", "b"])
    # product (exact sketches: 20*20), capped at 400 rows — NOT max=20
    assert est == pytest.approx(400, rel=0.05)

    # a source with 60% of column `a`'s values but only 12/400
    # composite keys (3% coverage) must KEEP metadata pruning — under
    # the old max-over-columns bound it read as 12/20 = 60% coverage
    # and skipped the probe
    narrow = base.filter((F.col("b") == 3) & (F.col("a") < 12)) \
        .select("a", "b", (F.col("v") + 1000).cast("int").alias("v"))
    assert narrow.count() == 12
    r = merge_into(colf_spark, p, narrow, ["a", "b"])
    assert r["discovery"] != "stats-full-scan"
    assert r["n_replaced_rows"] == 12
