"""Model-based check of the metadata-log tier: random interleavings of
appends / staged (WAP) commits / branch commits / publishes /
fast-forwards / rollbacks / vacuums, with the dataset's PUBLISHED
row-set compared against a pure-Python model after every step. The
invariants under test are exactly the ones a warehouse relies on:
staged/branch work never leaks into the published view, publishing
lands precisely the staged delta, rollback restores an exact earlier
state, and vacuum never changes any readable answer."""

import random

import pytest
from pyspark.sql import functions as F

from columnar_format_spark.colf.datasource import register
from columnar_format_spark.colf.format import ColfFormatError
from columnar_format_spark.colf.maintenance import (
    create_branch,
    fast_forward,
    publish_wap,
    rollback,
    vacuum,
)


@pytest.fixture(scope="module")
def colf_spark(spark):
    register(spark)
    return spark


def _read_keys(colf_spark, path, **opts):
    r = colf_spark.read.format("colf")
    for k, v in opts.items():
        r = r.option(k, v)
    return sorted(x[0] for x in r.load(path).select("k").collect())


def _write(colf_spark, path, keys, **opts):
    df = colf_spark.createDataFrame([(int(k),) for k in keys],
                                    "k int")
    w = df.coalesce(1).write.format("colf").mode("append")
    for k, v in opts.items():
        w = w.option(k, v)
    w.save(path)


@pytest.mark.parametrize("seed", [7, 23, 91])
@pytest.mark.slow
def test_random_interleavings_match_model(colf_spark, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / f"model{seed}")
    (colf_spark.createDataFrame([(0,), (1,)], "k int").coalesce(1)
     .write.format("colf").mode("overwrite").save(path))

    published = [0, 1]            # model of the published row-set
    history = {1: list(published)}  # version -> published keys
    cur_version = 1
    staged = {}                   # staged version -> its added keys
    branches = {}                 # name -> (base keys at fork/ff, delta)
    next_key = 2
    n_branches = 0

    for step in range(14):
        op = rng.choice(["append", "stage", "publish", "branch",
                         "branch_append", "fast_forward", "rollback",
                         "vacuum"])
        keys = list(range(next_key, next_key + rng.randint(1, 3)))

        if op == "append":
            _write(colf_spark, path, keys)
            next_key = keys[-1] + 1
            published = sorted(published + keys)
            cur_version += 1
            history[cur_version] = list(published)
        elif op == "stage":
            _write(colf_spark, path, keys, wap="true")
            next_key = keys[-1] + 1
            cur_version += 1
            staged[cur_version] = keys   # NOT in the published model
        elif op == "publish":
            if not staged:
                continue
            v = rng.choice(sorted(staged))
            publish_wap(path, v)
            published = sorted(published + staged.pop(v))
            cur_version += 1
            history[cur_version] = list(published)
        elif op == "branch":
            n_branches += 1
            name = f"b{n_branches}"
            create_branch(path, name)
            # a branch reads its FORK-time published state + delta
            branches[name] = (list(published), [])
        elif op == "branch_append":
            if not branches:
                continue
            name = rng.choice(sorted(branches))
            _write(colf_spark, path, keys, branch=name)
            next_key = keys[-1] + 1
            branches[name][1].extend(keys)
            cur_version += 1
        elif op == "fast_forward":
            if not branches:
                continue
            name = rng.choice(sorted(branches))
            fast_forward(path, name)
            published = sorted(published + branches[name][1])
            # fast-forward re-bases the branch onto the landed head
            branches[name] = (list(published), [])
            cur_version += 1
            history[cur_version] = list(published)
        elif op == "rollback":
            candidates = [v for v in history if v < cur_version]
            if not candidates:
                continue
            v = rng.choice(candidates)
            try:
                rollback(path, v)
            except ColfFormatError:
                continue  # target vacuumed — legitimately refused
            published = list(history[v])
            cur_version += 1
            history[cur_version] = list(published)
        elif op == "vacuum":
            vacuum(path, keep_last=rng.randint(1, 3))
            # never changes the published answer (checked below)

        got = _read_keys(colf_spark, path)
        assert got == published, (
            f"seed {seed} step {step} op {op}: published mismatch\n"
            f"  engine: {got}\n  model:  {published}")

    # branch heads must still read as their fork-time base + delta
    for name, (base, delta) in branches.items():
        want = sorted(base + delta)
        assert _read_keys(colf_spark, path, ref=name) == want, name
