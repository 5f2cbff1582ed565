"""COLF dataset maintenance: compaction.

One .colf file per write task is the right write-path shape, but a
long-lived dataset accumulates small files (each unsplittable, each a
scheduler task at read time). Compaction rewrites the dataset to a
target file count through the normal connector — stats manifest
included — and swaps directories so readers never see a half-written
dataset.

The reference has no dataset concept (single file, SURVEY.md §1.1);
this is engine infrastructure the directory convention requires.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession

from .datasource import dataset_files


def compact(spark: SparkSession, path: str, target_files: int) -> int:
    """Rewrite a COLF dataset directory to ``target_files`` part files.
    Returns the resulting file count. The rewrite goes to a sibling tmp
    dir first and is swapped in with directory renames (readers opening
    mid-compaction see either the old or the new complete dataset)."""
    if not os.path.isdir(path):
        raise ValueError(f"compact() needs a dataset directory, got {path}")
    if target_files < 1:
        raise ValueError("target_files must be >= 1")
    df = spark.read.format("colf").load(path)
    tmp = f"{path.rstrip(os.sep)}.compact-{uuid.uuid4().hex[:8]}"
    old = f"{path.rstrip(os.sep)}.old-{uuid.uuid4().hex[:8]}"
    df.repartition(target_files).write.format("colf").mode("overwrite").save(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return len(dataset_files(path))
