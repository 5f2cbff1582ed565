"""Pure-Python CSV -> COLF ingest for the CLI (no Spark session).

Implements the reference's schema-inference semantics (SURVEY.md §1.3,
verified against /root/reference/writer.py behavior by probe — the
rules, not the code):

1. per column, try int32, demote to float64 on any non-int value,
   demote to utf8 on any non-float value — using Python int()/float()
   acceptance exactly, so quirks like "1_0" == 10 and "nan"/"inf"
   floats match the reference by construction;
2. blank or whitespace-only value ⇒ NULL and marks the column
   nullable; non-blank strings keep surrounding whitespace;
3. an all-blank column infers as nullable int32;
4. divergences (engine-defined, SURVEY.md §7 M3): int32 overflow
   raises ColfFormatError instead of crashing with struct.error, and a
   header-only CSV writes a valid 0-row file (all columns nullable
   int32) instead of raising.

The Spark DataFrame twin of these rules is csv_ingest.py (used for
dataset-scale ingest); differential tests pin the two to each other
and to the reference writer's files.
"""

from __future__ import annotations

import csv

from .format import ColfColumn, ColfFormatError, ColfSchema, write_colf


def _is_blank(v: str) -> bool:
    return v is None or v.strip() == ""


def infer_types(names: list[str], rows: list[dict]) -> list[ColfColumn]:
    cols = []
    for name in names:
        is_int = True
        is_float = True
        nullable = False
        for r in rows:
            v = r.get(name)
            if _is_blank(v):
                nullable = True
                continue
            if is_int:
                try:
                    int(v)
                    continue
                except ValueError:
                    is_int = False
            if is_float:
                try:
                    float(v)
                except ValueError:
                    is_float = False
        dtype = "int32" if is_int else ("float64" if is_float else "utf8")
        cols.append(ColfColumn(name, dtype, nullable))
    return cols


def csv_file_to_colf(csv_path: str, out_path: str,
                     version: int = 1) -> ColfSchema:
    with open(csv_path, newline="") as f:
        reader = csv.DictReader(f)
        if reader.fieldnames is None:
            raise ColfFormatError("No columns found in CSV")
        names = list(reader.fieldnames)
        rows = list(reader)

    columns_meta = infer_types(names, rows)
    schema = ColfSchema(len(rows), columns_meta)
    data: dict[str, list] = {}
    for col in columns_meta:
        vals: list = []
        for r in rows:
            v = r.get(col.name)
            if _is_blank(v):
                vals.append(None)
            elif col.type == "int32":
                vals.append(int(v))
            elif col.type == "float64":
                vals.append(float(v))
            else:
                vals.append(v)  # unstripped, like the reference
        data[col.name] = vals
    write_colf(out_path, schema, data, version=version)
    return schema
