"""CSV ingestion with the REFERENCE's schema-inference semantics
(SURVEY.md §1.3), reimplemented as a distributed DataFrame pass — NOT
Spark's built-in inferSchema, whose rules differ (LongType, no
blank→null-after-trim, bool/date branches).

Reference rules (verified by probes, SURVEY.md §1.4; writer.py:33-68):
1. Per column, try int32 first, then float64, else utf8. A value is
   "int" iff Python ``int(v)`` accepts it (optional sign, underscores
   between digits, surrounding whitespace); "float" iff ``float(v)``
   accepts it (incl. nan/inf/infinity, exponents, underscores).
2. Empty or whitespace-only value ⇒ NULL and the column is nullable.
   Non-blank strings keep their whitespace (only the emptiness test
   strips; writer.py:129-131). NULL ≡ "" by construction.
3. An all-blank column infers as nullable int32.
4. Int values outside int32 crash the reference writer with a raw
   struct.error (writer.py:111); here they raise a clean
   ColfFormatError naming the column (engine-defined, SURVEY.md §7 M3a).

Implementation: one Spark aggregation computes per-column type
verdicts (regex matches for the Python literal grammars — evaluated
distributed, map-side ANDs), then a second pass casts. Both passes are
pure DataFrame ops over an all-string CSV read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .format import ColfFormatError

# Python int() literal grammar (after strip): sign + digits with
# optional single underscores between digits.
INT_BODY = r"[+-]?[0-9](_?[0-9])*"
INT_RE = f"^{INT_BODY}$"
# Python float() literal grammar (after strip): covers 1.5, .5, 5.,
# 1e3, 1_000.5e-2, inf, infinity, nan (any case, optional sign). The
# mantissa alternation guarantees ≥1 digit (so ".", "e3", "" are
# rejected, same as Python float()).
FLOAT_BODY = (
    r"[+-]?("
    r"(([0-9](_?[0-9])*)(\.([0-9](_?[0-9])*)?)?|\.[0-9](_?[0-9])*)"
    r"([eE][+-]?[0-9](_?[0-9])*)?"
    r"|[iI][nN][fF]([iI][nN][iI][tT][yY])?"
    r"|[nN][aA][nN]"
    r")"
)
FLOAT_RE = f"^{FLOAT_BODY}$"

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1


def read_csv_raw(spark: SparkSession, path: str) -> DataFrame:
    """Header CSV, every column as raw string (no Spark inference)."""
    return (
        spark.read.option("header", True)
        .option("inferSchema", False)
        .option("nullValue", None)
        .option("emptyValue", "")
        .csv(path)
    )


# Python's whitespace handling, which the reference inherits, uses TWO
# DIFFERENT sets (probed exhaustively over all codepoints, Python 3.11):
# - str.strip() — the reference's BLANK test (writer.py vv.strip())
#   — strips the full Unicode whitespace set INCLUDING the ASCII
#   separators \x1c-\x1f ("\x1c".strip() == "").
# - int()/float() — the reference's NUMERIC parse — accept the same
#   set as padding EXCEPT \x1c-\x1f (int("\x855") == 5 and
#   int("\xa05") == 5, but int("\x1c5") raises).
# Spark's F.trim strips ONLY 0x20, so each test gets its own regex
# strip mirroring its Python set. The classes are spelled out
# explicitly (never \s): Java's \s is ASCII-only while Python re's
# \s is Unicode-aware, so a \s-based class would mean different
# things to the engine (Java) and to the pure-Python twin/tests.
# tests/test_inference_grammar.py re-derives both sets by probing
# Python and fails if these classes ever drift from it.
_UNI_WS = "\\x85\\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000"
BLANK_WS = f"[ \\t\\n\\r\\f\\x0b\\x1c-\\x1f{_UNI_WS}]"
NUM_WS = f"[ \\t\\n\\r\\f\\x0b{_UNI_WS}]"


# Each per-cell test is ONE fused regex (padding folded into the
# pattern) instead of a regexp_replace strip followed by a match —
# halves the regex work in the inference scan, which is the hot path
# of CSV ingest. tests/test_inference_grammar.py pins equivalence with
# Python's strip-then-parse semantics.
_PAD_INT = f"^{NUM_WS}*({INT_BODY}){NUM_WS}*$"
_PAD_FLOAT = f"^{NUM_WS}*({FLOAT_BODY}){NUM_WS}*$"


def _is_blank(c) -> F.Column:
    return c.isNull() | c.rlike(f"^{BLANK_WS}*$")


def _is_pyint(c) -> F.Column:
    return c.rlike(_PAD_INT)


def _is_pyfloat(c) -> F.Column:
    return c.rlike(_PAD_FLOAT)


def _num_body(c, pattern: str) -> F.Column:
    """The stripped, underscore-free numeric literal of a cell already
    known to match ``pattern`` (capture group 1 = the literal body)."""
    return F.regexp_replace(F.regexp_extract(c, pattern, 1), "_", "")


def infer_colf_types(df: DataFrame) -> list[dict]:
    """One distributed aggregation pass → per-column
    {name, type, nullable} with the reference's cascade."""
    aggs = []
    for name in df.columns:
        c = F.col(name)
        blank = _is_blank(c)
        aggs += [
            F.max(F.when(~blank & ~_is_pyint(c), 1).otherwise(0)).alias(f"{name}__notint"),
            F.max(F.when(~blank & ~_is_pyfloat(c), 1).otherwise(0)).alias(f"{name}__notfloat"),
            F.max(F.when(blank, 1).otherwise(0)).alias(f"{name}__nullable"),
            F.max(
                F.when(
                    ~blank & _is_pyint(c)
                    & ~_num_body(c, _PAD_INT).try_cast("decimal(38,0)")
                    .between(INT32_MIN, INT32_MAX),
                    1,
                ).otherwise(0)
            ).alias(f"{name}__int_overflow"),
        ]
    row = df.agg(*aggs).collect()[0]
    out = []
    for name in df.columns:
        if not row[f"{name}__notint"]:
            dtype = "int32"
            if row[f"{name}__int_overflow"]:
                raise ColfFormatError(
                    f"int32 overflow in column '{name}': value outside "
                    f"[{INT32_MIN}, {INT32_MAX}] (reference crashes here, "
                    f"writer.py:111; engine policy is a clean error)")
        elif not row[f"{name}__notfloat"]:
            dtype = "float64"
        else:
            dtype = "utf8"
        out.append({"name": name, "type": dtype,
                    "nullable": bool(row[f"{name}__nullable"])})
    return out


def apply_colf_schema(df: DataFrame, schema: list[dict]) -> DataFrame:
    """Cast the all-string frame to the inferred COLF schema with
    reference null semantics (blank ⇒ NULL; strings keep whitespace)."""
    cols = []
    for col in schema:
        c = F.col(col["name"])
        blank = _is_blank(c)
        if col["type"] == "int32":
            # extract + drop underscores, then cast (int32 range
            # verified during inference)
            v = _num_body(c, _PAD_INT).cast("int")
            cols.append(F.when(blank, None).otherwise(v).alias(col["name"]))
        elif col["type"] == "float64":
            t = F.lower(_num_body(c, _PAD_FLOAT))
            # Spark's cast-to-double rejects Python's inf/infinity
            # spellings — map them (and nan) explicitly
            v = (
                F.when(t.rlike(r"^[+]?(inf|infinity)$"), F.lit(float("inf")))
                .when(t.rlike(r"^-(inf|infinity)$"), F.lit(float("-inf")))
                .when(t.rlike(r"^[+-]?nan$"), F.lit(float("nan")))
                .otherwise(t.cast("double"))
            )
            cols.append(F.when(blank, None).otherwise(v).alias(col["name"]))
        else:
            cols.append(F.when(blank, None).otherwise(c).alias(col["name"]))
    return df.select(*cols)


def csv_to_colf(spark: SparkSession, csv_path: str, out_path: str) -> list[dict]:
    """EP1 equivalent (writer.py:145-212): CSV → inferred schema →
    COLF dataset. Unlike the reference, a header-only CSV produces a
    valid 0-row dataset (SURVEY.md §7 M3b). Returns the schema."""
    from .datasource import register

    register(spark)
    raw = read_csv_raw(spark, csv_path)
    schema = infer_colf_types(raw)
    typed = apply_colf_schema(raw, schema)
    typed.write.format("colf").mode("overwrite").save(out_path)
    return schema


def colf_to_csv(spark: SparkSession, colf_path: str, csv_path: str) -> None:
    """EP2 equivalent (reader.py:236-263): COLF → CSV, NULL → ''."""
    df = spark.read.format("colf").load(colf_path)
    (df.coalesce(1).write.option("header", True).option("nullValue", "")
     .option("emptyValue", "").mode("overwrite").csv(csv_path))
