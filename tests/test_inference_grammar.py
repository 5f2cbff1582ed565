"""Property test: the CSV-inference regexes (csv_ingest.INT_RE /
FLOAT_RE) must accept EXACTLY the strings Python's int()/float()
accept — that equivalence is what makes the distributed inference pass
reproduce the reference's type cascade (SURVEY.md §1.3, reference
writer.py:51-60 uses bare int()/float() calls).

Pure-Python (no Spark): the regexes are evaluated via re, mirroring
what Spark's rlike computes (Java and Python regex agree on this
character-class subset).
"""

import re

from hypothesis import given, settings, strategies as st

from columnar_format_spark.colf.csv_ingest import (
    _PAD_FLOAT,
    _PAD_INT,
    FLOAT_RE,
    INT_RE,
    NUM_WS,
)

INT_PAT = re.compile(INT_RE)
FLOAT_PAT = re.compile(FLOAT_RE)
# the engine's FUSED padding+literal patterns (csv_ingest._is_pyint /
# _is_pyfloat evaluate exactly these via rlike), verbatim
PAD_INT_PAT = re.compile(_PAD_INT)
PAD_FLOAT_PAT = re.compile(_PAD_FLOAT)
# the historical two-step strip (pre-fusion engine behavior), kept to
# assert the fused pattern ≡ strip-then-match on every probe
NUM_STRIP = re.compile(f"^{NUM_WS}+|{NUM_WS}+$")


def py_int_ok(s: str) -> bool:
    try:
        int(s)
        return True
    except (ValueError, TypeError):
        return False


def py_float_ok(s: str) -> bool:
    try:
        float(s)
        return True
    except (ValueError, TypeError):
        return False


# The grammar alphabet plus noise: digits, signs, separators, exponent
# markers, inf/nan letters, the whitespace int()/float() accept
# (incl. Unicode spaces U+00A0 / U+2007 / U+3000) AND the \x1c
# separator they REJECT (but str.strip() removes — csv_ingest's
# two-strip-set comment).
ALPHABET = "0123456789+-._eEiInNfFaAtTyY xX,\t\n\r\f\x0b\x85\x1c\xa0 　"


def test_ws_classes_match_python_exactly():
    """Exhaustive over every codepoint: BLANK_WS must be exactly the
    str.strip() set, NUM_WS exactly the int()/float() padding set —
    the sets csv_ingest's two-strip-set comment documents.  Fails if
    either the engine classes or CPython's whitespace tables drift."""
    from columnar_format_spark.colf.csv_ingest import BLANK_WS

    blank_pat = re.compile(f"{BLANK_WS}")
    num_pat = re.compile(f"{NUM_WS}")
    for cp in range(0x11000):  # BMP + astral start; WS is all < 0x3001
        ch = chr(cp)
        py_blank = ch.strip() == "" and (ch + "x").strip() == "x"
        # padding both sides, value unchanged — excludes digits/signs,
        # which int() consumes as part of the number, not as padding
        try:
            py_num = int(f"{ch}5{ch}") == 5
        except (ValueError, TypeError):
            py_num = False
        assert bool(blank_pat.fullmatch(ch)) == py_blank, hex(cp)
        assert bool(num_pat.fullmatch(ch)) == py_num, hex(cp)


@settings(max_examples=2000, deadline=None)
@given(st.text(alphabet=ALPHABET, min_size=0, max_size=12))
def test_int_regex_matches_python_int(s):
    got = bool(PAD_INT_PAT.fullmatch(s))
    assert got == py_int_ok(s)
    # fused pattern ≡ the two-step strip-then-match it replaced
    t = NUM_STRIP.sub("", s)
    assert got == bool(INT_PAT.fullmatch(t) if t else False)


@settings(max_examples=2000, deadline=None)
@given(st.text(alphabet=ALPHABET, min_size=0, max_size=12))
def test_float_regex_matches_python_float(s):
    got = bool(PAD_FLOAT_PAT.fullmatch(s))
    assert got == py_float_ok(s)
    t = NUM_STRIP.sub("", s)
    assert got == bool(FLOAT_PAT.fullmatch(t) if t else False)
