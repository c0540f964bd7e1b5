"""K2 — WRatio composite pinned hard (VERDICT r01 item 6).

The composite has no SQL oracle (rapidfuzz is not installed and DuckDB has
no twin), so it is pinned with (a) a golden table of pairs hand-computed
from the public WRatio spec — covering all three length-ratio branches
(< 1.5, [1.5, 8), >= 8) and their 0.95 / 0.9 / 0.6 scale factors — and
(b) property tests (symmetry, 0-100 bounds, identity) over random strings.

Hand derivations (ratio = 100 * 2*LCS / (la+lb), Indel similarity):
* ("abcd","dcba"): LCS=1 -> ratio 25; single-token token_ratio 25*0.95
  < 25 -> 25.
* ("abcd","acbd"): LCS=3 -> ratio 75 -> 75.
* ("hello world","world hello"): token_sort both "hello world" -> 100;
  *0.95 = 95 > ratio (LCS<=10 -> ratio<=90.9) -> 95.
* ("ab","abc"): len_ratio exactly 1.5 -> partial branch, scale 0.9;
  partial_ratio=100 ("ab" prefix window) -> 90.
* ("abc","abcdefgh"): len_ratio 8/3 -> scale 0.9; partial_ratio=100 -> 90
  (full ratio 2*3/11*100 = 54.55, partial_token 100*0.95*0.9=85.5).
* ("ab","abcdefghijklmnopq"): len_ratio 8.5 >= 8 -> scale 0.6;
  partial_ratio=100 -> 60 (full ratio 4/19*100=21.05, 100*0.95*0.6=57).
"""

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from polyfuzz_spark.scorers.kernels import (
    partial_ratio,
    ratio,
    token_ratio,
    wratio,
)

GOLDENS = [
    ("abcd", "abcd", 100.0),
    ("abcd", "dcba", 25.0),
    ("ab", "ba", 50.0),
    ("abcd", "acbd", 75.0),
    ("hello world", "world hello", 95.0),
    ("ab", "abc", 90.0),               # len_ratio == 1.5 boundary
    ("abc", "abcdefgh", 90.0),         # 1.5 <= len_ratio < 8
    ("ab", "abcdefghijklmnopq", 60.0),  # len_ratio >= 8 boundary (8.5)
    ("", "x", 0.0),
    ("x", "", 0.0),
    ("", "", 0.0),
    # round-3 arm completion (VERDICT r02 item 8): the full-ratio arm and
    # the partial_token arm must WIN in both scaled branches.
    # ratio wins at lr=3 (0.9 branch): letters 3 apart -> every len-3
    # window holds one letter (window ratio 33.3*0.9=30 < ratio 50)
    ("abc", "a" + "x" * 3 + "b" + "x" * 3 + "c", 50.0),
    # ratio wins at lr=8 exactly (0.6 branch): 200*3/27 = 22.22 beats
    # 33.3*0.6 = 20 and 33.3*0.57 = 19
    ("abc", "a" + "x" * 10 + "b" + "x" * 11 + "c", 200.0 * 3 / 27),
    # partial_token wins at lr=5 (0.9): shared token set -> ptsr=100 ->
    # 100*0.95*0.9 = 85.5 beats partial 60*0.9=54 and ratio 20
    ("ab cd", "cd ab " + "x" * 19, 85.5),
    # partial_token wins at lr=8 (0.6): 100*0.95*0.6 = 57 beats 36, 13.3
    ("ab cd", "cd ab " + "x" * 34, 57.0),
]


@pytest.mark.parametrize("a,b,expected", GOLDENS)
def test_wratio_goldens(a, b, expected):
    assert math.isclose(wratio(a, b), expected, abs_tol=1e-9), (
        a, b, wratio(a, b)
    )


def test_branch_scales_are_exact():
    """The three scale factors must be exactly 0.95, 0.9 and 0.6 applied to
    a perfect partial/token score."""
    # token branch: perfect token_ratio, weak char ratio
    assert wratio("hello world", "world hello") == token_ratio(
        "hello world", "world hello"
    ) * 0.95
    # partial branch, scale 0.9
    assert wratio("abc", "abcdefgh") == partial_ratio("abc", "abcdefgh") * 0.9
    # partial branch, scale 0.6
    long = "abcdefghijklmnopq"
    assert wratio("ab", long) == partial_ratio("ab", long) * 0.6


def test_len_ratio_boundaries():
    """Branch switch at exactly 1.5 and exactly 8 (strictly-less tests)."""
    # 3/2 = 1.5 -> partial branch (0.9 applies)
    assert wratio("ab", "abc") == 90.0
    # 16/2 = 8.0 -> scale drops to 0.6
    assert wratio("ab", "ab" + "z" * 14) == 60.0
    # 15/2 = 7.5 -> still 0.9
    assert wratio("ab", "ab" + "z" * 13) == 90.0


TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=25
)


@settings(max_examples=200, deadline=None)
@given(TEXT, TEXT)
def test_wratio_bounds_and_symmetry(a, b):
    w = wratio(a, b)
    assert 0.0 <= w <= 100.0
    assert math.isclose(w, wratio(b, a), abs_tol=1e-9)


@settings(max_examples=100, deadline=None)
@given(TEXT.filter(lambda s: len(s) > 0))
def test_wratio_identity(a):
    assert wratio(a, a) == 100.0


@settings(max_examples=100, deadline=None)
@given(TEXT, TEXT)
def test_ratio_matches_lcs_formula(a, b):
    from polyfuzz_spark.scorers.kernels import lcs_length

    total = len(a) + len(b)
    exp = 100.0 if total == 0 else 100.0 * 2 * lcs_length(a, b) / total
    assert math.isclose(ratio(a, b), exp, abs_tol=1e-9)


def test_adversarial_frozen_goldens():
    """78 adversarial pairs (window embeds, mid-window alignments, branch
    boundaries, unicode width/normalization, token dups — see
    tests/wratio_adversarial.py) pinned to FROZEN values: a kernel
    regression is an exact diff here, never silent recall drift. Update
    path: refreeze() after an intentional change, then review the diff."""
    import json

    from tests.wratio_adversarial import FROZEN, generate_pairs

    rows = json.loads(FROZEN.read_text())
    regen = generate_pairs()
    assert [(r["kind"], r["a"], r["b"]) for r in rows] == regen, (
        "generator drifted from the frozen corpus — refreeze() and review"
    )
    for r in rows:
        assert math.isclose(
            wratio(r["a"], r["b"]), r["wratio"], abs_tol=1e-9
        ), (r["kind"], r["a"], r["b"], wratio(r["a"], r["b"]), r["wratio"])
        assert math.isclose(
            partial_ratio(r["a"], r["b"]), r["partial_ratio"], abs_tol=1e-9
        ), (r["kind"], r["a"], r["b"])


def _exhaustive_partial_ratio(a: str, b: str) -> float:
    """Reference implementation: ratio of the shorter string against EVERY
    same-length window of the longer — the upper bound the block heuristic
    approximates."""
    if not a or not b:
        return 100.0 if a == b else 0.0
    short, long = (a, b) if len(a) <= len(b) else (b, a)
    if len(short) == len(long):
        return ratio(short, long)
    return max(
        ratio(short, long[o: o + len(short)])
        for o in range(len(long) - len(short) + 1)
    )


@settings(max_examples=300, deadline=None)
@given(TEXT, TEXT)
def test_partial_ratio_vs_exhaustive_slide(a, b):
    """Differential: the block heuristic never EXCEEDS the exhaustive
    slide, and embedded substrings always reach 100 (the heuristic's
    offset set contains every first-alignment window, so a verbatim embed
    is always found)."""
    h = partial_ratio(a, b)
    e = _exhaustive_partial_ratio(a, b)
    assert h <= e + 1e-9, (a, b, h, e)


@settings(max_examples=200, deadline=None)
@given(
    TEXT.filter(lambda s: len(s) >= 2),
    st.integers(min_value=0, max_value=30),
    st.integers(min_value=0, max_value=30),
)
def test_embedded_substring_scores_100(s, nl, nr):
    long = "z" * nl + s + "z" * nr
    assert partial_ratio(s, long) == 100.0


UNICODE_TEXT = st.text(
    alphabet=st.characters(
        min_codepoint=0x20, max_codepoint=0xFFFF,
        blacklist_categories=("Cs",),  # no lone surrogates
    ),
    max_size=20,
)


@settings(max_examples=200, deadline=None)
@given(UNICODE_TEXT, UNICODE_TEXT)
def test_wratio_unicode_bounds_and_symmetry(a, b):
    """Full-BMP fuzz: combining marks, wide forms, CJK — bounds, symmetry
    and identity must hold on code-point semantics (len() space)."""
    w = wratio(a, b)
    assert 0.0 <= w <= 100.0
    assert math.isclose(w, wratio(b, a), abs_tol=1e-9)
    if a:
        assert wratio(a, a) == 100.0


def test_wratio_goldens_cover_every_branch_line():
    """Trace-based branch audit (VERDICT r02 item 8): the golden table must
    execute EVERY line of the wratio composite — empty guard, the <1.5
    token branch, both scale assignments, and all three max() arms winning
    somewhere (pinned by the arm-specific goldens above)."""
    import sys

    from polyfuzz_spark.scorers import kernels

    code = kernels.wratio.__code__
    want = {
        ln for (_, _, ln) in code.co_lines()
        if ln is not None and ln > code.co_firstlineno
    }
    hit = set()

    def tr(frame, event, arg):
        if frame.f_code is code and event == "line":
            hit.add(frame.f_lineno)
        return tr

    sys.settrace(tr)
    try:
        for a, b, _ in GOLDENS:
            kernels.wratio(a, b)
    finally:
        sys.settrace(None)
    missing = want - hit
    assert not missing, f"wratio lines never executed: {sorted(missing)}"
