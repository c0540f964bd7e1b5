"""Cross-route containment fuzz: every route (dense matmul, distinct-set
reduction, gram join) must emit EXACTLY the rows of a pure-Python
reference over seeded random corpora designed to stress the hard cases —
identical gram sets (size ties → id orientation), strict subsets, empty
and sub-n strings (no grams → no pairs), and duplicate contents (the
distinct-set route's member expansion)."""

import random

import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.operators import dedup

N = 3
THRESHOLD = 0.5  # low enough that near-miss pairs appear on both sides


def _grams(s: str) -> frozenset:
    return frozenset(s[i:i + N] for i in range(len(s) - N + 1))


def _reference(rows: list[tuple[int, str]], min_grams: int = 1) -> set:
    sets = {
        i: _grams(s) for i, s in rows if len(_grams(s)) >= max(1, min_grams)
    }
    out = set()
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            na, nb = len(sets[a]), len(sets[b])
            cm = (1000 * inter) // min(na, nb)
            if cm < int(round(THRESHOLD * 1000)):
                continue
            if na < nb or (na == nb and a < b):
                out.add((a, b, cm))
            else:
                out.add((b, a, cm))
    return out


def _corpus(seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    alphabet = "abcd"  # tiny: subsets and ties are common, vocab <= 64
    rows = []
    for i in range(rng.randint(6, 14)):
        kind = rng.random()
        if kind < 0.15 and rows:
            rows.append((len(rows), rows[rng.randrange(len(rows))][1]))
        elif kind < 0.3 and rows:  # strict prefix-extension (containment 1000)
            base = rows[rng.randrange(len(rows))][1]
            tail = "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 8)))
            rows.append((len(rows), base + tail))
        elif kind < 0.4:
            rows.append((len(rows), rng.choice(["", "a", "ab"])))  # gramless
        else:
            rows.append((
                len(rows),
                "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 12))),
            ))
    return rows


def _spark_rows(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, key string")
    got = dedup.ngram_containment_pairs(df, n=N, threshold=THRESHOLD, **kw)
    return {
        (r.contained_id, r.container_id, r.containment_milli)
        for r in got.collect()
    }


@pytest.mark.parametrize("seed", range(6))
def test_all_routes_match_python_reference(spark, seed, monkeypatch):
    rows = _corpus(seed)
    want = _reference(rows)
    assert _spark_rows(spark, rows) == want  # dense (tiny vocab+corpus)
    monkeypatch.setattr(dedup, "DENSE_MAX_DOCS", 0)
    assert _spark_rows(spark, rows) == want  # distinct-set reduction
    monkeypatch.setattr(dedup, "DENSE_MAX_VOCAB", 0)
    assert _spark_rows(spark, rows) == want  # gram join


def test_min_grams_consistent_across_routes(spark, monkeypatch):
    rows = _corpus(99)
    want = _reference(rows, min_grams=4)
    assert _spark_rows(spark, rows, min_grams=4) == want
    monkeypatch.setattr(dedup, "DENSE_MAX_DOCS", 0)
    assert _spark_rows(spark, rows, min_grams=4) == want
    monkeypatch.setattr(dedup, "DENSE_MAX_VOCAB", 0)
    assert _spark_rows(spark, rows, min_grams=4) == want
