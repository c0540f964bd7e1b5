"""Hypothesis fuzz of the whole-batch gram/MinHash kernels vs the per-doc
reference implementations (pure numpy — no Spark session needed).

The fixed-corpus bit-identity tests live in test_pipeline_e2e.py; this file
drives ARBITRARY unicode inputs and every (n_gram_range, remove_space)
config the batched kernels accept, so windowing/packing edge cases (docs
shorter than n, all-space docs, separator-adjacent windows, multiset
duplicates) can't hide behind a friendly fixture.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from polyfuzz_spark.functions.pygrams import doc_grams_py
from polyfuzz_spark.operators.mapside import (
    _iter_gram_windows,
    _minhash_sigs_batched,
    _pack_grams_u64,
)
from polyfuzz_spark.operators.tfidf import TfidfConfig

# arbitrary text (unicode included — cleaning strips it), plus the cleaned
# alphabet so post-clean shapes get dense coverage
_texts = st.lists(
    st.one_of(
        st.text(max_size=30),
        st.text(alphabet="ab1 ", max_size=20),
    ),
    min_size=0,
    max_size=12,
)
_ranges = st.tuples(st.integers(1, 8), st.integers(1, 8)).map(
    lambda t: (min(t), max(t))
)


@settings(max_examples=150, deadline=None)
@given(keys=_texts, rng=_ranges, rm_space=st.booleans())
def test_gram_windows_match_perdoc(keys, rng, rm_space):
    cfg = TfidfConfig(n_gram_range=rng, remove_space_ngrams=rm_space)
    got: dict[int, list[int]] = {}
    for doc_of, g in _iter_gram_windows(keys, cfg):
        for d, gram in zip(doc_of.tolist(), g.tolist()):
            got.setdefault(d, []).append(gram)
    for i, k in enumerate(keys):
        exp = sorted(
            _pack_grams_u64(doc_grams_py(k or "", cfg)).tolist()
        )
        assert sorted(got.get(i, [])) == exp, f"doc {i}: {k!r}"


@settings(max_examples=60, deadline=None)
@given(keys=_texts, rng=_ranges)
def test_minhash_sigs_match_perdoc(keys, rng):
    cfg = TfidfConfig(n_gram_range=rng)
    num_hashes = 8
    r = np.random.default_rng(7)
    A = (r.integers(0, 2**63, size=num_hashes, dtype=np.uint64)
         << np.uint64(1)) | np.uint64(1)
    B = r.integers(0, 2**63, size=num_hashes, dtype=np.uint64)

    idx, sigs = _minhash_sigs_batched(keys, cfg, A, B)

    exp_idx, exp_sigs = [], []
    for i, k in enumerate(keys):
        g = _pack_grams_u64(list(set(doc_grams_py(k or "", cfg))))
        if not len(g):
            continue
        with np.errstate(over="ignore"):
            exp_sigs.append((g[:, None] * A[None, :] + B[None, :]).min(axis=0))
        exp_idx.append(i)
    assert idx.tolist() == exp_idx
    assert np.array_equal(sigs, np.asarray(exp_sigs, dtype=np.uint64).reshape(
        len(exp_idx), num_hashes
    ))
