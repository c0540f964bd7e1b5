"""GPT-3-style quality classifier (operators/quality_classifier.py):
planted separation, numpy-reference parity of the distributed gradient
loop, Pareto admission semantics, and plan shapes. Training is iterative
(no SQL twin — the bpe_merges class)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.operators.dsir import doc_features
from polyfuzz_spark.operators.quality_classifier import (
    classifier_score,
    pareto_admit,
    train_quality_classifier,
)

PY = "def main import os return self None elif lambda yield"
PROSE = "the quick brown fox jumps over the lazy dog again and again"


def _train_score(spark, nb=1 << 12, iters=25):
    raw = spark.createDataFrame(
        [(i, PY) for i in range(6)] + [(i + 50, PROSE) for i in range(6)],
        ["doc_id", "text"],
    )
    trusted = spark.createDataFrame(
        [(i + 100, PY) for i in range(8)], ["doc_id", "text"]
    )
    w = train_quality_classifier(
        raw, trusted, n_buckets=nb, n_iters=iters
    )
    scored = classifier_score(raw, w, n_buckets=nb)
    return w, {r["doc_id"]: r["score"] for r in scored.collect()}


def test_planted_separation(spark):
    _, scores = _train_score(spark)
    py_scores = [scores[i] for i in range(6)]
    prose_scores = [scores[i + 50] for i in range(6)]
    assert min(py_scores) > max(prose_scores)
    assert all(0.0 < s < 1.0 for s in scores.values())


def test_matches_numpy_reference(spark):
    """The distributed gradient loop must match an independent numpy
    full-batch implementation run on the SAME design matrix (features
    extracted once via the already-fuzz-tested doc_features)."""
    nb, iters, lr, l2 = 1 << 10, 12, 0.5, 1e-4
    raw = spark.createDataFrame(
        [(0, "a b c"), (1, "c d"), (2, "e f g h")], ["doc_id", "text"]
    )
    trusted = spark.createDataFrame(
        [(0, "a b"), (1, "b c a")], ["doc_id", "text"]
    )

    def design(df, label):
        rows = {}
        for r in doc_features(df, n_buckets=nb).collect():
            rows.setdefault((label, r["doc_id"]), {}).setdefault(
                r["bucket"], 0
            )
            rows[(label, r["doc_id"])][r["bucket"]] += 1
        return rows

    rows = {**design(raw, 0), **design(trusted, 1)}
    keys = sorted(rows)
    X = np.zeros((len(keys), nb))
    y = np.array([k[0] for k in keys], dtype=float)
    for i, k in enumerate(keys):
        for b, c in rows[k].items():
            X[i, b] = 1.0 + np.log(c)
        X[i] /= np.sqrt((X[i] ** 2).sum())
    w = np.zeros(nb)
    b = 0.0
    n = len(keys)
    for _ in range(iters):
        z = X @ w + b
        r = y - 1.0 / (1.0 + np.exp(-z))
        g = X.T @ r
        w = (1.0 - lr * l2) * w + lr / n * g
        b = (1.0 - lr * l2) * b + lr / n * r.sum()

    got = train_quality_classifier(
        raw, trusted, n_buckets=nb, n_iters=iters, lr=lr, l2=l2
    ).collect()
    got_w = {int(r["bucket"]): r["weight"] for r in got}
    assert np.isclose(got_w.pop(-1), b, atol=1e-9)
    for bucket, expect in enumerate(w):
        if abs(expect) > 1e-15 or bucket in got_w:
            assert np.isclose(
                got_w.get(bucket, 0.0), expect, atol=1e-9
            ), bucket


def test_pareto_admit_matches_exact_replication(spark):
    """The admission predicate replicated in pure Python off the same
    md5 arithmetic must give the identical kept set — and the planted
    extremes behave as the GPT-3 rule intends (high scores mostly kept,
    low scores mostly dropped, neither absolutely)."""
    import hashlib

    alpha, salt = 9.0, "pareto"
    rows = [(i, 0.999) for i in range(200)] + [
        (i + 1000, 0.001) for i in range(200)
    ]
    scored = spark.createDataFrame(rows, ["doc_id", "score"])
    kept = {r["doc_id"] for r in pareto_admit(scored, alpha=alpha).collect()}

    def u_of(key):
        h = hashlib.md5(f"{key}:{salt}".encode()).hexdigest()[:12]
        return int(h, 16) / float(1 << 48)

    expect = {
        i for i, s in rows
        if s > 1.0 - ((1.0 - u_of(i)) ** (-1.0 / alpha) - 1.0)
    }
    assert kept == expect
    high_kept = sum(1 for i in kept if i < 1000)
    low_kept = len(kept) - high_kept
    assert high_kept > 190          # high scores almost always pass
    assert low_kept < 5             # the tail admits only a sliver


def test_pareto_admit_deterministic(spark):
    scored = spark.createDataFrame(
        [(i, 0.4) for i in range(200)], ["doc_id", "score"]
    )
    a = {r["doc_id"] for r in pareto_admit(scored).collect()}
    b = {r["doc_id"] for r in pareto_admit(scored).collect()}
    assert a == b


def test_empty_training_sides(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    w = train_quality_classifier(empty, empty, n_buckets=64, n_iters=3)
    assert w.count() == 0


def test_scoring_plan_broadcasts_weights(spark):
    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(30)], ["doc_id", "text"]
    )
    w = spark.createDataFrame(
        [(0, 0.1), (-1, 0.0)], "bucket bigint, weight double"
    )
    plan = classifier_score(docs, w, n_buckets=64)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "SortMergeJoin" not in plan
