"""Multimodal plumbing contracts: frame-sampling reassembles to the exact
payload, and feature resize preserves shape/determinism (decode itself is
stubbed — the Spark-side schema/batch plumbing is what's under test)."""

import numpy as np

from polyfuzz_spark.api import lists_to_df
from polyfuzz_spark.operators.multimodal import (
    extract_features,
    resize_features,
    sample_frames,
    to_media,
)

PAYLOADS = ["a" * 130, "b" * 64, "short", "x"]


def test_frames_reassemble_exactly(spark):
    media = to_media(lists_to_df(spark, PAYLOADS), "doc_id", "key")
    rows = sample_frames(media, frame_size=64).collect()
    by_doc: dict = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.frame_idx)):
        by_doc.setdefault(r.doc_id, b"")
        by_doc[r.doc_id] += bytes(r.frame)
    for i, p in enumerate(PAYLOADS):
        assert by_doc[i] == p.encode()
    # 130 chars → 3 frames (64, 64, 2)
    assert sum(1 for r in rows if r.doc_id == 0) == 3


def test_resize_features_shape_and_determinism(spark):
    media = to_media(lists_to_df(spark, PAYLOADS), "doc_id", "key")
    feats = extract_features(media)
    out = {r.doc_id: r.feature for r in resize_features(feats, 8).collect()}
    assert all(len(v) == 8 for v in out.values())
    again = {r.doc_id: r.feature for r in resize_features(feats, 8).collect()}
    for k in out:
        assert np.allclose(out[k], again[k])
