"""Hypothesis fuzz of the driver union-find tier (`_components_driver`)
against a naive BFS transitive closure — pure Python, no Spark session.

The Spark-level agreement between the driver and distributed tiers is
pinned in test_grouping.py; this file hammers the union-find itself with
arbitrary edge lists (duplicates, reversed orientations, self-loops, falsy
keys) since the raw-edge collect path feeds it edges UNnormalized by
design (no symmetrize/distinct shuffles).
"""

from __future__ import annotations

from collections import deque

from hypothesis import given, settings
from hypothesis import strategies as st

from polyfuzz_spark.operators.linkage import _components_driver

_keys = st.text(alphabet="ab c0", max_size=4)  # small alphabet → collisions
_edges = st.lists(st.tuples(_keys, _keys), max_size=60)


def _bfs_components(pairs):
    adj: dict[str, set[str]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    seen: set[str] = set()
    for start in adj:
        if start in seen:
            continue
        comp = []
        dq = deque([start])
        seen.add(start)
        while dq:
            v = dq.popleft()
            comp.append(v)
            for w in adj[v]:
                if w not in seen:
                    seen.add(w)
                    dq.append(w)
        rep = min(comp)
        for v in comp:
            out[v] = rep
    return out


@settings(max_examples=300, deadline=None)
@given(pairs=_edges)
def test_union_find_matches_bfs_closure(pairs):
    got = dict(_components_driver(pairs))
    assert got == _bfs_components(pairs)
