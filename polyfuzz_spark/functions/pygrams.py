"""Python-side replicas of the P1/P2 string kernels (functions/normalize.py,
functions/ngrams.py) for map-side Arrow kernels — the streaming matcher and
the map-side vectorize/MinHash stages. Semantics must stay bit-identical to
the JVM versions (tested via cross-engine oracle parity)."""

from __future__ import annotations

import re

from ..operators.tfidf import TfidfConfig


def clean_py(s: str) -> str:
    # P1: lower → drop non-[a-z0-9 ] → collapse spaces → trim
    s = re.sub(r"[^a-z0-9 ]+", "", s.lower())
    return re.sub(r" +", " ", s).strip()


def grams_py(s: str, cfg: TfidfConfig) -> list[str]:
    # P2: sliding char windows for each n in the inclusive range
    out: list[str] = []
    for n in range(cfg.n_gram_range[0], cfg.n_gram_range[1] + 1):
        out.extend(s[i : i + n] for i in range(len(s) - n + 1))
    if cfg.remove_space_ngrams:
        out = [g for g in out if " " not in g]
    return out


def doc_grams_py(key: str, cfg: TfidfConfig) -> list[str]:
    s = clean_py(key) if cfg.clean_string else key
    return grams_py(s, cfg)
