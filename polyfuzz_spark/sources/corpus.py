"""Deterministic synthetic source-code corpus (operator S2/S3 replacement).

The reference ships HTTP dataset loaders
(``/root/reference/polyfuzz/datasets/_load_data.py:6-40``); external data is
not allowed here, so the engine's flagship input — the BASELINE input_hint
table ``corpus(repo, path, commit, lang, content)`` — is synthesized
deterministically with planted near-duplicate clusters and ground-truth
``entity_id`` labels (used ONLY by evaluation, never by the pipeline).

Generation is distributed (spark.range → mapInPandas) and seed-stable: every
row's content derives from numpy PCG64 seeded by (seed, entity_id, variant),
so output is identical under any partitioning/parallelism — required for
resume and for the local[8]-vs-local[32] scaling benchmark to see identical
input.

Planted duplicates mirror realistic code-clone noise (FIXTURES.md F1):
whitespace churn, identifier rename, line shuffle, truncation. ~half of
each document's tokens are entity-unique identifiers so distinct entities
stay dissimilar under char-3-gram TF-IDF while variants stay > 0.8 cosine.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LANGS = ["python", "java", "go", "js", "md"]

_KEYWORDS = (
    "def return if else for while import class from try except raise with "
    "lambda yield assert break continue pass global del print input open "
    "len range dict list set tuple str int float bool None True False self "
    "func var const let public static void new this null package interface"
).split()


def _entity_tokens(rng: np.random.Generator, entity_id: int) -> list[str]:
    """Entity-unique identifiers (hex-ish) — keep cross-entity sim low."""
    return [
        f"{w}_{entity_id:x}_{rng.integers(0, 0xFFFF):04x}"
        for w in ("fn", "cls", "var", "tmp", "arg", "obj", "ctx", "buf")
    ]


def _base_content(rng: np.random.Generator, entity_id: int, n_lines: int) -> list[str]:
    uniq = _entity_tokens(rng, entity_id)
    vocab = _KEYWORDS + uniq + uniq  # ~50% entity-unique token mass
    lines = []
    for _ in range(n_lines):
        k = int(rng.integers(4, 10))
        toks = rng.choice(vocab, size=k)
        indent = "    " * int(rng.integers(0, 3))
        lines.append(indent + " ".join(toks))
    return lines


def _mutate(rng: np.random.Generator, lines: list[str], variant: int) -> list[str]:
    kind = variant % 4
    out = list(lines)
    if kind == 0:  # whitespace churn
        out = [
            ln.replace(" ", "  ", 1) if rng.random() < 0.3 else ln for ln in out
        ]
    elif kind == 1:  # identifier rename (suffix tweak on unique ids)
        out = [ln.replace("_", "_r", 1) if "_" in ln else ln for ln in out]
    elif kind == 2:  # local line shuffle
        idx = rng.permutation(len(out))
        out = [out[i] for i in idx]
    else:  # truncation (keep 80%)
        out = out[: max(1, int(len(out) * 0.8))]
    return out


def generate_corpus(
    spark: SparkSession,
    n_entities: int = 1000,
    max_copies: int = 4,
    n_lines: int = 12,
    seed: int = 42,
    n_partitions: int | None = None,
) -> DataFrame:
    """corpus(doc_id, repo, path, commit, lang, content, content_sha256,
    entity_id) — each entity appears 1..max_copies times (deterministic mix)."""

    schema = (
        "doc_id long, repo string, path string, commit string, lang string, "
        "content string, content_sha256 string, entity_id long"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for eid in pdf["id"].tolist():
                n_copies = (eid % max_copies) + 1
                base_rng = np.random.default_rng([seed, eid, 0])
                base = _base_content(base_rng, eid, n_lines)
                for variant in range(n_copies):
                    if variant == 0:
                        lines = base
                    else:
                        lines = _mutate(
                            np.random.default_rng([seed, eid, variant]),
                            base,
                            variant - 1,
                        )
                    content = "\n".join(lines)
                    doc_id = eid * max_copies + variant
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "repo": f"org{eid % 97}/proj{eid % 13}",
                            "path": f"src/module_{eid}_{variant}.py",
                            "commit": hashlib.sha1(
                                f"{seed}:{eid}:{variant}".encode()
                            ).hexdigest(),
                            "lang": LANGS[eid % len(LANGS)],
                            "content": content,
                            "content_sha256": hashlib.sha256(
                                content.encode()
                            ).hexdigest(),
                            "entity_id": eid,
                        }
                    )
            yield pd.DataFrame(rows)

    n_partitions = n_partitions or spark.sparkContext.defaultParallelism
    ents = spark.range(0, n_entities, numPartitions=n_partitions)
    return ents.mapInPandas(gen, schema=schema)


def assert_sha256_invariant(df: DataFrame) -> int:
    """Per-row invariant (BASELINE input_hint): sha256(content) must equal
    content_sha256 at every checkpoint. Returns violation count (0 = ok)."""
    return df.where(
        F.sha2(F.col("content"), 256) != F.col("content_sha256")
    ).count()
