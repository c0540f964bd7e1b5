"""PII / boilerplate scrubbing: emails, URLs, IPv4 addresses replaced by
typed placeholder tokens, with per-type match counts.

The privacy-scrub step of a training-data pipeline (C4 §2.2 removes pages
with bad words; CCNet/RefinedWeb-style cleaners replace emails/IPs/URLs
before training). All patterns are valid in BOTH Java regex (Spark) and
RE2 (DuckDB) — no lookaround, no backreferences — so every scrub has an
exact SQL twin.

Scale shape: pure map-side JVM `regexp_replace` / `regexp_count` over the
scan — no shuffle, no UDF, composes with partition pruning at any corpus
size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# order matters: URLs first (they may embed @ or dotted hosts), then
# emails, then bare IPv4
PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def scrub_text(col: Column | str) -> Column:
    """Text with every URL, then email, then IPv4 replaced by its
    placeholder token, applied in PATTERNS order."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, token in PATTERNS:
        c = F.regexp_replace(c, pat, token)
    return c


def scrub_text_sql(expr: str) -> str:
    e = expr
    for _, pat, token in PATTERNS:
        e = f"regexp_replace({e}, '{pat}', '{token}', 'g')"
    return e


def pii_count(col: Column | str, kind: str) -> Column:
    """Match count for one PATTERNS kind ('url' | 'email' | 'ip'),
    counted in PATTERNS order on the progressively-scrubbed text (an email
    inside a URL counts as the URL, matching what scrub_text replaces)."""
    c = F.col(col) if isinstance(col, str) else col
    for k, pat, token in PATTERNS:
        if k == kind:
            return F.regexp_count(c, F.lit(pat)).cast("bigint")
        c = F.regexp_replace(c, pat, token)
    raise ValueError(f"unknown kind {kind!r}")


def pii_count_sql(expr: str, kind: str) -> str:
    e = expr
    for k, pat, token in PATTERNS:
        if k == kind:
            return f"CAST(len(regexp_extract_all({e}, '{pat}')) AS BIGINT)"
        e = f"regexp_replace({e}, '{pat}', '{token}', 'g')"
    raise ValueError(f"unknown kind {kind!r}")
