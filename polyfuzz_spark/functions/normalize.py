"""String cleaning (operator P1).

Reference semantics: ``/root/reference/polyfuzz/models/_tfidf.py:142-146``
(`_clean_string`): lowercase, strip everything outside ``[a-z0-9 ]``,
collapse whitespace runs to one space, trim.

Implemented with Spark built-ins only — stays inside whole-stage codegen,
never crosses the Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# After removing every char outside [a-z0-9 ], the only whitespace left is
# the literal space, so the collapse step only needs ' +'.
CLEAN_KEEP_RE = "[^a-z0-9 ]+"
CLEAN_COLLAPSE_RE = " +"


def clean_string(col: Column | str) -> Column:
    """lower → drop non-[a-z0-9 ] → collapse spaces → trim."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, CLEAN_KEEP_RE, "")
    c = F.regexp_replace(c, CLEAN_COLLAPSE_RE, " ")
    return F.trim(c)


def clean_string_sql(expr: str) -> str:
    """Same transform as ANSI/DuckDB SQL text (for oracle parity)."""
    return (
        f"trim(regexp_replace(regexp_replace(lower({expr}), "
        f"'[^a-z0-9 ]+', '', 'g'), ' +', ' ', 'g'))"
    )
