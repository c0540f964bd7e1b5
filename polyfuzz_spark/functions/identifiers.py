"""Code-identifier canonicalization: split camelCase / PascalCase /
snake_case / kebab-case / dotted names into a normalized token form so
identifiers written under different conventions match as the same entity.

The code-payload analog of PolyFuzz's ``clean_string`` preprocessing
(reference ``polyfuzz/models/_utils.py`` lowercases and strips
punctuation for prose): record linkage over source-code repositories
blocks and scores on identifiers/paths, where ``parseHTTPResponse``,
``parse_http_response`` and ``parse-http-response`` are one entity.

The split is three global regex rewrites (separators → space, lower/digit
followed by Upper → boundary, acronym followed by Word → boundary), then
lowercase + whitespace collapse — all JVM built-ins (codegen'd, map-side),
each with an exact ANSI-SQL twin (same RE2-compatible patterns; DuckDB
needs the explicit ``'g'`` flag where Spark replaces globally by default).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (pattern, spark replacement, duckdb replacement) applied in FIXED order
_REWRITES = (
    # separators (snake, kebab, dots, slashes) become spaces
    (r"[_\-./]+", " ", " "),
    # camelCase boundary: lower-or-digit followed by Upper
    (r"([a-z0-9])([A-Z])", "$1 $2", r"\1 \2"),
    # acronym boundary: ALLCAPS run followed by a capitalized word
    (r"([A-Z]+)([A-Z][a-z])", "$1 $2", r"\1 \2"),
    # collapse runs of spaces introduced by separator rewrites
    (r" +", " ", " "),
)


def identifier_norm(col: Column | str) -> Column:
    """Normalized identifier: boundary-split, lowercased, single-spaced,
    trimmed — ``parseHTTPResponse`` → ``parse http response``."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep, _ in _REWRITES:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(F.lower(c))


def identifier_norm_sql(expr: str) -> str:
    e = expr
    for pat, _, rep in _REWRITES:
        e = f"regexp_replace({e}, '{pat}', '{rep}', 'g')"
    return f"trim(lower({e}))"


def identifier_tokens(col: Column | str) -> Column:
    """The normalized tokens as an array (empty for the empty/blank
    identifier, matching the SQL twin's list semantics)."""
    n = identifier_norm(col)
    return F.when(F.length(n) == 0, F.array().cast("array<string>")).otherwise(
        F.split(n, " ")
    )


def identifier_tokens_sql(expr: str) -> str:
    n = identifier_norm_sql(expr)
    return (
        f"CASE WHEN length({n}) = 0 THEN CAST([] AS VARCHAR[]) "
        f"ELSE string_split({n}, ' ') END"
    )
