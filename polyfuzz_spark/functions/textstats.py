"""Text-analysis scalar functions for training-data pipelines: token
counting, quality scoring, language-ID, document fingerprinting.

All pure Spark built-ins (codegen'd, pushdown-friendly); each has an exact
ANSI-SQL twin used by the DuckDB oracles, so the formulas are deliberately
expressible in both dialects (e.g. token count via length-difference rather
than split()+size, whose empty-string edge cases differ across engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# deterministic language marker lists (public keyword sets)
LANG_MARKERS: dict[str, list[str]] = {
    "python": ["def", "import", "self", "elif", "lambda", "None"],
    "java": ["public", "static", "void", "extends", "implements", "final"],
    "go": ["func", "package", "chan", "defer", "go", "fmt"],
    "js": ["function", "const", "let", "var", "=>", "typeof"],
    "en": ["the", "a", "of", "and", "to", "in"],
}


def token_count(col: Column | str) -> Column:
    """Whitespace token count = spaces + 1 (exact twin in SQL)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(F.length(F.trim(c)) == 0, F.lit(0))
        .otherwise(
            F.length(F.trim(c)) - F.length(F.replace(F.trim(c), F.lit(" "), F.lit(""))) + 1
        )
        .cast("bigint")
    )


def token_count_sql(expr: str) -> str:
    return (
        f"CASE WHEN length(trim({expr})) = 0 THEN 0 ELSE "
        f"length(trim({expr})) - length(replace(trim({expr}), ' ', '')) + 1 "
        f"END"
    )


# BPE-ish pre-tokenizer shape (GPT-2-style: letter runs, digit runs, and
# individual non-alphanumeric marks each count as one token); the pattern is
# valid in BOTH Java regex (Spark) and RE2 (DuckDB) so the oracle is exact
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def bpe_token_count(col: Column | str) -> Column:
    """Subword-style token count via the BPE-ish pre-tokenizer regex."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_TOKEN_RE), F.lit(0))).cast(
        "bigint"
    )


def bpe_token_count_sql(expr: str) -> str:
    return (
        f"CAST(len(regexp_extract_all({expr}, '{BPE_TOKEN_RE}')) AS BIGINT)"
    )


def alpha_ratio_milli(col: Column | str) -> Column:
    """⌊1000·(alphabetic chars / chars)⌋ — integer for oracle-stable hashing."""
    c = F.col(col) if isinstance(col, str) else col
    alpha = F.length(F.regexp_replace(F.lower(c), "[^a-z]", ""))
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(
        F.floor(F.lit(1000.0) * alpha / F.length(c))
    ).cast("bigint")


def alpha_ratio_milli_sql(expr: str) -> str:
    return (
        f"CASE WHEN length({expr}) = 0 THEN 0 ELSE CAST(floor(1000.0 * "
        f"length(regexp_replace(lower({expr}), '[^a-z]', '', 'g')) / "
        f"length({expr})) AS BIGINT) END"
    )


def quality_score_milli(col: Column | str,
                        min_tokens: int = 5, max_tokens: int = 100000) -> Column:
    """Toy quality score in [0, 1000]: alpha ratio gated by token-count
    bounds (the shape of a real quality filter; formula shared with SQL)."""
    c = F.col(col) if isinstance(col, str) else col
    tc = token_count(c)
    return F.when(
        (tc < min_tokens) | (tc > max_tokens), F.lit(0)
    ).otherwise(alpha_ratio_milli(c)).cast("bigint")


def quality_score_milli_sql(expr: str, min_tokens: int = 5,
                            max_tokens: int = 100000) -> str:
    tc = token_count_sql(expr)
    return (
        f"CASE WHEN ({tc}) < {min_tokens} OR ({tc}) > {max_tokens} THEN 0 "
        f"ELSE {alpha_ratio_milli_sql(expr)} END"
    )


def lang_marker_score(col: Column | str, lang: str) -> Column:
    """Count of distinct marker tokens present (exact, set-based)."""
    c = F.col(col) if isinstance(col, str) else col
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(F.array_distinct(F.split(c, " ")), markers))


def lang_id(col: Column | str) -> Column:
    """argmax language over marker hit counts; deterministic lexicographic
    tie-break (greatest over (score, reversed-name) struct)."""
    scored = [
        F.struct(
            lang_marker_score(col, lang).alias("s"), F.lit(lang).alias("l")
        )
        for lang in sorted(LANG_MARKERS, reverse=True)
    ]
    return F.greatest(*scored).getField("l")


def lang_id_sql(expr: str) -> str:
    """DuckDB twin: list_max() over (score, lang) structs — both engines
    compare structs lexicographically, so ties break identically (max lang
    name among equal scores)."""
    pieces = []
    for lang in sorted(LANG_MARKERS, reverse=True):
        markers = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
        pieces.append(
            f"{{'s': len(list_intersect(list_distinct(string_split({expr}, ' ')), "
            f"[{markers}])), 'l': '{lang}'}}"
        )
    return f"(list_max([{', '.join(pieces)}])).l"


def tokens(col: Column | str) -> Column:
    """Non-empty whitespace tokens as an array (shared tokenization for the
    repetition signals; exact twin in SQL)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(c, "\\s+"), lambda x: x != F.lit(""))


def tokens_sql(expr: str) -> str:
    return (
        f"list_filter(string_split_regex({expr}, '\\s+'), x -> x <> '')"
    )


def token_sort_key(col: Column | str) -> Column:
    """Tokens sorted and re-joined — the canonical form behind RapidFuzz's
    token_sort_ratio (cf. scorers/kernels.py:135): word order stops
    mattering, so reordered identifiers / import lists compare equal.
    Binary (codepoint) sort in both engines."""
    return F.array_join(F.array_sort(tokens(col)), " ")


def token_sort_key_sql(expr: str) -> str:
    # coalesce: DuckDB's array_to_string(NULL-or-empty list) is NULL where
    # Spark's array_join is ''
    return f"coalesce(array_to_string(list_sort({tokens_sql(expr)}), ' '), '')"


def dup_token_frac_milli(col: Column | str) -> Column:
    """⌊1000 · (tokens − distinct tokens) / tokens⌋ — repetition signal in
    the Gopher-rules family (Rae et al. 2021, "duplicate n-gram fraction"
    at n=1); 0 for token-free text."""
    t = tokens(col)
    n = F.size(t)
    return (
        F.when(n == 0, F.lit(0))
        .otherwise(
            F.floor(F.lit(1000.0) * (n - F.size(F.array_distinct(t))) / n)
        )
        .cast("bigint")
    )


def dup_token_frac_milli_sql(expr: str) -> str:
    t = tokens_sql(expr)
    return (
        f"CASE WHEN len({t}) = 0 THEN 0 ELSE CAST(floor(1000.0 * "
        f"(len({t}) - len(list_distinct({t}))) / len({t})) AS BIGINT) END"
    )


def dup_line_frac_milli(col: Column | str) -> Column:
    """⌊1000 · (lines − distinct lines) / lines⌋ — Gopher-style duplicate-line
    fraction; 0 for empty text. Boilerplate/template detector on multi-line
    corpora (the contract `documents` table is single-line, so this is
    exercised by unit tests on synthetic multi-line text)."""
    c = F.col(col) if isinstance(col, str) else col
    lines = F.split(c, "\n")
    n = F.size(lines)
    return (
        F.when(F.length(c) == 0, F.lit(0))
        .otherwise(
            F.floor(
                F.lit(1000.0) * (n - F.size(F.array_distinct(lines))) / n
            )
        )
        .cast("bigint")
    )


def dup_line_frac_milli_sql(expr: str) -> str:
    lines = f"string_split({expr}, chr(10))"
    return (
        f"CASE WHEN length({expr}) = 0 THEN 0 ELSE CAST(floor(1000.0 * "
        f"(len({lines}) - len(list_distinct({lines}))) / len({lines})) "
        f"AS BIGINT) END"
    )


def doc_fingerprint(col: Column | str, k: int = 8) -> Column:
    """Winnowing-style fingerprint: min md5 over k-char shingles (md5 is
    identical across Spark and DuckDB, so the oracle is exact)."""
    c = F.col(col) if isinstance(col, str) else col
    shingles = F.when(
        F.length(c) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - F.lit(k - 1)),
            lambda i: F.md5(c.substr(i, F.lit(k))),
        ),
    ).otherwise(F.array(F.md5(c)))
    return F.array_min(shingles)


def doc_fingerprint_sql(expr: str, k: int = 8) -> str:
    return (
        f"CASE WHEN length({expr}) >= {k} THEN "
        f"list_min(list_transform(generate_series(1, length({expr}) - {k - 1}), "
        f"i -> md5(substring({expr}, i, {k})))) ELSE md5({expr}) END"
    )
