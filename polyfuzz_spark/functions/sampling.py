"""Deterministic (rescan-stable) sampling for training-data pipelines.

A 100 TB corpus is never sampled with ``df.sample()`` in production: its
Bernoulli draw depends on partition layout and seed plumbing, so a re-run
after a repartition (or a second consumer of the same pipeline) sees a
DIFFERENT subset. The verbs here key every keep/drop decision on a hash of
a stable row key instead — the same row is kept by every scan, every
executor count, every engine (the md5 backing makes the decision
reproducible in DuckDB/Trino/anything, which is also what makes the
contract query exactly oracle-checkable).

Shapes: pure map-side filters — no shuffle, no state, pushdown-friendly
(the filter sits directly over the scan). Rate changes are monotone:
raising a stratum's rate only ADDs rows to the kept set (the u-threshold
test keeps every row the lower rate kept), the property that lets a
pipeline grow a sample without resampling history.

The reference has no sampling surface (single-process pandas never needs
one); this module is part of the engine's training-data extensions, like
``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 12 hex digits = 48 bits: fits a double's 53-bit mantissa exactly, so
# u = h / 2^48 is EXACT in IEEE double and the `u < rate` comparison is
# bit-identical across engines (no 60-bit mantissa rounding to reason about)
_HEX_DIGITS = 12
_DENOM = float(1 << (4 * _HEX_DIGITS))


def deterministic_uniform(key_col: str, salt: str = "") -> Column:
    """U[0,1) driven only by (row key, salt): u = md5(key ':' salt)[0:12
    hex] / 2^48. Same key → same u on every scan and in every md5-capable
    engine. Change ``salt`` to draw an independent sample."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(key_col).cast("string"), F.lit(salt))),
            1,
            _HEX_DIGITS,
        ),
        16,
        10,
    ).cast("bigint")
    return h / F.lit(_DENOM)


def deterministic_sample(
    df: DataFrame, key_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Keep each row iff its deterministic uniform < ``rate``. Map-side
    filter; rescan-stable; monotone in ``rate``."""
    return df.where(deterministic_uniform(key_col, salt) < F.lit(float(rate)))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-weighting verb of a
    training-data pipeline (downsample the over-represented language /
    source, keep the rare one whole). ``rates`` maps stratum value → keep
    rate; unlisted strata use ``default_rate``. One map-side CASE + hash
    filter, no shuffle."""
    rate: Column = F.lit(float(default_rate))
    for value, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == F.lit(value), F.lit(float(r))).otherwise(
            rate
        )
    return df.where(deterministic_uniform(key_col, salt) < rate)


def mixture_resample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    weights: dict[str, float],
    salt: str = "",
) -> tuple[DataFrame, dict[str, float]]:
    """Curate the LARGEST deterministic subset whose strata hit the target
    ``weights`` proportions exactly in expectation (downsampling only —
    never upsampling): the mixture-specification verb of a training-data
    pipeline ("make the corpus 50% en / 25% es / 25% de"). Strata absent
    from ``weights`` are dropped (a mixture spec is exhaustive by intent).

    The feasible size is capped by the scarcest stratum relative to its
    weight: m = min_s(count_s / w_s); each stratum then keeps
    rate_s = m * w_s / count_s via the deterministic hash filter.

    Driver-side data: one aggregated row PER STRATUM (languages/sources —
    inherently small; this is an agg result, not a corpus collect). Scale
    shape: one map-side-combined count shuffle to derive rates, then a
    pure map-side filter. Returns (filtered df, the rate map) so callers
    can log/manifest the realized rates."""
    counts = {
        r["s"]: r["c"]
        for r in df.where(F.col(strata_col).isin(list(weights)))
        .groupBy(F.col(strata_col).alias("s"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    if not counts:
        return df.where(F.lit(False)), {}
    m = min(counts[s] / weights[s] for s in counts)
    rates = {s: m * weights[s] / counts[s] for s in counts}
    kept = df.where(F.col(strata_col).isin(list(counts)))
    return stratified_sample(
        kept, key_col, strata_col, rates, default_rate=0.0, salt=salt
    ), rates


def mixture_oracle_sql(
    table: str,
    key_sql: str,
    strata_col: str,
    weights: dict[str, float],
    select_cols: str,
    salt: str = "",
) -> str:
    """DuckDB twin of ``mixture_resample``: recomputes m and the per-stratum
    rates with the IDENTICAL double arithmetic order ((m * w) / c, counts
    from the same table) and applies the shared keep-predicate — so the
    oracle checks the rate DERIVATION, not just the filter."""
    in_list = ", ".join(f"'{s}'" for s in sorted(weights))
    w_case = "CASE " + " ".join(
        f"WHEN cnt.{strata_col} = '{s}' THEN {w!r}"
        for s, w in sorted(weights.items())
    ) + " END"
    pred = sample_oracle_predicate(key_sql, "rt.r", salt=salt)
    return f"""
WITH cnt AS (
  SELECT {strata_col}, count(*) AS c FROM {table}
  WHERE {strata_col} IN ({in_list}) GROUP BY 1
),
rt AS (
  SELECT {strata_col},
         (SELECT min(c / ({w_case})) FROM cnt) * ({w_case}) / c AS r
  FROM cnt
)
SELECT {select_cols} FROM {table} d
JOIN rt ON d.{strata_col} = rt.{strata_col}
WHERE {pred}
"""


def sample_oracle_predicate(
    key_sql: str, rate_sql: str, salt: str = ""
) -> str:
    """The DuckDB twin of the keep-predicate (shared so the contract query
    and its oracle cannot drift): same md5, same 12-hex slice, same 2^48
    denominator."""
    return (
        f"('0x' || substr(md5(CAST({key_sql} AS VARCHAR) || ':' || '{salt}'), "
        f"1, {_HEX_DIGITS}))::BIGINT / {_DENOM!r} < {rate_sql}"
    )


def split_by_key(
    df: DataFrame,
    key_col: str,
    train_frac: float = 0.8,
    salt: str = "split",
) -> DataFrame:
    """``df`` plus a ``split`` column ('train'/'test') assigned ATOMICALLY
    per ``key_col`` value: every row sharing the key lands on the same
    side. The code-corpus split discipline — files of one repository must
    not straddle the train/eval boundary (near-identical files within a
    repo are the rule, not the exception), the group-atomic primitive that
    :func:`~polyfuzz_spark.operators.dedup.leakage_safe_split` instantiates
    with near-dup cluster representatives. Map-side md5 filter: no shuffle,
    rescan-stable, monotone in ``train_frac``."""
    u = deterministic_uniform(key_col, salt)
    return df.withColumn(
        "split", F.when(u < F.lit(train_frac), F.lit("train")).otherwise(F.lit("test"))
    )


def split_by_key_oracle_sql(
    key_sql: str, train_frac: float = 0.8, salt: str = "split"
) -> str:
    """The DuckDB twin of :func:`split_by_key`'s split expression."""
    pred = sample_oracle_predicate(key_sql, repr(train_frac), salt)
    return f"CASE WHEN {pred} THEN 'train' ELSE 'test' END"
