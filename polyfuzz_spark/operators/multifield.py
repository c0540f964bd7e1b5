"""Multi-attribute record linkage: blocked candidate generation + weighted
field scoring as a reusable operator (the Fellegi–Sunter linear form).

The reference matches single string lists; real entity resolution scores
RECORDS — a name field with a fuzzy kernel, categorical fields by
equality, numeric fields by bounded closeness — under explicit weights.
This module is the engine-level API the ``multifield_match_top1`` /
``linkage_verdicts`` contract queries instantiate.

Scale shape: candidates come from an equi-join on a caller-chosen
COMPOUND blocking key (a low-cardinality key degenerates toward a cross
join as the table grows — the contract queries measured 25× pair-mass
reduction moving from a 6-value key to a compound one at sf0.1); the
from-side is pre-spread past the block count so the Python kernels
parallelize; every field rule is one column expression — fuzzy kernels
are Arrow-batched pandas UDFs, equality/numeric rules stay JVM-side.
NULL blocking keys never pair (equi-join semantics); NULL field values
score 0 for their term (coalesce), not NULL-poisoning the whole score.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class FieldSim:
    """One scored field: ``left``/``right`` are column names on the
    from/to side; ``kind`` is a fuzzy kernel name from
    ``scorers.editdistance.pair_scorer_udf`` ('jaro_winkler_unit',
    'monge_elkan', ...), 'equal' (1.0/0.0), or 'numeric' (closeness
    1 − min(|Δ|, scale)/scale); ``weight`` multiplies the unit-scale
    similarity."""

    left: str
    right: str
    weight: float
    kind: str = "jaro_winkler_unit"
    scale: float = 1.0


def blocked_pairs(
    f_side: DataFrame,
    t_side: DataFrame,
    block_on: list[str],
    n_partitions: int | None = None,
) -> DataFrame:
    """Candidate pairs via an equi-join on the blocking key columns
    (present on both sides). The from-side is repartitioned first so the
    join — and any Python kernel downstream — parallelizes past the
    number of distinct blocks."""
    spark = f_side.sparkSession
    n = n_partitions or spark.sparkContext.defaultParallelism * 2
    return f_side.repartition(n).join(t_side, block_on)


def field_score(pairs: DataFrame, fields: list[FieldSim]) -> Column:
    """The weighted linear score (unit scale) over ``fields`` — built in
    declaration order so the floating-point sum is deterministic (and
    mirrorable expression-for-expression in an oracle)."""
    from ..scorers.editdistance import (
        KNOWN_KERNELS,
        UNIT_SCALE_KERNELS,
        pair_scorer_udf,
    )

    valid_fuzzy = set(KNOWN_KERNELS) | set(UNIT_SCALE_KERNELS)
    for f in fields:
        if f.kind not in ("equal", "numeric") and f.kind not in valid_fuzzy:
            # fail at plan-build time with the kernel list — a bad name
            # inside the pandas UDF would only KeyError per-task at
            # runtime, after the blocked join already shuffled
            raise ValueError(
                f"unknown FieldSim kind {f.kind!r}; choose 'equal', "
                f"'numeric', or a kernel from {sorted(valid_fuzzy)}"
            )

    total = F.lit(0.0)
    for f in fields:
        lc, rc = F.col(f.left), F.col(f.right)
        if f.kind == "equal":
            sim = F.coalesce((lc == rc).cast("double"), F.lit(0.0))
        elif f.kind == "numeric":
            sim = F.coalesce(
                F.lit(1.0)
                - (
                    F.least(F.abs(lc - rc), F.lit(f.scale)).cast("double")
                    / F.lit(float(f.scale))
                ),
                F.lit(0.0),
            )
        else:
            raw = pair_scorer_udf(f.kind)(lc, rc)
            # percent-scale kernels ('ratio', 'WRatio', 'levenshtein_sim',
            # ...) return 0–100; the weighted-sum contract is unit scale,
            # so normalize here exactly as api.score_pairs dispatches on
            # UNIT_SCALE_KERNELS — otherwise FieldSim('name','name',0.6,
            # 'ratio') would contribute up to 60, not 0.6
            if f.kind not in UNIT_SCALE_KERNELS:
                raw = raw / F.lit(100.0)
            sim = F.coalesce(raw, F.lit(0.0))
        total = total + F.lit(f.weight) * sim
    return total


def multifield_score(
    f_side: DataFrame,
    t_side: DataFrame,
    block_on: list[str],
    fields: list[FieldSim],
    id_cols: tuple[str, str] = ("from_id", "to_id"),
    score_col: str = "score",
) -> DataFrame:
    """Blocked candidates + weighted field score in one call:
    (from_id, to_id, score) for every candidate pair."""
    pairs = blocked_pairs(f_side, t_side, block_on)
    return pairs.select(
        *id_cols, field_score(pairs, fields).alias(score_col)
    )
