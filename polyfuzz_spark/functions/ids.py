"""Content-derived identifiers for corpus-scale paths.

Why 128 bits: a single ``xxhash64(key)`` id over n distinct keys collides
with expected count ≈ n²/2⁶⁵ — at the 10¹²-file design target that is
tens of thousands of silent merges, each fusing two distinct strings into
one node BEFORE matching/clustering ever sees them. Two independent
64-bit lanes push the expectation to n²/2¹²⁹ ≈ 1.5e-15 at the same n:
collision-free for any physically realizable corpus.

Representation: ``struct<h1: bigint, h2: bigint>`` — 16 fixed bytes on
the shuffle wire (vs 32+ for an md5 hex string), JVM-side to compute
(two xxhash64 codegen calls, no UDF), and a first-class Spark type for
equi-joins, groupBy, window partitioning, and ordering (lexicographic by
field, so sort-based shuffle and tie-breaks both work unchanged).

Where 64-bit ids remain correct and deliberately kept: salts, band/bucket
keys, term hashes inside bounded blocks, and any digest whose source
value travels alongside it (e.g. ``cluster_id = xxhash64(representative)``
where ``representative`` is the authoritative key) — there a collision
costs a few extra comparisons or is recoverable from the carried value,
never a silent identity merge. Cluster CONSUMERS therefore key on the
representative, not the digest: ``dup_cluster_sizes``/``golden_records``
group by ``rep``, and ``metrics.pairwise_f1`` prefers ``rep_doc_id`` over
``cluster_id`` when the assignments carry it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# second-lane salt: a fixed odd 64-bit constant (the 64-bit golden-ratio
# constant, as signed). The salt MUST be hashed FIRST: Spark's multi-arg
# xxhash64 chains columns through one 64-bit running state, so a trailing
# salt gives xxhash64(*cs, SALT) == hashLong(SALT, seed=xxhash64(*cs)) —
# lane 2 becomes a pure function of lane 1 and any h1 collision implies an
# h2 collision (the struct would have only 64-bit resistance). Hashing the
# salt first re-seeds the chain before the first data column, so the two
# lanes evolve from different states over the same inputs.
_LANE2_SALT = -7046029254386353131


def id_type(df, col: str) -> str:
    """DDL type string of an id column (``bigint``, ``string``,
    ``struct<h1:bigint,h2:bigint>`` …) — pandas-kernel output schemas must
    declare the SAME id type they were fed, not assume ``long``, or the
    128-bit struct ids (and string keys) break at the Arrow boundary."""
    return df.schema[col].dataType.simpleString()


def id_series(values, ddl: str):
    """pandas Series for an id column headed back through Arrow under
    declared type ``ddl``. Scalar int ids pin int64 so an EMPTY batch
    doesn't type as float64 (Arrow refuses float64→int casts even at 0
    rows); everything else (struct dicts, strings) stays object."""
    import pandas as pd

    dtype = "int64" if ddl in ("bigint", "int", "smallint", "tinyint") else (
        "object"
    )
    return pd.Series(values, dtype=dtype)


def keyable(v):
    """Hashable, totally-ordered key for an id value however it arrives at
    a Python kernel: Arrow hands struct ids over as dicts, a JVM collect
    hands them over as Rows (tuple subclass); scalars pass through. Field
    order is the schema order on both routes, so the keys line up."""
    if isinstance(v, dict):
        return tuple(v.values())
    if isinstance(v, tuple):  # pyspark Row included
        return tuple(v)
    return v


def content_id128(*cols: str | Column) -> Column:
    """128-bit content id over one or more columns, as
    ``struct<h1: bigint, h2: bigint>``.

    Deterministic under any partitioning (pure function of the values —
    never ``monotonically_increasing_id``), equal iff the inputs are
    equal up to xxhash64×2 collision (≈2⁻¹²⁹ per pair).
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.struct(
        F.xxhash64(*cs).alias("h1"),
        F.xxhash64(F.lit(_LANE2_SALT), *cs).alias("h2"),
    )
