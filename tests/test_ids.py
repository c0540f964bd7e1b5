"""128-bit content ids (functions/ids.py): determinism, lane independence,
and end-to-end flow of the struct id through the match/group machinery
(joins, windows, salting hash expressions all take struct keys)."""

from pyspark.sql import functions as F

from polyfuzz_spark.functions.ids import content_id128


def test_deterministic_and_partition_independent(spark):
    rows = [(f"key-{i}",) for i in range(200)]
    a = spark.createDataFrame(rows, "key string").repartition(2)
    b = spark.createDataFrame(rows, "key string").repartition(13)
    ida = a.select("key", content_id128("key").alias("id")).collect()
    idb = b.select("key", content_id128("key").alias("id")).collect()
    assert {(r.key, tuple(r.id)) for r in ida} == {
        (r.key, tuple(r.id)) for r in idb
    }


def test_lanes_are_independent(spark):
    """h1 == h2 for the same input would mean the salt lane collapsed —
    the second lane must be a different 64-bit stream."""
    df = spark.range(1000).select(
        content_id128(F.col("id").cast("string")).alias("cid")
    )
    same = df.where(F.col("cid.h1") == F.col("cid.h2")).count()
    assert same == 0
    # and each lane is individually collision-free on this sample
    assert df.select("cid.h1").distinct().count() == 1000
    assert df.select("cid.h2").distinct().count() == 1000


def test_lane2_not_chained_from_lane1(spark):
    """Spark's multi-arg xxhash64 chains columns through one running
    state, so a TRAILING salt makes h2 == hashLong(SALT, seed=h1) — a
    pure function of h1 (any h1 collision implies an h2 collision,
    collapsing the struct to 64-bit resistance). content_id128 hashes
    the salt FIRST; pin that h2 differs from the chained trailing-salt
    value for every sampled key."""
    from polyfuzz_spark.functions.ids import _LANE2_SALT

    df = spark.range(500).select(F.col("id").cast("string").alias("key"))
    bad = df.where(
        content_id128("key")["h2"]
        == F.xxhash64(F.col("key"), F.lit(_LANE2_SALT))
    ).count()
    assert bad == 0


def test_multi_column_id_differs_from_concat_ambiguity(spark):
    """("ab","c") and ("a","bc") must hash differently — xxhash64 over
    multiple columns is not a plain concat."""
    df = spark.createDataFrame(
        [("ab", "c"), ("a", "bc")], "x string, y string"
    )
    ids = df.select(content_id128("x", "y").alias("id")).collect()
    assert tuple(ids[0].id) != tuple(ids[1].id)


def test_struct_id_flows_through_group_path(spark):
    """add_groups derives struct doc_ids internally; the full TF-IDF
    grouper path (vectorize → cosine → window top-n → CC) must run and
    produce the same groups as before the id widening."""
    from polyfuzz_spark.api import PolyFuzzSpark

    m = PolyFuzzSpark("TF-IDF", spark).match(
        ["apple", "apples", "appl", "mouse", "house"],
        ["apple", "apples", "mouse", "house"],
    )
    m.group(link_min_similarity=0.75)
    wide = m.matches_pandas()
    assert "Group" in wide.columns
    rows = {r.From: r.Group for r in wide.itertuples()}
    # apple/apples cluster together under their min representative
    assert rows["apple"] == rows["apples"] == "apple"


def test_struct_ids_through_dense_embedding_kernel(spark):
    """The dense embedding top-k kernel must produce the same neighbor
    structure under struct ids as under long ids (rank-based codec:
    equality, exclude-self, and tie-breaks all survive the id widening)."""
    from polyfuzz_spark.operators.dense_cosine import embedding_dense_topk

    rows = [
        (0, [1.0, 0.0]),
        (1, [2.0, 0.0]),
        (2, [0.0, 1.0]),
        (3, [0.6, 0.8]),
    ]
    base = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    structed = base.select(
        content_id128(F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    long_out = {
        (r.query_id, r.neighbor_id, r.cos_milli)
        for r in embedding_dense_topk(
            base, base, k=1, exclude_self=True
        ).collect()
    }
    id_of = {
        r.vec_id: tuple(r.cid)
        for r in base.select(
            "vec_id",
            content_id128(F.col("vec_id").cast("string")).alias("cid"),
        ).collect()
    }
    struct_out = {
        (tuple(r.query_id), tuple(r.neighbor_id), r.cos_milli)
        for r in embedding_dense_topk(
            structed, structed, k=1, exclude_self=True
        ).collect()
    }
    assert struct_out == {
        (id_of[q], id_of[n], c) for q, n, c in long_out
    }


def test_struct_ids_refused_by_ann_paths(spark):
    import pytest

    from polyfuzz_spark.operators.knn import lsh_cosine_topk

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    ).select(
        content_id128(F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    with pytest.raises(NotImplementedError, match="struct ids"):
        lsh_cosine_topk(df, df, k=1, dim=2)


def test_struct_ids_bridge_the_lsh_fallback(spark, monkeypatch):
    """Over the broadcast budget, embedding_dense_topk bridges struct ids
    through a 64-bit surrogate into the LSH path and restores the
    original struct ids on the way out."""
    from polyfuzz_spark.operators import dense_cosine as dc

    rows = [(i, [float(i % 7 + 1), float((i * 3) % 5 + 1)]) for i in
            range(40)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).select(
        content_id128(F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    monkeypatch.setattr(dc, "BROADCAST_MAX_DOCS", 10)  # force fallback
    out = dc.embedding_dense_topk(
        df, df, k=2, exclude_self=True,
        lsh_conf={"n_planes": 2, "n_tables": 4},
    )
    f = dict(zip(out.schema.names, out.schema.fields))
    assert f["query_id"].dataType.typeName() == "struct"
    assert f["neighbor_id"].dataType.typeName() == "struct"
    got = out.collect()
    assert got, "LSH fallback returned nothing"
    valid = {tuple(r.vec_id) for r in df.select("vec_id").collect()}
    for r in got:
        assert tuple(r.query_id) in valid
        assert tuple(r.neighbor_id) in valid
        assert tuple(r.query_id) != tuple(r.neighbor_id)


def test_struct_ids_bridge_the_near_dup_lsh_fallback(spark, monkeypatch):
    """embedding_near_dup_pairs over the broadcast budget must ALSO take
    the surrogate bridge with struct ids (the twin of the dense_topk
    bridge) and keep its unordered-pair orientation on the restored
    struct ids."""
    from polyfuzz_spark.operators import dense_cosine as dc

    rows = [(i, [float(i % 5 + 1), float((i * 7) % 3 + 1)]) for i in
            range(30)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).select(
        content_id128(F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    monkeypatch.setattr(dc, "BROADCAST_MAX_DOCS", 10)  # force fallback
    out = dc.embedding_near_dup_pairs(
        df, threshold=0.95, lsh_conf={"n_planes": 2, "n_tables": 4}
    )
    f = dict(zip(out.schema.names, out.schema.fields))
    assert f["from_id"].dataType.typeName() == "struct"
    assert f["to_id"].dataType.typeName() == "struct"
    got = out.collect()
    assert got, "near-dup LSH fallback returned nothing"
    valid = {tuple(r.vec_id) for r in df.select("vec_id").collect()}
    seen = set()
    for r in got:
        fid, tid = tuple(r.from_id), tuple(r.to_id)
        assert fid in valid and tid in valid and fid < tid
        assert (fid, tid) not in seen  # each unordered pair exactly once
        seen.add((fid, tid))
        assert r.cos_milli >= 950


def test_surrogate_collision_raises(spark, monkeypatch):
    """A planted surrogate collision (constant surrogate expression) must
    raise from the injectivity guard instead of silently fanning out the
    restore join."""
    import pytest

    from polyfuzz_spark.operators import dense_cosine as dc

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    ).select(
        content_id128(F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    monkeypatch.setattr(dc, "BROADCAST_MAX_DOCS", 1)
    monkeypatch.setattr(dc, "_surrogate_expr", lambda c: F.lit(7))
    with pytest.raises(ValueError, match="surrogate collided"):
        dc.embedding_dense_topk(df, df, k=1)


def test_id_codec_rank_semantics():
    """dense_cosine._id_codec (pure python): struct ids map to ranks that
    preserve equality and total order; scalar ids pass through; query-side
    ids absent from the corpus map to -1 (never equal to a rank)."""
    from polyfuzz_spark.operators.dense_cosine import _id_codec, _q_cmp

    vals = [{"h1": 3, "h2": 9}, {"h1": 1, "h2": 5}, {"h1": 3, "h2": 1}]
    emit, cmp_, lookup = _id_codec(vals)
    assert list(emit) == vals
    # sorted key order: (1,5) < (3,1) < (3,9) → ranks 1,?,? per position
    assert list(cmp_) == [2, 0, 1]
    q = _q_cmp([{"h1": 3, "h2": 1}, {"h1": 7, "h2": 7}], lookup)
    assert list(q) == [1, -1]

    emit2, cmp2, lk2 = _id_codec([5, 3, 9])
    assert lk2 is None and list(cmp2) == [5, 3, 9]
    assert list(_q_cmp([9, 5], lk2)) == [9, 5]


def test_read_corpus_derived_id_is_128bit_struct(spark, tmp_path):
    """read_corpus without a doc_id column derives the struct id — unique
    per (repo, path, commit) and stable across re-reads."""
    import pandas as pd

    from polyfuzz_spark.sources.ingest import read_corpus

    pdf = pd.DataFrame(
        {
            "repo": ["r1", "r1", "r2"],
            "path": ["a.py", "b.py", "a.py"],
            "commit": ["c1", "c1", "c1"],
            "lang": ["py"] * 3,
            "content": ["x", "y", "x"],
        }
    )
    p = str(tmp_path / "corpus")
    spark.createDataFrame(pdf).write.parquet(p)
    got = read_corpus(spark, p, "parquet")
    field = dict(zip(got.schema.names, got.schema.fields))["doc_id"]
    assert {f.name for f in field.dataType.fields} == {"h1", "h2"}
    ids = [tuple(r.doc_id) for r in got.collect()]
    assert len(set(ids)) == 3
    again = [tuple(r.doc_id) for r in read_corpus(spark, p, "parquet").collect()]
    assert set(ids) == set(again)
