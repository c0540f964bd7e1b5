"""End-to-end entity-resolution pipeline tests (north-rule acceptance):
blocking → exact scoring → clustering reaches pairwise F1 ≥ 0.99 on labeled
candidate pairs, is resumable from checkpoint, and preserves the sha256
content invariant."""

import json
import shutil

from polyfuzz_spark.metrics import pairwise_f1
from polyfuzz_spark.plans.pipeline import ERConfig, ERPipeline
from polyfuzz_spark.sources.corpus import (
    assert_sha256_invariant,
    generate_corpus,
)

CFG = ERConfig(min_similarity=0.6, link_min_similarity=0.6)


def test_corpus_is_deterministic(spark):
    a = generate_corpus(spark, n_entities=50, seed=42, n_partitions=2)
    b = generate_corpus(spark, n_entities=50, seed=42, n_partitions=7)
    pa = a.orderBy("doc_id").toPandas()
    pb = b.orderBy("doc_id").toPandas()
    assert pa.content_sha256.tolist() == pb.content_sha256.tolist()
    assert assert_sha256_invariant(a) == 0
    assert pa.entity_id.nunique() == 50


def test_pipeline_f1_and_resume(spark, tmp_path):
    run_dir = str(tmp_path / "er")
    corpus = generate_corpus(spark, n_entities=150, seed=42)
    pipe = ERPipeline(spark, run_dir, CFG)
    summary = pipe.run(corpus)
    assert all(m["complete"] for m in summary.values())

    labels = corpus.select("doc_id", "entity_id")
    res = pairwise_f1(pipe.read("candidates"), labels, pipe.read("clusters"))
    assert res["f1"] >= 0.99, res
    assert res["precision"] >= 0.99, res

    # resume: wipe the last two stages, rerun without the corpus — earlier
    # checkpoints must carry it; output must be identical
    before = sorted(
        (r.doc_id, r.cluster_id) for r in pipe.read("clusters").collect()
    )
    for stage in ("matches", "clusters"):
        shutil.rmtree(f"{run_dir}/{stage}")
        (pipe._manifest(stage)).unlink()
    summary2 = ERPipeline(spark, run_dir, CFG).run(corpus=None)
    assert all(m["complete"] for m in summary2.values())
    after = sorted(
        (r.doc_id, r.cluster_id) for r in pipe.read("clusters").collect()
    )
    assert before == after

    # manifests carry lineage: row counts + score distribution
    mf = json.loads((pipe._manifest("scores")).read_text())
    assert mf["rows"] > 0 and "score_distribution" in mf


def test_sink_selection_parquet_vs_iceberg(spark, tmp_path):
    """The stage sink is one switch: no prefix → parquet under run_dir;
    a catalog prefix → DataFrameWriterV2 writeTo(createOrReplace) + read
    via spark.read.table (the Iceberg deployment shape — jars absent in
    the sandbox, so the writer call is captured with a stub)."""
    pq = ERPipeline(spark, str(tmp_path / "a"), ERConfig())
    assert pq.sink_kind() == "parquet"

    cfg = ERConfig(iceberg_table_prefix="cat.db.er_run1")
    ice = ERPipeline(spark, str(tmp_path / "b"), cfg)
    assert ice.sink_kind() == "iceberg"
    assert ice._table("scores") == "cat.db.er_run1_scores"

    calls = {}

    class _W:
        def __init__(self, table):
            self.table = table

        def createOrReplace(self):
            calls["table"] = self.table

    class _DF:
        def writeTo(self, table):
            return _W(table)

    ice._write_stage("matches", _DF())
    assert calls == {"table": "cat.db.er_run1_matches"}


def test_blocking_recall_on_planted_dups(spark):
    """Every same-entity pair must share ≥1 LSH band (candidate recall) on
    the planted-duplicate corpus."""
    import pyspark.sql.functions as F

    from polyfuzz_spark.operators.blocking import minhash_candidates

    corpus = generate_corpus(spark, n_entities=80, seed=7)
    docs = corpus.select("doc_id", F.col("content").alias("key"))
    cands = minhash_candidates(docs).where(F.col("from_id") < F.col("to_id"))
    lab = corpus.select("doc_id", "entity_id")
    truth = (
        lab.alias("a")
        .join(lab.alias("b"), F.col("a.entity_id") == F.col("b.entity_id"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("from_id"), F.col("b.doc_id").alias("to_id")
        )
    )
    missed = truth.join(cands, ["from_id", "to_id"], "left_anti").count()
    assert missed == 0


def test_mapside_blocking_recall_matches_jvm_path(spark):
    """The map-side numpy MinHash (bench/pipeline path) must also reach
    full candidate recall on planted duplicates, with ≥2 shared bands."""
    import pyspark.sql.functions as F

    from polyfuzz_spark.operators.mapside import (
        candidates_from_bands,
        minhash_bands_mapside,
    )

    corpus = generate_corpus(spark, n_entities=80, seed=7)
    docs = corpus.select("doc_id", F.col("content").alias("key"))
    bands = minhash_bands_mapside(docs)
    cands = candidates_from_bands(bands, None, min_shared_bands=2).where(
        F.col("from_id") < F.col("to_id")
    )
    lab = corpus.select("doc_id", "entity_id")
    truth = (
        lab.alias("a")
        .join(lab.alias("b"), F.col("a.entity_id") == F.col("b.entity_id"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("from_id"), F.col("b.doc_id").alias("to_id")
        )
    )
    missed = truth.join(cands, ["from_id", "to_id"], "left_anti").count()
    assert missed == 0
