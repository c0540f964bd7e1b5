"""Physical-plan audits: the optimizations the engine relies on at scale
must actually appear in the executed plans — predicate pushdown to the
parquet scan, column pruning (ReadSchema), map-side partial aggregation,
and whole-stage codegen. A regression here (e.g. a UDF blocking pushdown,
a lambda capturing extra columns) silently turns a 100 TB scan into a full
read, so these are tested, not assumed."""

import contextlib
import io

import pytest

from polyfuzz_spark.queries import (
    q_docs_by_lang_source,
    q_exact_dedup_prefix,
    q_levenshtein_top1,
)

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet_scan(spark):
    plan = plan_of(q_levenshtein_top1(spark, SF))
    assert "PushedFilters" in plan
    # both slice predicates must reach the scans, not sit in a Filter above
    assert "LessThan(doc_id,50)" in plan.replace(" ", "")
    assert "GreaterThanOrEqual(doc_id,450)" in plan.replace(" ", "")


def test_column_pruning_reads_only_needed_columns(spark):
    plan = plan_of(q_docs_by_lang_source(spark, SF))
    # documents has (doc_id, text, lang, source, n_chars); doc_id min/max,
    # token count over text, and the group keys are needed — nothing else
    read_schemas = [
        ln for ln in plan.splitlines() if "ReadSchema" in ln
    ]
    assert read_schemas, plan
    for ln in read_schemas:
        assert "title" not in ln
    joined = " ".join(read_schemas)
    assert "lang" in joined and "n_chars" in joined


def test_aggregation_is_map_side_combined(spark):
    plan = plan_of(q_exact_dedup_prefix(spark, SF))
    # partial + final hash aggregate pair around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "partial_count" in plan or "partial count" in plan.lower()


def test_whole_stage_codegen_present(spark):
    # simple mode marks codegen'd operators with "*(n)"; formatted mode
    # under AQE omits the annotation
    df = q_docs_by_lang_source(spark, SF)
    df.collect()  # AQE finalizes the physical plan only after execution
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    out = buf.getvalue()
    assert "WholeStageCodegen subtree" in out and "*(1)" in out


# every contract query that is not an intentional small-slice crossJoin
# (edit-distance scans on 50×50 slices, the broadcast threshold-table sweep)
# must plan WITHOUT nested-loop/cartesian joins — the regression net for
# the class of bug fixed in EmbeddingMatcher (non-equi self-join)
NO_NESTED_LOOP = [
    "tfidf_match_top1", "tfidf_transform_top1", "score_pairs_jw",
    "cluster_assignments", "exact_dedup_prefix",
    "ngram_jaccard_dups", "minhash_near_dups", "simhash_near_dups",
    "doc_stats", "docs_by_lang_source", "embedding_cosine_top3",
    "embedding_near_dups", "embedding_knn_lsh", "embedding_knn_ivf",
    "media_features", "media_frames", "top_terms", "events_hourly",
    "user_sessions", "dedup_corpus", "dedup_corpus_embedding",
    "sample_stratified", "mixture_resample", "train_test_split",
    # lm_* / dsir_weights are absent by intent: their 1-row totals tables
    # ride in via broadcast crossJoin (a deliberate BroadcastNestedLoopJoin
    # over ONE row); their model-join shapes are pinned in
    # tests/test_lm.py::test_scoring_plan_broadcasts_model and
    # tests/test_dsir.py::test_plan_shapes instead
    "bpe_pair_counts",
    # round-3 ER-family additions: blocked equi-joins + aggs throughout.
    # blocking_quality is absent by intent: its final projection
    # crossJoins four ONE-ROW aggregate tables (deliberate broadcast
    # nested loop over single rows, same class as the lm_* totals).
    "multifield_match_top1", "linkage_verdicts", "monge_elkan_top1",
    "golden_records", "cluster_assignments_incremental",
]


@pytest.mark.parametrize("name", NO_NESTED_LOOP)
def test_no_nested_loop_joins(spark, name):
    from polyfuzz_spark.queries import all_queries

    plan = plan_of(all_queries()[name](spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan, name
    assert "CartesianProduct" not in plan, name


def test_dedup_groupby_prunes_to_two_columns(spark):
    plan = plan_of(q_exact_dedup_prefix(spark, SF))
    for ln in plan.splitlines():
        if "ReadSchema" in ln:
            assert "text" in ln and "doc_id" in ln
            assert "lang" not in ln and "source" not in ln


def test_dense_jaccard_streamed_side_is_shuffle_free(spark):
    """The dense route's matmul consumer must read its Arrow-parallelized
    input directly — a shuffle (Exchange) before the mapInPandas would
    mean the re-parallelized driver table got re-partitioned for nothing
    (or worse, AQE-coalesced onto one task)."""
    from pyspark.sql import functions as F

    from polyfuzz_spark.operators.dedup import ngram_jaccard_pairs

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.col("text").alias("key"))
    )
    plan = plan_of(ngram_jaccard_pairs(docs, n=3, threshold=0.7))
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan, plan


def test_survivors_anti_join_broadcasts_drop_list(spark):
    """The pipeline's survivors stage anti-joins the full corpus against the
    (much smaller) non-representative drop list. The drop list must land on
    the broadcast side — a shuffle of the corpus here would re-partition
    100 TB to subtract a few percent of rows. AQE finalizes join strategy
    at execution, so assert on the post-run plan like the codegen test."""
    from pyspark.sql import functions as F

    from polyfuzz_spark.operators.dedup import drop_non_representatives

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assignments = (
        docs.select("doc_id")
        .where(F.col("doc_id") < 20)
        .withColumn(
            "rep_doc_id",
            (F.col("doc_id") - (F.col("doc_id") % 2)).cast("long"),
        )
    )
    kept = drop_non_representatives(docs, assignments)
    n_docs = docs.count()
    assert kept.count() == n_docs - 10  # 10 odd ids in [0, 20) dropped
    plan = plan_of(kept)
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    # the corpus side must not shuffle for the join: the only exchange
    # allowed anywhere in the plan is the broadcast one
    for ln in plan.splitlines():
        if "Exchange" in ln and "Broadcast" not in ln:
            raise AssertionError(f"corpus side shuffled: {ln}\n{plan}")


def _assert_no_broadcast_contains_explode(plan: str):
    """No BroadcastExchange subtree may contain a Generate (gram explode):
    broadcasting a gram table means driver-collecting it, and gram tables
    are child-sized in the stats but grams-per-doc× bigger in reality."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "BroadcastExchange" not in ln:
            continue
        depth = len(ln) - len(ln.lstrip(" :+-*"))
        for sub in lines[i + 1:]:
            sdepth = len(sub) - len(sub.lstrip(" :+-*"))
            if sub.strip() and sdepth <= depth:
                break
            assert "Generate" not in sub and "explode" not in sub, (
                f"gram explode under a broadcast:\n{ln}\n{sub}"
            )


def test_banded_verify_joins_never_broadcast_gram_tables(spark, monkeypatch):
    """Regression for the 250k-entity snapshot-bench driver OOM: the exact
    Jaccard verify joins in minhash_near_dups / dedup_against sit on
    localCheckpoint'd gram tables whose originStats inherit the explode's
    ~grams-per-doc× size undercount, so the static planner picked
    BroadcastHashJoin on tables that are GiB-scale in the regimes where the
    banded route actually fires. The merge hints must hold them at
    SortMergeJoin."""
    from pyspark.sql import functions as F

    import polyfuzz_spark.operators.dedup as dedup

    monkeypatch.setattr(dedup, "DENSE_MAX_VOCAB", 0)  # force banded route
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.col("text").alias("key"))
    )
    plan = plan_of(dedup.minhash_near_dups(docs, "key"))
    assert plan.count("SortMergeJoin") >= 4, plan
    _assert_no_broadcast_contains_explode(plan)

    corpus = docs.where(F.col("doc_id") % 10 != 0)
    batch = docs.where(F.col("doc_id") % 10 == 0)
    plan = plan_of(dedup.dedup_against(batch, corpus))
    assert plan.count("SortMergeJoin") >= 4, plan
    _assert_no_broadcast_contains_explode(plan)


def test_dense_containment_is_shuffle_free_and_joinless(spark):
    """The containment dense route must be the same shape as the Jaccard
    one: Arrow-parallelized driver table -> mapInPandas matmul, with no
    Exchange and — the regression that motivated the routing — no gram
    equi-join anywhere in the plan."""
    from pyspark.sql import functions as F

    from polyfuzz_spark.operators.dedup import ngram_containment_pairs

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.col("text").alias("key"))
    )
    plan = plan_of(ngram_containment_pairs(docs, n=3, threshold=0.9))
    assert "Exchange" not in plan, plan
    assert "ArrowEvalPython" in plan or "MapInPandas" in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_containment_sets_route_has_no_nested_loop(spark, monkeypatch):
    """Forced distinct-set reduction (DENSE_MAX_DOCS=0): the member
    expansion must stay equi-join-shaped — a BroadcastNestedLoopJoin in
    the expansion would be the all-pairs shape the route exists to
    avoid."""
    from pyspark.sql import functions as F

    from polyfuzz_spark.operators import dedup

    monkeypatch.setattr(dedup, "DENSE_MAX_DOCS", 0)
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", F.col("text").alias("key"))
    )
    plan = plan_of(dedup.ngram_containment_pairs(docs, n=3, threshold=0.9))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
