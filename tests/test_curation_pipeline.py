"""End-to-end corpus-curation pipeline tests: scrub → strip → curate →
dedup → split → decontaminate, checkpointed and resumable (SURVEY §2.11
training-data-pipeline family; plumbing shared with the ER pipeline)."""

import json

import pytest
from pyspark.sql import functions as F

from polyfuzz_spark.functions.scrub import pii_count
from polyfuzz_spark.operators.decontam import ngram_contamination
from polyfuzz_spark.plans.curation import CurationConfig, CurationPipeline
from polyfuzz_spark.sources.corpus import generate_corpus

BANNER = "// SPDX-License-Identifier: FAKE-1.0 codegen banner do not edit"
# a 13-token phrase planted inline (doc-specific line prefix keeps the LINE
# cold for the boilerplate stripper while the token window stays shared)
LEAK = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett "
        "kilo lima mike")

# the synthetic corpus's identifier-heavy tokens sit ~527-700 alpha-milli,
# so the e2e config lowers the alpha gate; everything else is default
CFG = CurationConfig(boiler_min_docs=8, min_alpha_milli=400)

DUP_TEXT = (
    "shared helper module computing rolling checksum windows across "
    "buffered chunks while emitting progress events and validating "
    "boundary offsets against the manifest before flushing output"
)


def _corpus(spark):
    base = generate_corpus(spark, n_entities=40, seed=11)
    c = F.col("content")
    c = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(c, F.lit(
            "\ncontact admin@example.com via https://tracker.example/x "
            "from 10.1.2.3")),
    ).otherwise(c)
    c = F.when(
        F.col("doc_id") % 2 == 0, F.concat(F.lit(BANNER + "\n"), c)
    ).otherwise(c)
    c = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(c, F.lit("\nref"), F.col("doc_id").cast("string"),
                 F.lit(" " + LEAK)),
    ).otherwise(c)
    doctored = base.withColumn("content", c)

    extra = spark.createDataFrame(
        [
            (100001, "junk", "short.txt", "c0", "md", "x y z"),
            (100002, "junk", "loop.txt", "c0", "md", ("spam " * 400).strip()),
            (100010, "dup", "a.py", "c0", "python", DUP_TEXT),
            (100011, "dup", "b.py", "c0", "python", DUP_TEXT),
        ],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string",
    ).withColumn("entity_id", F.lit(-1).cast("long"))

    cols = ["doc_id", "repo", "path", "commit", "lang", "content",
            "entity_id"]
    return (
        doctored.select(cols).unionByName(extra.select(cols))
        .withColumn("content_sha256", F.sha2("content", 256))
    )


def _final_hash(pipe):
    return (
        pipe.read("final")
        .agg(F.sha2(F.concat_ws("", F.sort_array(
            F.collect_list(F.concat_ws("|", "doc_id", "split", "content"))
        )), 256))
        .collect()[0][0]
    )


def test_curation_pipeline_e2e(spark, tmp_path):
    corpus = _corpus(spark)
    pipe = CurationPipeline(spark, str(tmp_path / "cur"), CFG)
    summary = pipe.run(corpus)
    assert all(m["complete"] for m in summary.values())
    # manifests are self-profiling: every stage carries its wall, and every
    # stage after the first attributes its eager pre-checkpoint work
    assert all(m["wall_s"] > 0 for m in summary.values())
    assert all(
        m["pre_wall_s"] >= 0
        for s, m in summary.items() if s != "ingest"
    )

    final = pipe.read("final")

    # scrub: placeholders landed, nothing PII-shaped survives any stage
    assert summary["scrub"]["pii_scrubbed_total"] >= 3 * 20  # ≥20 docs * 3
    leftover = final.agg(F.sum(
        pii_count("content", "url") + pii_count("content", "email")
        + pii_count("content", "ip")
    )).first()[0]
    assert (leftover or 0) == 0

    # strip: the planted banner is hot (≥8 docs) and gone everywhere
    assert summary["strip"]["lines_removed_total"] >= 8
    assert final.where(F.col("content").contains(BANNER)).count() == 0

    # curated: both junk docs dropped, with audited reasons
    assert summary["verdicts"]["n_dropped"] >= 2
    verdicts = pipe.read("verdicts")
    reasons = {
        r["doc_id"]: r["reasons"]
        for r in verdicts.where(~F.col("keep")).collect()
    }
    assert "too_few_tokens" in reasons[100001]
    assert "repetitive_tokens" in reasons[100002]
    survivors = {r.doc_id for r in final.select("doc_id").collect()}
    assert 100001 not in survivors and 100002 not in survivors

    # dedup: only the min-id member of the exact-dup pair survives
    assert summary["dedup"]["rows_dropped"] >= 1
    assert 100010 in survivors
    assert 100011 not in survivors

    # split: leakage-safe — every near-dup cluster on one side only
    assert summary["split"]["n_train"] + summary["split"]["n_test"] == \
        summary["split"]["rows"]
    sides = (
        pipe.read("split").groupBy("group_rep")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k")).first()[0]
    )
    assert sides == 1

    # final: planted leak produced drops, and the OUTPUT is clean — no
    # surviving test row shares a 13-gram with any surviving train row
    assert summary["final"]["test_rows_decontaminated"] >= 1
    assert summary["final"]["rows"] == \
        summary["split"]["rows"] - summary["final"]["test_rows_decontaminated"]
    residue = ngram_contamination(
        final.where("split = 'train'"), final.where("split = 'test'"),
        text_col="content",
    )
    assert residue.count() == 0

    # lineage: content_sha256 still points at the SOURCE row for every
    # survivor (join back to the input corpus and compare)
    src = corpus.select("doc_id", F.col("content_sha256").alias("src_sha"))
    mismatched = (
        final.join(src, "doc_id")
        .where(F.col("content_sha256") != F.col("src_sha"))
        .count()
    )
    assert mismatched == 0


def test_lm_filter_stage(spark, tmp_path):
    """Optional CCNet perplexity stage: slots between dedup and split,
    drops the per-lang tail tercile, keeps the corpus schema for the
    downstream stages, and resumes like every other stage."""
    corpus = _corpus(spark)
    cfg = CurationConfig(
        boiler_min_docs=8, min_alpha_milli=400, lm_filter=True
    )
    pipe = CurationPipeline(spark, str(tmp_path / "lm"), cfg)
    assert "lmfilter" in pipe.STAGES
    assert pipe.STAGES.index("lmfilter") == pipe.STAGES.index("split") - 1

    summary = pipe.run(corpus)
    assert all(m["complete"] for m in summary.values())
    lmm = summary["lmfilter"]
    # terciles: the tail third of each multi-doc lang group drops
    assert 0 < lmm["rows_dropped"] < summary["dedup"]["rows"]
    assert lmm["rows"] == summary["dedup"]["rows"] - lmm["rows_dropped"]
    assert lmm["n_head"] >= 1 and lmm["bits_milli_max"] >= 0

    # the stage output carries its lineage columns; the split output is
    # back to the corpus schema
    assert {"bits_milli", "lm_bucket"} <= set(pipe.read("lmfilter").columns)
    assert "bits_milli" not in pipe.read("split").columns
    # split consumed the FILTERED corpus
    assert summary["split"]["rows"] == lmm["rows"]
    # no tail survivor anywhere downstream
    kept_buckets = {
        r["lm_bucket"]
        for r in pipe.read("lmfilter").select("lm_bucket").distinct().collect()
    }
    assert kept_buckets <= {"head", "middle"}

    # resume: a second run() must skip every completed stage (manifest
    # mtimes unchanged ⇒ same rows)
    again = pipe.run(corpus)
    assert again["lmfilter"]["rows"] == lmm["rows"]


def test_curation_crash_resumes_hash_equal(spark, tmp_path, monkeypatch):
    """Kill the run at the START of the final stage (after 7 checkpoints),
    re-launch with the same run_dir: all earlier stages manifest-skipped
    (written_at unchanged), final output hash-equal to a clean run."""
    import polyfuzz_spark.plans.curation as C

    corpus = _corpus(spark)

    clean = CurationPipeline(spark, str(tmp_path / "clean"), CFG)
    clean.run(corpus)
    want = _final_hash(clean)

    real = C.contaminated_ids

    def bomb(*a, **kw):
        raise RuntimeError("simulated executor loss before decontam")

    monkeypatch.setattr(C, "contaminated_ids", bomb)
    run_dir = str(tmp_path / "crash")
    with pytest.raises(RuntimeError, match="simulated"):
        CurationPipeline(spark, run_dir, CFG).run(corpus)
    monkeypatch.setattr(C, "contaminated_ids", real)

    crashed = CurationPipeline(spark, run_dir, CFG)
    done = ["ingest", "scrub", "strip", "verdicts", "curated", "dedup",
            "split"]
    for s in done:
        assert crashed.is_complete(s), s
    assert not crashed.is_complete("final")
    stamps = {
        s: json.loads(crashed._manifest(s).read_text())["written_at"]
        for s in done
    }

    # resume without the corpus: completed checkpoints must carry it
    summary = CurationPipeline(spark, run_dir, CFG).run(corpus=None)
    assert all(m["complete"] for m in summary.values())
    for s, t in stamps.items():
        assert summary[s]["written_at"] == t, f"stage {s} was re-run"
    assert _final_hash(crashed) == want


def test_code_rules_dimension(spark, tmp_path):
    """code_rules=True adds the The-Stack/StarCoder file filters to the
    verdicts stage: autogenerated and minified files drop with audited
    reasons (text rules first, then code rules), the license guess is
    carried for audit, and the manifest counts the code-rule drops."""
    base = _corpus(spark)
    extra = spark.createDataFrame(
        [
            (100020, "gen", "gen.py", "c0", "python",
             "// Auto-Generated by protoc. DO NOT EDIT.\n" + DUP_TEXT),
            (100021, "min", "min.js", "c0", "js", "var a=1;" + "x" * 1500),
        ],
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string",
    ).withColumn("entity_id", F.lit(-1).cast("long")).withColumn(
        "content_sha256", F.sha2("content", 256)
    )
    corpus = base.unionByName(extra.select(base.columns))

    cfg = CurationConfig(
        boiler_min_docs=8, min_alpha_milli=400, code_rules=True
    )
    pipe = CurationPipeline(spark, str(tmp_path / "code"), cfg)
    summary = pipe.run(corpus)
    assert all(m["complete"] for m in summary.values())

    verdicts = pipe.read("verdicts")
    assert "license" in verdicts.columns
    rows = {r.doc_id: r for r in verdicts.where(~F.col("keep")).collect()}
    assert "autogenerated" in rows[100020].reasons
    assert "long_lines" in rows[100021].reasons
    # fixed audit order: any fired text rule precedes any fired code rule
    r21 = rows[100021].reasons.split(",")
    assert r21.index("too_few_tokens") < r21.index("long_lines")
    assert summary["verdicts"]["n_dropped_code_rules"] >= 2

    survivors = {r.doc_id for r in pipe.read("final").select("doc_id").collect()}
    assert 100020 not in survivors and 100021 not in survivors


def test_capped_pair_count_exact(spark):
    from polyfuzz_spark.operators.adaptive import capped_pair_count

    bands = spark.createDataFrame(
        [(0, "hot", i) for i in range(10)] + [(1, "cold", 0), (1, "cold", 1)],
        "band int, band_key string, doc_id long",
    )
    assert capped_pair_count(bands, None) == 45 + 1
    assert capped_pair_count(bands, 4) == 6 + 1
    assert capped_pair_count(bands.where("band = 99"), 4) == 0


def test_enforce_pair_budget_demotes_and_records(spark):
    from polyfuzz_spark.operators import adaptive

    bands = spark.createDataFrame(
        [(0, "hot", i) for i in range(30)],
        "band int, band_key string, doc_id long",
    )
    knobs = dict(adaptive.PERMISSIVE_KNOBS)
    stats: dict = {}
    # still over budget AT the SCALE cap (30-doc bucket, budget 10) →
    # the second demotion step reaches the XSCALE tier (10M-leg lesson)
    out = adaptive.enforce_pair_budget(bands, knobs, budget=10, stats=stats)
    assert out["max_bucket_size"] == adaptive.XSCALE_KNOBS["max_bucket_size"]
    assert out["min_shared_bands"] == \
        adaptive.XSCALE_KNOBS["min_shared_bands"]
    assert stats["demoted"] and stats["capped_pairs_at_resolved"] == 435
    assert "capped_pairs_at_demoted" in stats
    # under budget → untouched
    stats2: dict = {}
    out2 = adaptive.enforce_pair_budget(
        bands, knobs, budget=1000, stats=stats2
    )
    assert out2 == knobs and not stats2["demoted"]


def test_enforce_pair_budget_stops_at_scale_when_sufficient(spark):
    """The demotion is graduated: a 250-doc hot bucket emits 31,125 pairs
    permissive-capped, 19,900 under the SCALE cap, 4,950 under XSCALE —
    a budget of 20k must stop at SCALE, a budget of 10k must continue to
    XSCALE."""
    from polyfuzz_spark.operators import adaptive

    bands = spark.createDataFrame(
        [(0, "hot", i) for i in range(250)],
        "band int, band_key string, doc_id long",
    )
    knobs = dict(adaptive.PERMISSIVE_KNOBS)
    out = adaptive.enforce_pair_budget(bands, knobs, budget=20_000)
    assert out["max_bucket_size"] == adaptive.SCALE_KNOBS["max_bucket_size"]
    assert out["min_shared_bands"] == 2
    out2 = adaptive.enforce_pair_budget(bands, knobs, budget=10_000)
    assert out2["max_bucket_size"] == \
        adaptive.XSCALE_KNOBS["max_bucket_size"]
    assert out2["min_shared_bands"] == \
        adaptive.XSCALE_KNOBS["min_shared_bands"]


def test_pipeline_pair_budget_gate(spark, tmp_path, monkeypatch):
    """A band-concentrated corpus must demote the auto-resolved knobs (the
    124k-doc post-mortem: 421M pairs / 79 GB spill under the permissive
    cap); explicit config knobs skip the gate entirely."""
    from polyfuzz_spark.operators import adaptive

    corpus = _corpus(spark)
    monkeypatch.setattr(adaptive, "CANDIDATE_PAIR_BUDGET", 0)
    pipe = CurationPipeline(spark, str(tmp_path / "gate"), CFG)
    summary = pipe.run(corpus)
    m = json.loads(pipe._manifest("split").read_text())
    assert m["pair_budget_gate"]["demoted"] is True
    # budget 0 is unreachable even at the SCALE cap → the graduated gate
    # lands on the XSCALE tier
    assert m["blocking_knobs"]["max_bucket_size"] == \
        adaptive.XSCALE_KNOBS["max_bucket_size"]
    assert m["blocking_knobs"]["min_shared_bands"] == \
        adaptive.XSCALE_KNOBS["min_shared_bands"]
    assert all(s["complete"] for s in summary.values())

    # explicit knobs are a contract: gate skipped, stats empty
    cfg = CurationConfig(boiler_min_docs=8, min_alpha_milli=400,
                         max_bucket_size=777, min_shared_bands=1)
    pipe2 = CurationPipeline(spark, str(tmp_path / "explicit"), cfg)
    pipe2.run(corpus)
    m2 = json.loads(pipe2._manifest("split").read_text())
    assert m2["pair_budget_gate"] == {}
    assert m2["blocking_knobs"]["max_bucket_size"] == 777


def test_split_blocking_knobs_size_resolved(spark, tmp_path, monkeypatch):
    """The split stage's banded join sizes its knobs to the DEDUPED corpus:
    permissive below the threshold, the measured-safe ER regime above it
    (the fixed permissive defaults made the banded join's one shuffle
    exceed the box at 1M docs). Explicit config knobs still win."""
    from polyfuzz_spark.operators import adaptive

    corpus = _corpus(spark)

    # tiny corpus, default threshold → pinned banding + permissive
    # safety knobs recorded
    pipe = CurationPipeline(spark, str(tmp_path / "perm"), CFG)
    pipe.run(corpus)
    knobs = json.loads(pipe._manifest("split").read_text())["blocking_knobs"]
    assert knobs == {
        "num_hashes": 64, "bands": 16,
        "max_bucket_size": adaptive.PERMISSIVE_KNOBS["max_bucket_size"],
        "min_shared_bands": adaptive.PERMISSIVE_KNOBS["min_shared_bands"],
    }

    # explicit knob overrides the regime
    cfg = CurationConfig(boiler_min_docs=8, min_alpha_milli=400,
                         max_bucket_size=777)
    pipe3 = CurationPipeline(spark, str(tmp_path / "explicit"), cfg)
    pipe3.run(corpus)
    knobs3 = json.loads(pipe3._manifest("split").read_text())["blocking_knobs"]
    assert knobs3["max_bucket_size"] == 777
    assert knobs3["bands"] == 16  # config's pinned banding untouched

    # threshold forced to 0 → the SCALE regime fires on the same corpus,
    # and the pipeline still completes leakage-safe
    monkeypatch.setattr(adaptive, "BLOCKED_KNOBS_MIN_DOCS", 0)
    pipe2 = CurationPipeline(spark, str(tmp_path / "scale"), CFG)
    summary = pipe2.run(corpus)
    knobs2 = json.loads(pipe2._manifest("split").read_text())["blocking_knobs"]
    assert knobs2 == adaptive.SCALE_KNOBS
    assert all(m["complete"] for m in summary.values())
    sides = (
        pipe2.read("split").groupBy("group_rep")
        .agg(F.countDistinct("split").alias("k"))
        .agg(F.max("k")).first()[0]
    )
    assert sides == 1
