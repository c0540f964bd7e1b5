#!/usr/bin/env python
"""bench.py — headline benchmark for the polyfuzz_spark engine.

Runs the flagship blocked ER pipeline (MinHash blocking → exact cosine
scoring → top-n → transitive clustering) plus every driver-contract query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32), and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys (cpus, pairs_scored, pairs_per_sec) back the BASELINE.json
throughput metric; run with SPARK_GRAFT_CPUS=8 then 32 for the two-
parallelism scaling-efficiency evidence recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _host_cpu() -> tuple[float, float]:
    """(busy_cpu_seconds, steal_jiffies) machine-wide from /proc/stat.
    BASELINE.md documents 3-8x per-query wall-clock swings on this shared
    host at near-zero steal; a busy-CPU delta over the run is the
    load-insensitive companion number that makes one-shot BENCH totals
    interpretable. Returns (0, 0) where /proc/stat is unavailable."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        user, nice, system = int(parts[1]), int(parts[2]), int(parts[3])
        irq, softirq = int(parts[6]), int(parts[7])
        steal = int(parts[8]) if len(parts) > 8 else 0
        hz = os.sysconf("SC_CLK_TCK")
        return (user + nice + system + irq + softirq) / hz, steal / hz
    except (OSError, IndexError, ValueError):
        return 0.0, 0.0


def _tree_cpu() -> float:
    """CPU seconds consumed by THIS process tree (bench driver + JVM +
    Python workers), summed from /proc/<pid>/stat over all descendants
    plus already-reaped children (getrusage). Unlike the machine-wide
    /proc/stat delta this is insensitive to other tenants on the box —
    the honest scaling-efficiency denominator when the host is busy
    (cache-contention inflation remains, but not foreign work)."""
    import resource

    hz = os.sysconf("SC_CLK_TCK")
    total = 0.0
    me = os.getpid()
    pending = [me]
    children: dict[int, list[int]] = {}
    try:
        for pid in os.listdir("/proc"):
            if not pid.isdigit():
                continue
            try:
                with open(f"/proc/{pid}/stat") as fh:
                    parts = fh.read().rsplit(")", 1)[1].split()
                ppid = int(parts[1])
                children.setdefault(ppid, []).append(int(pid))
            except (OSError, IndexError, ValueError):
                continue
        while pending:
            pid = pending.pop()
            try:
                with open(f"/proc/{pid}/stat") as fh:
                    parts = fh.read().rsplit(")", 1)[1].split()
                total += (int(parts[11]) + int(parts[12])) / hz  # utime+stime
            except (OSError, IndexError, ValueError):
                pass
            pending.extend(children.get(pid, []))
    except OSError:
        pass
    ru_s = resource.getrusage(resource.RUSAGE_SELF)
    ru_c = resource.getrusage(resource.RUSAGE_CHILDREN)
    # RUSAGE covers the driver's own and reaped-children time exactly;
    # the /proc walk already covered self+live children, so take the max
    # of the two accountings rather than double-count
    return max(total, ru_s.ru_utime + ru_s.ru_stime + ru_c.ru_utime
               + ru_c.ru_stime)


def _force(df) -> int:
    """Fully execute a plan (noop sink — no driver collect, no skipped stages)
    and return the row count via a cheap second action on the cached result."""
    df = df.cache()
    df.write.format("noop").mode("overwrite").save()
    n = df.count()
    df.unpersist()
    return n


def run_er_pipeline(spark, sf: float) -> dict:
    """Flagship scale path on the BASELINE.json workload — the deterministic
    synthetic source-code corpus (input_hint schema, planted near-duplicate
    clusters): MinHash-LSH blocking → exact TF-IDF cosine on candidates →
    top-n → transitive clustering → pairwise F1 vs ground-truth entities.
    Returns timings + candidate-pair throughput + F1 (the BASELINE metric).
    """
    from pyspark.sql import functions as F

    from polyfuzz_spark.metrics import pairwise_f1
    from polyfuzz_spark.operators.cosine_join import score_candidates_packed
    from polyfuzz_spark.operators.linkage import connected_components
    from polyfuzz_spark.operators.mapside import (
        both_orientations,
        candidates_from_bands,
        fit_idf_mapside,
        minhash_bands_mapside,
        vectorize_packed_mapside,
    )
    from polyfuzz_spark.operators.topk import top_n_matches
    from polyfuzz_spark.sources.corpus import generate_corpus

    # sf0.1 → 2000 entities ≈ 5000 docs (avg 2.5 variants each);
    # SPARK_GRAFT_ER_ENTITIES overrides for the scaling-efficiency runs
    # (local[8] vs local[32] need a compute-dominated corpus size)
    n_entities = int(
        os.environ.get("SPARK_GRAFT_ER_ENTITIES", 0)
    ) or max(200, int(20_000 * sf))
    corpus = generate_corpus(spark, n_entities).cache()
    n_docs = corpus.count()
    docs = corpus.select("doc_id", F.col("content").alias("key"))

    t0 = time.monotonic()
    bands = minhash_bands_mapside(docs, num_hashes=64, bands=16)
    # emit_both=False: cosine is symmetric, so each unordered pair is
    # scored ONCE (half the fat packed join + half the kernel work);
    # orientations are restored on the scored rows before the per-from
    # top-n. n_cands therefore counts KERNEL EVALUATIONS (unordered
    # pairs) — rounds before r2's band-halving counted both orientations,
    # i.e. the same workload reported 2x this number.
    cands = candidates_from_bands(bands, None, max_bucket_size=200,
                                  min_shared_bands=2, emit_both=False)
    cands = cands.cache()
    n_cands = cands.count()
    t_block = time.monotonic() - t0

    t0 = time.monotonic()
    model = fit_idf_mapside(docs, "key")
    packed = vectorize_packed_mapside(model, docs, "key", compact=True).cache()
    packed.count()
    half = score_candidates_packed(cands, packed, packed)
    pairs = both_orientations(half, carry=("sim",))
    matches = top_n_matches(pairs, docs, top_n=5, min_similarity=0.6).cache()
    matches.write.format("noop").mode("overwrite").save()
    t_score = time.monotonic() - t0

    t0 = time.monotonic()
    edges = (
        matches.where(F.col("similarity") > 0.75)
        .select(
            F.col("from_id").cast("string").alias("src"),
            F.col("to_id").cast("string").alias("dst"),
        )
    )
    cc = connected_components(edges).select(
        F.col("key").cast("long").alias("doc_id"), "cluster_id"
    ).cache()
    n_clustered = cc.count()
    t_cluster = time.monotonic() - t0

    f1 = pairwise_f1(
        cands, corpus.select("doc_id", "entity_id"), cc
    )
    # B-cubed per-record evaluation alongside pairwise F1 (exact integer
    # micro; singletons = own cluster). Near-free: three aggs over the
    # assignments-sized tables.
    from polyfuzz_spark.metrics import bcubed

    asg = (
        corpus.select("doc_id")
        .join(cc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster"),
        )
    )
    b3 = bcubed(
        asg, corpus.select("doc_id", F.col("entity_id").alias("label"))
    ).collect()[0]

    for df in (cands, packed, matches, corpus, cc):
        df.unpersist()
    total = t_block + t_score + t_cluster
    return {
        "er_block_sec": round(t_block, 3),
        "er_score_sec": round(t_score, 3),
        "er_cluster_sec": round(t_cluster, 3),
        "er_total_sec": round(total, 3),
        "n_docs": n_docs,
        "pairs_scored": n_cands,
        "pairs_unit": "unordered",  # pre-r2-halving rounds reported 2x
        "pairs_per_sec": round(n_cands / (t_block + t_score), 1),
        # r1 counted both orientations of every pair; same-workload
        # comparisons across rounds should use this ordered-equivalent rate
        "ordered_equiv_pairs_per_sec": round(
            2 * n_cands / (t_block + t_score), 1
        ),
        "n_clustered": n_clustered,
        "pairwise_f1": round(f1["f1"], 4),
        "pairwise_precision": round(f1["precision"], 4),
        "pairwise_recall": round(f1["recall"], 4),
        "bcubed_f1": round(b3.bcubed_f1_micro / 1e6, 4),
        "bcubed_precision": round(b3.bcubed_precision_micro / 1e6, 4),
        "bcubed_recall": round(b3.bcubed_recall_micro / 1e6, 4),
    }


def run_curation_pipeline(spark, sf: float) -> dict:
    """The second flagship: the checkpointed training-data curation job
    (scrub → strip → curate → dedup → split → decontaminate) over the same
    synthetic corpus, checkpointing every stage to local disk the way a
    real run checkpoints to object storage. Timing includes the 8 stage
    writes+reads — the honest end-to-end cost of the resumable job."""
    import shutil
    import tempfile

    from polyfuzz_spark.plans.curation import CurationConfig, CurationPipeline
    from polyfuzz_spark.sources.corpus import generate_corpus

    n_entities = int(
        os.environ.get("SPARK_GRAFT_CUR_ENTITIES", 0)
    ) or max(200, int(20_000 * sf))
    corpus = generate_corpus(spark, n_entities)
    run_dir = tempfile.mkdtemp(prefix="bench_curation_")
    cfg = CurationConfig(min_alpha_milli=400, boiler_min_docs=100)
    t0 = time.monotonic()
    try:
        summary = CurationPipeline(spark, run_dir, cfg).run(corpus)
        dt = time.monotonic() - t0
        n_in = summary["ingest"]["rows"]
        return {
            "curation_total_sec": round(dt, 3),
            "n_docs_in": n_in,
            "n_docs_final": summary["final"]["rows"],
            "docs_per_sec": round(n_in / dt, 1),
        }
    finally:
        shutil.rmtree(run_dir, ignore_errors=True)


def _run_json_subprocess(cmd: list[str], env_extra: dict | None = None) -> dict:
    """Run a child that prints one JSON object (last stdout line) and
    parse it. Child stderr passes through (Spark progress noise)."""
    import subprocess

    env = dict(os.environ)
    env.update(env_extra or {})
    res = subprocess.run(
        cmd, env=env, stdout=subprocess.PIPE, text=True, check=True
    )
    lines = [ln for ln in res.stdout.splitlines() if ln.strip()]
    return json.loads(lines[-1])


def run_scaling(levels: list[int], entities: int,
                steal_ceiling: float) -> None:
    """The two-cluster-size evidence protocol, folded in from operator
    lore (BASELINE.md "Round-4 two-parallelism evidence") so numbers stay
    comparable across rounds without re-deriving the method:

    - each parallelism level P runs PINNED (``taskset -c 0-(P-1)``) so
      foreign tenant load can't donate cores to a low-P leg (which
      deflates speedups) and the JVM can't borrow idle ones;
    - every ER leg gets an ADJACENT pure-JVM burn
      (scripts/burn_calibration.py) — the machine's own thread-scaling
      ceiling in that host window; quote ceiling-relative efficiency
      (pipeline speedup / burn speedup), never raw;
    - legs whose machine-wide steal exceeds ``steal_ceiling`` are re-run
      once and flagged ``contended`` if still over — a single
      high-steal wall number is a host-load sample, not a measurement;
    - ``tree_cpu_sec`` (own process tree) is carried per leg as the
      foreign-tenant-insensitive denominator.

    The honest N→4N signal on ONE box is the LOW pair (e.g. 2→8): above
    ~8 concurrent Python kernels the shared L3/memory bus — a resource a
    real 4N-node cluster multiplies but one box cannot — dominates, and
    8→32 inverts (BASELINE.md, round 4). Emits one JSON line.
    """
    here = os.path.join(REPO, "bench.py")
    burn_script = os.path.join(REPO, "scripts", "burn_calibration.py")
    legs = {}
    for p in levels:
        pin = ["taskset", "-c", f"0-{p - 1}"]
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".json") as tf:
            import subprocess

            subprocess.run(
                pin + [sys.executable, burn_script, str(p), tf.name],
                check=True,
            )
            burn = json.load(open(tf.name))
        env = {
            "SPARK_GRAFT_BENCH_ONLY": "er",
            "SPARK_GRAFT_CPUS": str(p),
            "SPARK_GRAFT_ER_ENTITIES": str(entities),
        }
        leg = _run_json_subprocess(pin + [sys.executable, here], env)
        if leg.get("host_steal_frac", 0) > steal_ceiling:
            rerun = _run_json_subprocess(pin + [sys.executable, here], env)
            if rerun.get("host_steal_frac", 0) <= leg["host_steal_frac"]:
                leg = rerun
        legs[p] = {
            "er_total_sec": leg["er"]["er_total_sec"],
            "er_block_sec": leg["er"]["er_block_sec"],
            "er_score_sec": leg["er"]["er_score_sec"],
            "er_cluster_sec": leg["er"]["er_cluster_sec"],
            "pairs_scored": leg["pairs_scored"],
            "pairs_per_sec": leg["pairs_per_sec"],
            "pairwise_f1": leg["pairwise_f1"],
            "tree_cpu_sec": leg["tree_cpu_sec"],
            "host_steal_frac": leg.get("host_steal_frac"),
            "burn_sec": burn["burn_sec"],
            "burn_steal_frac": burn.get("host_steal_frac"),
            "contended": leg.get("host_steal_frac", 0) > steal_ceiling,
        }
    pairs = {}
    for lo, hi in zip(levels, levels[1:]):
        a, b = legs[lo], legs[hi]
        pipe_speedup = a["er_total_sec"] / b["er_total_sec"]
        burn_speedup = a["burn_sec"] / b["burn_sec"]
        ratio = hi / lo
        pairs[f"{lo}->{hi}"] = {
            "pipeline_speedup": round(pipe_speedup, 3),
            "burn_speedup": round(burn_speedup, 3),
            "raw_efficiency": round(pipe_speedup / ratio, 3),
            "ceiling_relative_efficiency": round(
                pipe_speedup / burn_speedup, 3
            ),
            "block_stage_speedup": round(
                a["er_block_sec"] / b["er_block_sec"], 3
            ),
        }
    # parallelism invariance: identical workload + identical result
    # quality at every level, or the speedups compare different jobs
    assert len({l["pairs_scored"] for l in legs.values()}) == 1, (
        "pairs_scored differs across parallelism levels"
    )
    assert len({l["pairwise_f1"] for l in legs.values()}) == 1, (
        "pairwise F1 differs across parallelism levels"
    )
    print(json.dumps({
        "metric": "scaling_efficiency",
        "protocol": (
            "pinned taskset legs, adjacent pure-JVM burn ceiling per "
            f"level, steal ceiling {steal_ceiling}, single-shot cold "
            "runs (re-run once if contended)"
        ),
        "entities": entities,
        "levels": {str(k): v for k, v in legs.items()},
        "pairs": pairs,
    }))


def main() -> None:
    from polyfuzz_spark.session import get_spark

    spark = get_spark("bench", cpus=CPUS,
                      shuffle_partitions=max(2 * CPUS, 16))

    cpu0, steal0 = _host_cpu()
    wall0 = time.monotonic()
    sf_val = float(SF_DIR.rstrip("/").split("sf")[-1] or 0.1)
    # min-of-2 protocol: BASELINE.md's variance envelope documents 3-8x
    # per-query wall-clock swings on this shared host at near-zero steal
    # (identical code, back-to-back runs: 376.5/226.8/145.0 s totals). A
    # one-shot number is therefore mostly a host-load sample; min-of-2
    # bounds the noise at the cost of one extra pass and is labeled in the
    # output ("protocol"). Disable with SPARK_GRAFT_BENCH_RUNS=1.
    # scaling-efficiency legs (BENCH_ONLY=er|curation) stay single-shot:
    # their protocol is externally-driven best-of-3 COLD runs per
    # parallelism level
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    default_runs = "1" if only in ("er", "curation") else "2"
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", default_runs))

    timings: dict[str, float] = {}
    er = None
    if only != "curation":
        ers = [run_er_pipeline(spark, sf_val) for _ in range(n_runs)]
        er = min(ers, key=lambda e: e["er_total_sec"])
        timings["er_pipeline"] = er["er_total_sec"]

    # SPARK_GRAFT_BENCH_ONLY=er|curation → that pipeline only (the
    # scaling-efficiency runs at local[8] vs local[32] measure one job)
    if only is None:
        from polyfuzz_spark.queries import all_queries

        for name, fn in all_queries().items():
            best = None
            for _ in range(n_runs):
                t0 = time.monotonic()
                _force(fn(spark, SF_DIR))
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            timings[name] = round(best, 3)

    cur = None
    if only != "er":
        curs = [run_curation_pipeline(spark, sf_val) for _ in range(n_runs)]
        cur = min(curs, key=lambda c: c["curation_total_sec"])
        timings["curation_pipeline"] = cur["curation_total_sec"]

    cpu1, steal1 = _host_cpu()
    wall1 = time.monotonic()
    out = {
        "metric": "headline_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "protocol": f"min_of_{n_runs}_runs_per_query",
        "queries": timings,
        "sf": sf_val,
        "cpus": CPUS,
        # machine-wide busy-CPU + steal over the whole run: the
        # load-insensitive companion to the wall-clock total on this
        # shared host (see BASELINE.md "variance envelope")
        "host_cpu_sec": round(cpu1 - cpu0, 1),
        "host_steal_frac": round(
            (steal1 - steal0)
            / max((wall1 - wall0) * (os.cpu_count() or 1), 1e-9),
            4,
        ),
        # CPU seconds of THIS process tree only (driver + JVM + Python
        # workers) — foreign-tenant-insensitive; the scaling-efficiency
        # denominator when host_cpu_sec >> our own work
        "tree_cpu_sec": round(_tree_cpu(), 1),
    }
    if er is not None:
        out.update({
            "pairs_scored": er["pairs_scored"],
            "pairs_per_sec": er["pairs_per_sec"],
            "ordered_equiv_pairs_per_sec": er["ordered_equiv_pairs_per_sec"],
            "pairwise_f1": er["pairwise_f1"],
            "er": er,
        })
    if cur is not None:
        out["curation"] = cur
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        import argparse

        ap = argparse.ArgumentParser()
        ap.add_argument("--scaling", action="store_true")
        ap.add_argument(
            "--levels", default="2,8,32",
            help="comma-separated pinned parallelism levels, ascending",
        )
        ap.add_argument(
            "--entities", type=int, default=500_000,
            help="synthetic corpus entities (500k -> ~1.25M docs, the "
            "BASELINE.md protocol size)",
        )
        ap.add_argument(
            "--steal-ceiling", type=float, default=0.01,
            help="max machine-wide steal fraction before a leg re-runs",
        )
        args = ap.parse_args()
        run_scaling(
            [int(x) for x in args.levels.split(",")],
            args.entities,
            args.steal_ceiling,
        )
    else:
        main()
