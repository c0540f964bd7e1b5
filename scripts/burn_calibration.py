#!/usr/bin/env python
"""Pure-JVM thread-scaling calibration burn (BASELINE.md's ceiling probe).

The sandbox is one box: `local[8]` vs `local[32]` legs of the ER pipeline
share a single memory bus, JVM heap and page cache, so their raw speedup is
bounded by the MACHINE's own thread-scaling, not the plan's. This burn
measures that ceiling — whole-stage-codegen sha2 over 400M `spark.range`
rows in 256 partitions (no Python, no shuffle, no input I/O) — cold JVM,
one warmup pass excluded, /proc/stat busy/steal deltas recorded exactly
like bench.py's accounting. Run it at both parallelism levels adjacent to
(same host window as) the pipeline legs; the pipeline's ceiling-relative
efficiency is `pipeline_speedup / burn_speedup` (BASELINE.md
"Single-node calibration").

Usage:
    python scripts/burn_calibration.py 8  /tmp/burn8.json
    python scripts/burn_calibration.py 32 /tmp/burn32.json
"""

from __future__ import annotations

import json
import os
import sys
import time


def host_cpu() -> tuple[float, float]:
    """(busy_cpu_seconds, steal_seconds) machine-wide, as in bench.py."""
    with open("/proc/stat") as fh:
        p = fh.readline().split()
    hz = os.sysconf("SC_CLK_TCK")
    busy = (int(p[1]) + int(p[2]) + int(p[3]) + int(p[6]) + int(p[7])) / hz
    steal = (int(p[8]) if len(p) > 8 else 0) / hz
    return busy, steal


def main() -> None:
    cpus = int(sys.argv[1])
    out = sys.argv[2] if len(sys.argv) > 2 else "/dev/stdout"
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.local.dir", "/dev/shm/spark-burn")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def burn(n_rows: int) -> None:
        spark.range(0, n_rows, numPartitions=256).select(
            F.max(F.sha2(F.col("id").cast("string"), 256))
        ).collect()

    burn(10_000_000)  # warmup: JIT the codegen path, excluded from timing
    b0, s0 = host_cpu()
    t0 = time.monotonic()
    burn(400_000_000)
    wall = time.monotonic() - t0
    b1, s1 = host_cpu()
    n_host = os.cpu_count() or 32
    with open(out, "w") as fh:
        json.dump(
            {
                "burn_sec": round(wall, 1),
                "cpus": cpus,
                "host_cpu_sec": round(b1 - b0, 1),
                "host_steal_frac": round((s1 - s0) / (wall * n_host), 4),
            },
            fh,
        )
    spark.stop()


if __name__ == "__main__":
    main()
