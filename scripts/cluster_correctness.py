"""Multi-JVM correctness sweep: the full registry under ``local-cluster``.

Every other artifact in this repo (tests, local sweep, bench) runs Spark in
``local[32]`` — ONE JVM, where closures are never serialized across a
process boundary, broadcasts are never shipped, and Python workers attach
to the driver's JVM. This script runs the ENTIRE registry (same compare as
``scripts/local_correctness.py`` — stricter than the driver's hash) under
``local-cluster[2,8,4096]``: a real Master/Worker pair that launches TWO
SEPARATE executor JVMs, each forking its own Python workers. That exercises

- closure/plan serialization across process boundaries,
- broadcast variable materialization on remote executors (the graph loops'
  node-state broadcast gate, every ``F.broadcast`` dim join),
- Arrow `mapInPandas` batches crossing a socket to a non-driver python,
- cross-executor shuffle (real network-ish fetch, not in-process map),

which is the execution model a 1000-executor 100 TB cluster actually uses.

Writes CORRECTNESS_CLUSTER_r{N}.json in the same record format.

Usage: python scripts/cluster_correctness.py [round] [sf_dir] [only]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from scripts.local_correctness import run_sweep  # noqa: E402
from marketpipe_spark.session import get_spark  # noqa: E402


def cluster_session(app: str = "cluster-correctness"):
    """A tuned session on a 2-worker local-cluster (separate executor JVMs).

    The executor JVMs fork their own Python workers, which do NOT inherit
    the driver's ``sys.path`` hack — the repo root must reach them via
    ``spark.executorEnv.PYTHONPATH`` (and the exact interpreter via
    PYSPARK_PYTHON) or every ``mapInPandas`` operator dies with
    ModuleNotFoundError on the first shipped closure.
    """
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    workers = os.environ.get("MP_CLUSTER_WORKERS", "2")
    cores = os.environ.get("MP_CLUSTER_CORES", "8")
    mem_mb = os.environ.get("MP_CLUSTER_MEM_MB", "4096")
    return get_spark(
        app,
        master=f"local-cluster[{workers},{cores},{mem_mb}]",
        extra_conf={
            "spark.executorEnv.PYTHONPATH": REPO,
            # Executors are real JVMs here: keep their heap inside the
            # worker grant (worker mem == executor mem in local-cluster).
            "spark.executor.memory": f"{int(mem_mb) - 512}m",
            # Fail fast if an executor JVM dies instead of hanging the sweep.
            "spark.network.timeout": "60s",
        },
    )


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "6"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    spark = cluster_session()
    n_exec = len([e for e in spark.sparkContext._jsc.sc().statusTracker()
                  .getExecutorInfos()])
    print(f"master={spark.sparkContext.master} executors(incl driver)={n_exec}",
          flush=True)
    out, n_fail = run_sweep(spark, sf_dir, only)
    spark.stop()
    # A non-default pin mode (persist / reliable) is a distinct execution
    # mode worth its own artifact: name it into the file so per-mode sweeps
    # don't clobber each other.
    mode = os.environ.get("MP_PIN_MODE", "local")
    tag = "" if mode == "local" else f"_{mode.upper()}"
    if only is None:
        path = os.path.join(REPO, f"CORRECTNESS_CLUSTER{tag}_r{rnd}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"\n{len(out) - n_fail}/{len(out)} green (multi-JVM) -> {path}")
    else:
        print(f"\n{len(out) - n_fail}/{len(out)} green (partial multi-JVM sweep)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
