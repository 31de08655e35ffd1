"""Executor-loss fault experiment: the reliability half of MP_PIN_MODE.

`_pin`'s docstring claims: localCheckpoint blocks die with their executor
(lineage truncated — nothing to recompute from), while
`MP_PIN_MODE=persist` keeps lineage, so a lost DISK_ONLY block recomputes
and the job survives. This script tests that claim for real: it runs
PageRank on a `local-cluster[2,4,2048]` (two executor JVMs), SIGKILLs one
executor mid-iteration, and reports whether the job completed and whether
the scores match an undisturbed run.

Usage: MP_PIN_MODE=persist python scripts/fault_experiment.py
       MP_PIN_MODE=local   python scripts/fault_experiment.py

Prints one JSON line: {"mode", "killed_pid", "completed", "correct", ...}.
Expected: persist -> completed true + correct true (possibly after task
retries); local -> either completed false (checkpoint block lost) OR
completed true if the kill landed before/after the window where the
pinned blocks were resident only on the dead executor. The experiment
records what actually happened — the interesting bit is that persist must
NEVER fail.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def executor_pids() -> list[int]:
    """Pids of CoarseGrainedExecutorBackend JVMs (the executor processes)."""
    out = subprocess.run(
        ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
        capture_output=True, text=True,
    ).stdout.split()
    return [int(p) for p in out]


def main() -> None:
    mode = os.environ.get("MP_PIN_MODE", "local")
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)

    from pyspark.sql import functions as F

    from marketpipe_spark.operators import graph
    from marketpipe_spark.session import get_spark

    spark = get_spark(
        f"fault-{mode}",
        master="local-cluster[2,4,2048]",
        extra_conf={
            "spark.executorEnv.PYTHONPATH": REPO,
            "spark.executor.memory": "1536m",
            # generous task retries: surviving a lost executor is the point
            "spark.task.maxFailures": "8",
            "spark.stage.maxConsecutiveAttempts": "8",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = 200_000
    base = spark.range(n)
    edges = base.select(
        F.col("id").alias("src"), ((F.col("id") * 48271 + 1) % n).alias("dst")
    ).unionByName(
        base.select(F.col("id").alias("src"), ((F.col("id") + 13) % n).alias("dst"))
    )

    # undisturbed reference (also warms the cluster so executor pids exist)
    ref = {r.id: r.score for r in graph.pagerank(edges, iterations=3).collect()}

    state: dict = {"killed_pid": None, "kill_error": None}

    delay = float(os.environ.get("MP_FAULT_DELAY", "2.0"))

    def killer():
        time.sleep(delay)  # land mid-iteration of the 3-round loop
        pids = executor_pids()
        if not pids:
            state["kill_error"] = "no executor pids found"
            return
        victim = pids[0]
        state["killed_pid"] = victim
        os.kill(victim, signal.SIGKILL)

    th = threading.Thread(target=killer)
    completed = correct = False
    err = None
    th.start()
    try:
        got = {r.id: r.score for r in graph.pagerank(edges, iterations=3).collect()}
        completed = True
        correct = got == ref
    except Exception as e:  # noqa: BLE001 — the failure IS the measurement
        err = f"{type(e).__name__}: {str(e)[:300]}"
    th.join()

    print(json.dumps({
        "mode": mode, "delay": float(os.environ.get("MP_FAULT_DELAY", "2.0")),
        "killed_pid": state["killed_pid"],
        "kill_error": state["kill_error"],
        "completed": completed,
        "correct": correct,
        "error": err,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
