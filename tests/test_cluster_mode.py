"""Standing multi-JVM gate: representative registry entries under
``local-cluster`` (VERDICT r5 item 1).

Everything else in the suite runs ``local[4]`` — one JVM, where closures
never cross a process boundary, broadcasts are never shipped, and Python
workers attach to the driver's JVM. This test boots a REAL two-worker
cluster (separate executor JVMs forking their own Python workers) and
runs one entry per execution-model family against the DuckDB oracle:

- plain agg/join SQL (pricing_summary),
- iterative graph loop with broadcast state + localCheckpoint
  (copurchase_pagerank),
- Arrow ``mapInPandas`` ANN pipeline (lsh_topk),
- Structured Streaming with watermark state (stream_sessions),
- MinHash banded self-join (minhash_lsh_near_dup).

It shells out to ``scripts/cluster_correctness.py`` because a second
SparkContext with a different master cannot coexist with the session
fixture's in one Python process (getOrCreate would silently hand back the
local[4] session and the test would prove nothing). The FULL 175-entry
multi-JVM sweep is the same script with no filter (per-round artifact
CORRECTNESS_CLUSTER_r{N}.json); this subset keeps the axis covered on
every pytest run at ~2 min instead of ~25.
"""

from __future__ import annotations

import os
import subprocess
import sys

from conftest import SF_SMOKE

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENTRIES = [
    "pricing_summary",
    "copurchase_pagerank",
    "lsh_topk",
    "stream_sessions",
    "minhash_lsh_near_dup",
]


def test_representative_entries_match_oracle_under_multi_jvm():
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "cluster_correctness.py"),
            "0",
            SF_SMOKE,
            ",".join(ENTRIES),
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-12:])
    assert proc.returncode == 0, f"multi-JVM sweep failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert f"{len(ENTRIES)}/{len(ENTRIES)} green" in proc.stdout, tail
