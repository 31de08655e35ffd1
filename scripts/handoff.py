"""End-of-round handoff discipline, automated (one JVM at a time).

Runs, in order, writing artifacts at the repo root:

1. full pytest (fails fast — nothing else is meaningful on a red suite)
2. full local[32] correctness sweep  -> CORRECTNESS_LOCAL_r{N}.json
3. full multi-JVM local-cluster sweep -> CORRECTNESS_CLUSTER_r{N}.json
4. same sweep under MP_PIN_MODE=persist -> CORRECTNESS_CLUSTER_PERSIST_r{N}.json
5. headline bench                     (printed; driver writes BENCH_r{N})
6. concurrent bench                   -> CONCURRENT_BENCH_r{N}.json

Heavy scale cells are NOT here: measure them standalone, one per process
(`scale_bench.py --reuse --record-rows`), on a rested machine — see
SCALING.md's measurement-position note. Benches run LAST and are still
post-suite numbers; for a clean headline, re-run `python bench.py` on an
idle machine.

Usage: python scripts/handoff.py <round> [--skip-pytest]
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(desc: str, cmd: list[str], timeout: int, env: dict | None = None) -> int:
    print(f"\n=== {desc}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    try:
        rc = subprocess.call(
            cmd, cwd=REPO, timeout=timeout,
            env={**os.environ, **env} if env else None,
        )
    except subprocess.TimeoutExpired:
        # A hung step is a recorded failure, not an aborting traceback
        # (ADVICE r6): report it and let the caller decide what's next.
        print(f"=== {desc}: TIMED OUT after {timeout}s", flush=True)
        return 124
    print(f"=== {desc}: rc={rc} in {time.time() - t0:.0f}s", flush=True)
    return rc


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    py = sys.executable
    if "--skip-pytest" not in sys.argv:
        if run("pytest", [py, "-m", "pytest", "tests/", "-q"], 3600):
            return 1
    if run("local sweep", [py, "scripts/local_correctness.py", rnd], 3600):
        return 2
    if run("cluster sweep", [py, "scripts/cluster_correctness.py", rnd], 5400):
        return 3
    # VERDICT r6 #5: the standing gates run the default pin mode only — sweep
    # the full registry under multi-JVM × persist once per round.
    if run(
        "cluster sweep (persist)",
        [py, "scripts/cluster_correctness.py", rnd],
        5400,
        env={"MP_PIN_MODE": "persist"},
    ):
        return 4
    # Capture the FULL bench dict ourselves: the driver's BENCH_r{N}.json
    # truncates the tail (headline lost every round since r1, VERDICT r9
    # nit 5) — BENCH_FULL_r{N}.json is the complete parsed artifact.
    print("\n=== bench: python bench.py", flush=True)
    t0 = time.time()
    try:
        proc = subprocess.run(
            [py, "bench.py"], cwd=REPO, timeout=1200, capture_output=True, text=True
        )
        print(proc.stdout[-4000:], flush=True)
        line = next(
            (ln for ln in reversed(proc.stdout.splitlines()) if ln.startswith("{")),
            None,
        )
        if line is not None:
            import json as _json

            try:
                parsed = _json.loads(line)
                # Since r11 the stdout line is headline-only (it must fit the
                # driver's 2000-char tail capture); the per-extra timings live
                # in the sidecar bench.py writes — merge it so BENCH_FULL stays
                # the complete artifact.
                sidecar = parsed.get("detail")
                if sidecar:
                    try:
                        with open(os.path.join(REPO, sidecar)) as f:
                            parsed = _json.load(f)
                    except (OSError, ValueError):
                        pass  # stdout line alone is still a valid artifact
                with open(os.path.join(REPO, f"BENCH_FULL_r{rnd}.json"), "w") as f:
                    _json.dump(parsed, f, indent=2)
                print(f"-> BENCH_FULL_r{rnd}.json", flush=True)
            except ValueError:
                # an unparsable '{'-prefixed log line must not abort the
                # remaining handoff steps
                print("bench output not parsable as JSON; artifact skipped", flush=True)
        print(f"=== bench: rc={proc.returncode} in {time.time() - t0:.0f}s", flush=True)
    except subprocess.TimeoutExpired:
        print("=== bench: TIMED OUT after 1200s", flush=True)
    run(
        "concurrent bench",
        [py, "scripts/concurrent_bench.py", "--round", rnd, "--threads", "16"],
        3600,
    )
    print("\nhandoff complete", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
