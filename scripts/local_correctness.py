"""Driver-replica correctness sweep over the ENTIRE registry.

The per-round driver samples only ~50 of the registry's entries; this script
runs ALL of them — Spark vs DuckDB oracle on the same parquet at sf0.01 —
and writes a CORRECTNESS_LOCAL_r{N}.json artifact in the driver's record
format, so every entry (including ones the driver never sampled) has an
auditable correctness row each round (VERDICT r3 item 3).

The compare is STRICTER than the driver's order-insensitive value hash:
columns sorted by name, rows sorted by repr, exact value equality (NaN
normalized). Entries with no oracle SQL get the driver's weaker rows-only
check and are marked ``"mode": "rows_only"``.

Usage: python scripts/local_correctness.py [round_number] [sf_dir] [only]
``only`` is a comma-separated entry-name filter for quick iteration; when
given, the artifact is NOT written (partial sweeps must never masquerade
as the full record).
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from marketpipe_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(val):
    if isinstance(val, float) and math.isnan(val):
        return "NaN"
    return val


def _comparable(colnames, rows):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted((tuple(_normalize(r[i]) for i in order) for r in rows), key=repr)


def run_sweep(spark, sf_dir: str, only: set[str] | None = None) -> tuple[dict, int]:
    """Run the registry sweep on an existing session; return (records, n_fail).

    Shared by the local[32] sweep (this script's CLI) and the multi-JVM
    ``scripts/cluster_correctness.py`` sweep so the compare semantics are
    byte-identical between execution modes.
    """
    oracles = entry_mod.oracle_sql()
    queries = entry_mod.queries()
    if only is not None:
        unknown = only - set(queries)
        if unknown:
            raise SystemExit(f"unknown entries in filter: {sorted(unknown)}")
    con = _duck(sf_dir)  # one connection for the whole sweep
    out: dict[str, dict] = {}
    n_fail = 0
    for name in sorted(queries):
        if only is not None and name not in only:
            continue
        rec: dict = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        try:
            sdf = queries[name](spark, sf_dir)
            scols = list(sdf.columns)
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
            if name not in oracles:
                rec["mode"] = "rows_only"
                rec["rows_match"] = True  # driver semantics: ran, >= 0 rows
            else:
                cur = con.execute(oracles[name])
                dcols = [d[0] for d in cur.description]
                drows = cur.fetchall()
                rec["oracle_rows"] = len(drows)
                rec["rows_match"] = len(srows) == len(drows)
                rec["schema_match"] = sorted(scols) == sorted(dcols)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _comparable(scols, srows) == _comparable(dcols, drows)
                )
        except Exception as e:  # record, keep sweeping
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
        ok = rec["err"] is None and rec["rows_match"] and rec["hash_match"] in (True, None)
        if not ok:
            n_fail += 1
        print(f"{'PASS' if ok else 'FAIL'} {name} spark={rec['spark_rows']} oracle={rec['oracle_rows']}",
              flush=True)
        out[name] = rec
    con.close()
    return out, n_fail


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "4"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    spark = get_spark("local-correctness")
    out, n_fail = run_sweep(spark, sf_dir, only)
    spark.stop()
    # A non-default pin mode (persist / reliable) gets its own artifact name
    # so per-mode sweeps don't clobber the default one.
    mode = os.environ.get("MP_PIN_MODE", "local")
    tag = "" if mode == "local" else f"_{mode.upper()}"
    if only is None:
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            f"CORRECTNESS_LOCAL{tag}_r{rnd}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"\n{len(out) - n_fail}/{len(out)} green -> {path}")
    else:
        print(f"\n{len(out) - n_fail}/{len(out)} green (partial sweep, artifact not written)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
