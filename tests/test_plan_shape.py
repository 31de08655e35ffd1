"""Plan-SHAPE regression gate: no registry entry may quietly gain a
shuffle or a sort relative to PLAN_SNAPSHOT.json.

The hygiene sweep bans categorically-bad operators; this pins the
structural cost of every plan. A refactor that adds an exchange (or turns
a broadcast join into a sort-merge join, which brings its own sorts)
fails here before it costs anything at scale. Intentional plan changes:
regenerate the snapshot with `python scripts/plan_snapshot.py` and commit
it with the change that justifies it.
"""

from __future__ import annotations

import json
import os

import pytest

import __spark_entry__ as entry_mod
from conftest import SF_SMOKE

sys_path_repo = os.path.join(os.path.dirname(__file__), "..")
SNAPSHOT_PATH = os.path.join(sys_path_repo, "PLAN_SNAPSHOT.json")

with open(SNAPSHOT_PATH) as _f:
    SNAPSHOT = json.load(_f)

NAMES = sorted(entry_mod.queries().keys())

#: Operator counts that may never grow without a deliberate snapshot bump.
GATED = ("shuffle_exchanges", "sorts", "sort_merge_joins")


@pytest.mark.parametrize("name", NAMES)
def test_plan_shape_does_not_regress(spark, name):
    from marketpipe_spark.plans.shape import plan_shape

    if name not in SNAPSHOT:
        pytest.skip(f"{name}: new entry, no snapshot row yet (regenerate)")
    df = entry_mod.queries()[name](spark, SF_SMOKE)
    live = plan_shape(df._jdf.queryExecution().executedPlan().toString())
    base = SNAPSHOT[name]
    worse = {k: (base[k], live[k]) for k in GATED if live[k] > base[k]}
    assert not worse, (
        f"{name}: plan gained structural cost {worse} (base, live); if "
        "intentional, regenerate PLAN_SNAPSHOT.json"
    )
