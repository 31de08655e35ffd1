"""Plan-hygiene sweep over the full registry.

Every driver-facing query's physical plan is checked for scale anti-
patterns: cartesian products and broadcast-nested-loop joins (both turn
into O(n^2) work at cluster scale), and row-at-a-time Python UDF
evaluation (BatchEvalPython — the non-Arrow slow path; Arrow-batched
mapInPandas/ArrowEvalPython are allowed on the beyond-reference vectorized
paths). Planning only — nothing executes, so the sweep stays cheap and
runs at the smallest scale factor.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from conftest import SF_SMOKE

BANNED = ("CartesianProduct", "BroadcastNestedLoopJoin", "BatchEvalPython")

NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_no_scale_antipatterns_in_plan(spark, name):
    df = entry_mod.queries()[name](spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = [b for b in BANNED if b in plan]
    assert not hits, f"{name}: banned physical operators {hits}"
