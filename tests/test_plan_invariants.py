"""Plan-quality gate over EVERY driver query: the physical plan each query
compiles to must satisfy the invariants the 100 TB design depends on —
independent of whether the answer is right (oracle parity checks that).

Invariants:
- no CartesianProduct anywhere (an unkeyed join that survived to the plan);
- no BatchEvalPython (row-at-a-time Python UDF — the input_hint forbids it;
  Arrow-vectorized forms ArrowEvalPython / FlatMapGroupsInPandas /
  MapInPandas are the allowed Python surfaces);
- every parquet scan carries a pruned ReadSchema (the scan node exists —
  i.e. the query didn't collapse to a LocalTableScan of collected rows).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_TINY

QUERIES = entrymod.queries()

FORBIDDEN = [
    "CartesianProduct",
    "BatchEvalPython",   # row-at-a-time Python UDF
]


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_plan_invariants(name, spark):
    df = QUERIES[name](spark, SF_TINY)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in FORBIDDEN:
        assert bad not in plan, f"{name}: forbidden operator {bad} in plan"
    # every query ultimately reads the driver parquet tables
    assert "Scan parquet" in plan or "FileScan parquet" in plan, (
        f"{name}: no parquet scan in plan (driver-side materialization?)")
