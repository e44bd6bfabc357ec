"""Registry-wide physical-plan invariant: NO row-oriented Python anywhere.

Every Python touchpoint in this repo is Arrow-batched (ArrowEvalPython /
MapInPandas); a BatchEvalPython operator in any registered query's plan
means someone introduced a row-at-a-time UDF on a hot path — the single
biggest 100-TB performance regression possible. PLANS.md documents the
same property per round; this test makes it a gate."""

import io
from contextlib import redirect_stdout

import pytest

from obiemachinelearningframework_spark import queries as Q

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", sorted(Q.QUERIES))
def test_no_row_python_in_plan(spark, name):
    plan = _plan(Q.QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan, f"{name} has a row-at-a-time Python UDF"
