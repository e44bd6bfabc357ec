"""Property test: operators/graph.triangles equals brute-force triangle
enumeration on random graphs (including multi-edges, self-loops, and
reversed duplicates, which the operator must normalize away), and emits
each triangle exactly once."""

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from obiemachinelearningframework_spark.operators.graph import triangles

NODES = [f"n{i}" for i in range(9)]

edge_lists = st.lists(
    st.tuples(st.sampled_from(NODES), st.sampled_from(NODES)),
    min_size=0,
    max_size=40,
)


def _brute(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    return {
        (a, b, c)
        for a, b, c in combinations(nodes, 3)
        if (a, b) in und and (b, c) in und and (a, c) in und
    }


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edges=edge_lists)
def test_triangles_match_brute_force(spark, edges):
    df = spark.createDataFrame(edges or [("n0", "n0")], ["u", "v"])
    rows = [(r.na, r.nb, r.nc) for r in triangles(df).collect()]
    assert len(rows) == len(set(rows)), "each triangle exactly once"
    assert all(a < b < c for a, b, c in rows)
    assert set(rows) == _brute(edges)
