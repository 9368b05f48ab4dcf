"""k-core decomposition vs an independent pure-python peeling oracle."""

import numpy as np
from hypothesis import HealthCheck, given, settings, strategies as st

from linkgraph.graph import Graph
from tests.conftest import edges_df


def _py_core_numbers(n, und_pairs):
    """Classic peel: repeatedly remove the min-degree node; coreness = the
    degree threshold at removal time."""
    adj = {i: set() for i in range(n)}
    for a, b in und_pairs:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    core = {i: 0 for i in range(n)}
    deg = {i: len(adj[i]) for i in range(n)}
    remaining = set(range(n))
    k = 0
    while remaining:
        v = min(remaining, key=lambda x: deg[x])
        k = max(k, deg[v])
        core[v] = k
        remaining.discard(v)
        for u in adj[v]:
            if u in remaining:
                deg[u] -= 1
    return core


def _graph(spark, pairs, n):
    return Graph.from_edges(
        edges_df(spark, [(a, b, 1.0) for a, b in pairs]),
        nodes=spark.createDataFrame([(i,) for i in range(n)], "id long"),
    )


def test_core_numbers_clique_plus_tail(spark):
    from linkgraph.algorithms.kcore import core_numbers, k_core

    # 4-clique (core 3) + triangle (core 2) + pendant chain (core 1)
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    tri = [(4, 5), (5, 6), (6, 4)]
    chain = [(3, 7), (7, 8)]
    pairs = clique + tri + chain
    g = _graph(spark, pairs, 9)
    got = {r["id"]: r["core"] for r in core_numbers(g).collect()}
    want = _py_core_numbers(9, pairs)
    assert got == want
    in3 = {r["id"] for r in k_core(g, 3).collect() if r["in_core"]}
    assert in3 == {0, 1, 2, 3}
    in1 = {r["id"] for r in k_core(g, 1).collect() if r["in_core"]}
    assert in1 == set(range(9))


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 11), st.integers(0, 11)),
                min_size=1, max_size=30))
def test_core_numbers_random_vs_peel(spark, pairs):
    from linkgraph.algorithms.kcore import core_numbers

    pairs = [(a, b) for a, b in pairs if a != b]
    if not pairs:
        return
    n = 12
    g = _graph(spark, pairs, n)
    got = {r["id"]: r["core"] for r in core_numbers(g).collect()}
    want = _py_core_numbers(n, pairs)
    assert got == want


def test_kcore_membership_equals_coreness_threshold(spark):
    """k_core(k) must equal {v : coreness(v) >= k} for every k."""
    from linkgraph.algorithms.kcore import core_numbers, k_core

    rng = np.random.RandomState(5)
    pairs = {tuple(sorted(p)) for p in rng.randint(0, 15, size=(40, 2)) if p[0] != p[1]}
    g = _graph(spark, sorted(pairs), 15)
    core = {r["id"]: r["core"] for r in core_numbers(g).collect()}
    for k in (1, 2, 3):
        members = {r["id"] for r in k_core(g, k).collect() if r["in_core"]}
        assert members == {v for v, c in core.items() if c >= k}
