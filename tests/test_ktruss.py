"""k-truss vs an independent pure-python synchronous peel oracle."""

from hypothesis import HealthCheck, given, settings, strategies as st

from linkgraph.graph import Graph
from tests.conftest import edges_df


def _py_ktruss(pairs, k):
    """Synchronous peel on canonical undirected pairs → surviving edge set
    with final supports."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}

    def supports(es):
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {(a, b): len(adj[a] & adj[b]) for a, b in es}

    while True:
        sup = supports(edges)
        kept = {e for e in edges if sup[e] >= k - 2}
        if kept == edges:
            return {e: sup[e] for e in edges}
        edges = kept


def _graph(spark, pairs, n):
    return Graph.from_edges(
        edges_df(spark, [(a, b, 1.0) for a, b in pairs]),
        nodes=spark.createDataFrame([(i,) for i in range(n)], "id long"),
    )


def test_ktruss_clique_with_tail(spark):
    from linkgraph.algorithms.ktruss import k_truss

    # 5-clique (every edge support 3 → survives k=4 and k=5) + triangle
    # glued at node 0 (support 1 → dies at k=4) + pendant edge
    clique = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    tri = [(0, 5), (5, 6), (6, 0)]
    pairs = clique + tri + [(6, 7)]
    g = _graph(spark, pairs, 8)

    out = k_truss(g, k=4)
    got = {(r["src"], r["dst"]): r["support"] for r in out.collect()}
    want = _py_ktruss(pairs, 4)
    assert got == want
    assert set(got) == set(clique)
    assert out.did_converge

    out3 = k_truss(g, k=3)
    got3 = {(r["src"], r["dst"]): r["support"] for r in out3.collect()}
    assert got3 == _py_ktruss(pairs, 3)
    assert (6, 7) not in got3  # pendant edge closes no triangle


@settings(max_examples=3, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.tuples(st.integers(0, 9), st.integers(0, 9)),
                min_size=5, max_size=40))
def test_ktruss_random_parity(spark, pairs):
    from linkgraph.algorithms.ktruss import k_truss

    pairs = [p for p in pairs if p[0] != p[1]]
    if not pairs:
        return
    g = _graph(spark, pairs, 10)
    out = k_truss(g, k=4, max_rounds=20)
    got = {(r["src"], r["dst"]): r["support"] for r in out.collect()}
    assert got == _py_ktruss(pairs, 4)
