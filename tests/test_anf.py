"""ANF neighborhood-function estimates vs exact BFS distances."""

import itertools

from linkgraph.graph import Graph


def _graph(spark, edges, n):
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges], "src long, dst long, weight double"
    )
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    return Graph(nodes, e)


def _exact_nf(edges, n, max_h=10):
    """Exact N(h) by per-source BFS over the directed edge list."""
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    curve = {h: 0 for h in range(max_h + 1)}
    for s in range(n):
        dist = {s: 0}
        frontier = [s]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for v in frontier:
                for w in adj.get(v, []):
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        for h in range(max_h + 1):
            curve[h] += sum(1 for dd in dist.values() if dd <= h)
    return curve


def test_anf_exact_on_small_path(spark):
    """On a 4-node directed path the sketches are exact at R=64 w.h.p. —
    N(h) must land within FM noise of the true curve and hit the fixpoint."""
    from linkgraph.algorithms.anf import neighborhood_function

    edges = [(0, 1), (1, 2), (2, 3)]
    nf = neighborhood_function(_graph(spark, edges, 4), max_h=10, num_trials=64)
    rows = {r["h"]: r["neighborhood_estimate"] for r in nf.collect()}
    exact = _exact_nf(edges, 4)
    assert rows[0] == 4.0  # N(0) is exact by construction
    # diameter 3: stop needs TWO flat hops (h=4 confirms, h=5 double-checks
    # — a single flat hop is not a sketch fixpoint), so stop by h=5
    assert max(rows) <= 5
    for h in range(1, max(rows) + 1):
        assert abs(rows[h] - exact[h]) / exact[h] < 0.35  # FM noise at R=64


def test_anf_estimate_quality_clique_plus_tail(spark):
    from linkgraph.algorithms.anf import neighborhood_function

    # 8-clique (both directions) with a 4-node tail hanging off node 0
    edges = [(a, b) for a, b in itertools.permutations(range(8), 2)]
    edges += [(0, 8), (8, 9), (9, 10), (10, 11)]
    n = 12
    nf = neighborhood_function(_graph(spark, edges, n), max_h=12, num_trials=64)
    rows = {r["h"]: r["neighborhood_estimate"] for r in nf.collect()}
    exact = _exact_nf(edges, n)
    hmax = max(rows)
    for h in range(1, hmax + 1):
        assert abs(rows[h] - exact[h]) / exact[h] < 0.35
    # curve is non-decreasing in expectation; final value ≈ reachable pairs
    assert rows[hmax] > rows[0]


def test_effective_diameter_path_graph(spark):
    from linkgraph.algorithms.anf import effective_diameter

    # directed 6-path: most pairs resolve within a few hops
    edges = [(i, i + 1) for i in range(5)]
    row = effective_diameter(
        _graph(spark, edges, 6), quantile=0.9, max_h=12, num_trials=64
    ).collect()[0]
    assert 0.0 < row["effective_diameter"] <= row["max_hop"]
    assert row["n_reachable_pairs_est"] > 6
