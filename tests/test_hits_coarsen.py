"""HITS vs an independent numpy power-iteration oracle; graph contraction
vs hand-computed group edges."""

import numpy as np

from linkgraph.graph import Graph
from tests.conftest import edges_df


def _np_hits(n, pairs, iters):
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] = 1.0
    hub = np.ones(n)
    auth = np.zeros(n)
    for _ in range(iters):
        auth = A.T @ hub
        auth = auth * n / auth.sum() if auth.sum() > 0 else auth
        hub = A @ auth
        hub = hub * n / hub.sum() if hub.sum() > 0 else hub
    return hub, auth


def test_hits_numpy_parity(spark):
    from linkgraph.algorithms.hits import hits

    # hub-spoke + chain + isolated node: 0 points at 1,2,3; 4→1; 5 isolated
    pairs = [(0, 1), (0, 2), (0, 3), (4, 1), (3, 4), (2, 3)]
    n = 6
    g = Graph.from_edges(
        edges_df(spark, [(a, b, 1.0) for a, b in pairs]),
        nodes=spark.createDataFrame([(i,) for i in range(n)], "id long"),
    )
    out = hits(g, max_iterations=7)
    got = {r["id"]: (r["hub"], r["authority"]) for r in out.collect()}
    hub, auth = _np_hits(n, pairs, 7)
    for i in range(n):
        assert abs(got[i][0] - hub[i]) < 1e-9, (i, got[i][0], hub[i])
        assert abs(got[i][1] - auth[i]) < 1e-9, (i, got[i][1], auth[i])
    # isolated node scores exactly zero
    assert got[5] == (0.0, 0.0)
    assert out.iterations == 7


def test_hits_tolerance_converges(spark):
    from linkgraph.algorithms.hits import hits

    # bipartite star converges in one round
    pairs = [(0, 2), (1, 2)]
    g = Graph.from_edges(
        edges_df(spark, [(a, b, 1.0) for a, b in pairs]),
        nodes=spark.createDataFrame([(i,) for i in range(3)], "id long"),
    )
    out = hits(g, max_iterations=20, tolerance=1e-9)
    assert out.did_converge
    assert out.iterations < 20


def test_contract_edges_groups(spark):
    from linkgraph.algorithms.coarsen import contract_edges

    edges = edges_df(
        spark,
        [(0, 1, 2.0), (1, 2, 1.0), (2, 3, 1.0), (3, 0, 1.0), (0, 2, 1.0)],
    )
    mapping = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b"), (3, "b")], "id long, grp string"
    )
    out = contract_edges(edges, mapping, id_col="id", group_col="grp",
                         weight_col="weight")
    got = {(r["src_group"], r["dst_group"]): (r["n_edges"], r["weight"])
           for r in out.collect()}
    # a→b: (1,2) and (0,2); b→a: (3,0); self-loops (0,1),(2,3) dropped
    assert got == {("a", "b"): (2, 2.0), ("b", "a"): (1, 1.0)}

    with_loops = contract_edges(edges, mapping, id_col="id", group_col="grp",
                                drop_self_loops=False)
    got2 = {(r["src_group"], r["dst_group"]): r["n_edges"]
            for r in with_loops.collect()}
    assert got2 == {("a", "a"): 1, ("a", "b"): 2, ("b", "a"): 1, ("b", "b"): 1}


def test_degree_histogram_hand_computed(spark):
    from linkgraph.algorithms.graphstats import degree_histogram

    # out-degrees: 0→3 edges, 1→1, 2→4  ⇒ buckets: 3→b1, 1→b0, 4→b2
    edges = edges_df(
        spark,
        [(0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0),
         (1, 2, 1.0),
         (2, 0, 1.0), (2, 1, 1.0), (2, 3, 1.0), (2, 4, 1.0)],
    )
    got = {r["bucket"]: (r["n_nodes"], r["min_degree"], r["max_degree"])
           for r in degree_histogram(edges).collect()}
    assert got == {0: (1, 1, 1), 1: (1, 3, 3), 2: (1, 4, 4)}
    got_in = {r["bucket"]: r["n_nodes"]
              for r in degree_histogram(edges, direction="in").collect()}
    # in-degrees: 1→2, 2→2, 3→2, 0→1, 4→1 ⇒ bucket0: 2 nodes, bucket1: 3
    assert got_in == {0: 2, 1: 3}
