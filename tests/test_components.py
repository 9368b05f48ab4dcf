import pytest

from linkgraph import Graph
from linkgraph.algorithms.lpa import label_propagation
from linkgraph.algorithms.triangles import triangle_count, triangle_count_global, triangle_stream
from linkgraph.algorithms.wcc import wcc, wcc_stats

from conftest import edges_df, nodes_df
from oracles import np_lpa_sync, np_triangles, np_wcc

# FIXTURES.md G_WCC: 3 components + a threshold-sensitive bridge
G_WCC = [
    (0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0), (4, 5, 1.0), (5, 6, 1.0),
    (6, 4, 1.0), (3, 4, 0.5),
]
WCC_IDS = list(range(9))  # 7 and 8 isolated

# FIXTURES.md G_LPA
G_LPA = [
    (0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (3, 4, 1.0), (4, 5, 1.0),
    (3, 5, 1.0), (2, 3, 0.1),
]
LPA_IDS = list(range(6))

# FIXTURES.md G_TRI: 2 triangles sharing edge (1,2)
G_TRI = [(0, 1, 1.0), (0, 2, 1.0), (1, 2, 1.0), (1, 3, 1.0), (2, 3, 1.0)]
TRI_IDS = [0, 1, 2, 3]


def test_wcc_components(spark):
    g = Graph.from_edges(edges_df(spark, G_WCC), nodes=nodes_df(spark, WCC_IDS))
    got = {r["id"]: r["component"] for r in wcc(g).collect()}
    assert got == np_wcc(G_WCC, WCC_IDS)
    assert got[0] == 0 and got[6] == 0 and got[7] == 7 and got[8] == 8


def test_wcc_threshold(spark):
    g = Graph.from_edges(edges_df(spark, G_WCC), nodes=nodes_df(spark, WCC_IDS))
    got = {r["id"]: r["component"] for r in wcc(g, threshold=0.8).collect()}
    golden = np_wcc(G_WCC, WCC_IDS, threshold=0.8)
    assert got == golden
    sizes = sorted(list(got.values()).count(c) for c in set(got.values()))
    assert sizes == [1, 1, 3, 4]


def test_wcc_long_chain_pointer_jumping(spark):
    # path of 40 nodes must converge well inside 100 rounds (O(log n))
    chain = [(i, i + 1, 1.0) for i in range(40)]
    g = Graph.from_edges(edges_df(spark, chain))
    got = {r["id"]: r["component"] for r in wcc(g, max_iterations=12).collect()}
    assert set(got.values()) == {0}


def test_wcc_stats(spark):
    g = Graph.from_edges(edges_df(spark, G_WCC), nodes=nodes_df(spark, WCC_IDS))
    row = wcc_stats(wcc(g)).first()
    assert row["communityCount"] == 3
    assert row["maxSetSize"] == 7


def test_wcc_checkpoint_resume(spark, tmp_path):
    from linkgraph.io import CheckpointManager

    chain = [(i, i + 1, 1.0) for i in range(30)]
    g = Graph.from_edges(edges_df(spark, chain))
    full = {r["id"]: r["component"] for r in wcc(g).collect()}
    ck = CheckpointManager(spark, str(tmp_path / "wcc_ck"))
    wcc(g, max_iterations=2, checkpoint=ck, checkpoint_every=1)  # interrupted early
    resumed = {r["id"]: r["component"]
               for r in wcc(g, checkpoint=ck, checkpoint_every=1).collect()}
    assert resumed == full


def test_lpa_seeded_clusters(spark):
    nodes = nodes_df(spark, LPA_IDS, seeds={0: 10, 3: 20})
    g = Graph.from_edges(edges_df(spark, G_LPA), nodes=nodes)
    got = {r["id"]: r["label"] for r in
           label_propagation(g, max_iterations=50, seed_col="seed").collect()}
    golden = np_lpa_sync(G_LPA, LPA_IDS, seeds={0: 10, 3: 20})
    assert got == golden
    # two distinct clusters
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


def test_lpa_unseeded(spark):
    g = Graph.from_edges(edges_df(spark, G_LPA), nodes=nodes_df(spark, LPA_IDS))
    got = {r["id"]: r["label"] for r in label_propagation(g, max_iterations=50).collect()}
    golden = np_lpa_sync(G_LPA, LPA_IDS)
    assert got == golden


def test_triangle_counts(spark):
    g = Graph.from_edges(edges_df(spark, G_TRI), nodes=nodes_df(spark, TRI_IDS))
    got = {r["id"]: (r["triangles"], r["coefficient"])
           for r in triangle_count(g).collect()}
    tri, coef = np_triangles(G_TRI, TRI_IDS)
    for i in TRI_IDS:
        assert got[i][0] == tri[i]
        assert got[i][1] == pytest.approx(coef[i])
    assert {i: t for i, (t, _) in got.items()} == {0: 1, 1: 2, 2: 2, 3: 1}


def test_triangle_global(spark):
    g = Graph.from_edges(edges_df(spark, G_TRI), nodes=nodes_df(spark, TRI_IDS))
    row = triangle_count_global(g).first()
    assert row["triangleCount"] == 2
    assert row["averageClusteringCoefficient"] == pytest.approx(5.0 / 6.0)


def test_triangle_stream_rows(spark):
    g = Graph.from_edges(edges_df(spark, G_TRI), nodes=nodes_df(spark, TRI_IDS))
    rows = sorted(tuple(r) for r in triangle_stream(g).collect())
    assert rows == [(0, 1, 2), (1, 2, 3)]


def test_triangles_direction_invariant(spark):
    # same undirected graph given with reversed/duplicated directions
    doubled = G_TRI + [(d, s, w) for s, d, w in G_TRI]
    g = Graph.from_edges(edges_df(spark, doubled), nodes=nodes_df(spark, TRI_IDS))
    row = triangle_count_global(g).first()
    assert row["triangleCount"] == 2


def test_lpa_checkpoint_resume(spark, tmp_path):
    from linkgraph.io import CheckpointManager
    from linkgraph.algorithms.lpa import label_propagation

    edges = [(i, i + 1, 1.0) for i in range(12)] + [(20, 21, 1.0), (21, 22, 1.0)]
    g = Graph.from_edges(edges_df(spark, edges))
    full = {r["id"]: r["label"]
            for r in label_propagation(g, max_iterations=8).collect()}
    ck = CheckpointManager(spark, str(tmp_path / "lpa_ck"))
    # interrupted after 2 of 8 iterations, snapshot every iteration
    label_propagation(g, max_iterations=2, checkpoint=ck, checkpoint_every=1,
                      run_to_convergence=False)
    resumed = {r["id"]: r["label"]
               for r in label_propagation(g, max_iterations=8, checkpoint=ck,
                                          checkpoint_every=1).collect()}
    assert resumed == full
