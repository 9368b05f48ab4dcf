"""k-hop neighbor sampling + skip-gram pair mining goldens."""

import pytest
from pyspark.sql import functions as F

from linkgraph.algorithms.sampling import (
    HASH_A,
    HASH_B,
    HASH_M,
    k_hop_sample,
    sample_neighbors,
)
from linkgraph.pipeline.cooccur import skipgram_pairs


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in pairs], "src long, dst long"
    )


def _expected_topf(pairs, fanout):
    """Python reference: per-src min-fanout by (affine hash, dst)."""
    bysrc = {}
    for s, d in pairs:
        bysrc.setdefault(s, []).append(d)
    out = set()
    for s, ds in bysrc.items():
        ranked = sorted(ds, key=lambda d: ((HASH_A * d + HASH_B * s) % HASH_M, d))
        out.update((s, d) for d in ranked[:fanout])
    return out


def test_sample_neighbors_matches_reference(spark):
    # star around node 0 plus a chain; fanout smaller than hub degree
    pairs = [(0, d) for d in range(1, 12)] + [(1, 2), (2, 3), (3, 4), (3, 5)]
    got = {
        (r.src, r.dst)
        for r in sample_neighbors(_edges(spark, pairs), fanout=4).collect()
    }
    assert got == _expected_topf(pairs, 4)


def test_sample_neighbors_salt_invariance(spark):
    pairs = [(i % 7, (i * 13 + 5) % 50) for i in range(200)]
    pairs = list(set(pairs))
    e = _edges(spark, pairs)
    a = {(r.src, r.dst) for r in sample_neighbors(e, 3, salt_buckets=1).collect()}
    b = {(r.src, r.dst) for r in sample_neighbors(e, 3, salt_buckets=16).collect()}
    assert a == b == _expected_topf(pairs, 3)


def test_k_hop_sample_frontier_semantics(spark):
    pairs = [(0, d) for d in range(1, 8)] + [
        (d, 100 + d * 10 + j) for d in range(1, 8) for j in range(4)
    ]
    e = _edges(spark, pairs)
    seeds = spark.createDataFrame([(0,)], "id long")
    got = k_hop_sample(e, seeds, (3, 2)).collect()
    hop1 = {(r.src, r.dst) for r in got if r.hop == 1}
    hop2 = {(r.src, r.dst) for r in got if r.hop == 2}
    exp1 = _expected_topf([(0, d) for d in range(1, 8)], 3)
    assert hop1 == exp1
    frontier = {d for _, d in exp1}
    exp2 = _expected_topf([(s, d) for s, d in pairs if s in frontier], 2)
    assert hop2 == exp2
    # fanout cap respected per node per hop
    from collections import Counter

    c1 = Counter(s for s, _ in hop1)
    c2 = Counter(s for s, _ in hop2)
    assert max(c1.values()) <= 3 and max(c2.values()) <= 2


def test_k_hop_sample_deterministic(spark):
    pairs = [(i % 11, (i * 7 + 3) % 40) for i in range(150)]
    pairs = [p for p in set(pairs) if p[0] != p[1]]
    e = _edges(spark, pairs).repartition(7)
    seeds = spark.createDataFrame([(i,) for i in range(0, 11, 2)], "id long")
    r1 = sorted(map(tuple, k_hop_sample(e, seeds, (2, 2)).collect()))
    r2 = sorted(map(tuple, k_hop_sample(e, seeds, (2, 2)).collect()))
    assert r1 == r2 and len(r1) > 0


def test_skipgram_pairs_reference(spark):
    texts = [
        (0, "a b c a b"),
        (1, "b c d"),
        (2, "a a a"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r.w_left, r.w_right): r.cnt
        for r in skipgram_pairs(docs, window=2, k=1000).collect()
    }
    from collections import Counter

    exp = Counter()
    for _, t in texts:
        toks = t.split(" ")
        for i, x in enumerate(toks):
            for y in toks[i + 1 : i + 3]:
                exp[(x, y)] += 1
    assert got == dict(exp)


def test_skipgram_topk_order(spark):
    docs = spark.createDataFrame(
        [(0, "x y x y x y"), (1, "p q")], "doc_id long, text string"
    )
    rows = skipgram_pairs(docs, window=1, k=2).collect()
    assert [(r.w_left, r.w_right) for r in rows] == [("x", "y"), ("y", "x")]


def test_weighted_sample_reference(spark):
    import hashlib

    from linkgraph.pipeline.text import weighted_sample

    rows = [(i, 10 + (i * 7) % 90) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = [
        (r.doc_id, r.sample_key)
        for r in weighted_sample(
            docs, F.col("n_chars").cast("double"), n=20
        ).collect()
    ]

    def key(i, w):
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) + 0.5) / 16**15
        return u ** (1.0 / w)

    exp = sorted(rows, key=lambda r: (-key(*r), r[0]))[:20]
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, k_got), (i, w) in zip(got, exp):
        assert abs(k_got - key(i, w)) < 1e-5


def test_weighted_sample_bias(spark):
    from linkgraph.pipeline.text import weighted_sample

    # ids 0-99 weight 1, ids 100-199 weight 20: heavy rows must dominate
    rows = [(i, 1.0 if i < 100 else 20.0) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, w double")
    picked = {
        r.doc_id for r in weighted_sample(docs, F.col("w"), n=40).collect()
    }
    heavy = sum(1 for d in picked if d >= 100)
    assert heavy >= 30


def test_katz_numpy_parity(spark):
    import numpy as np

    from linkgraph.graph import Graph
    from linkgraph.algorithms.pagerank import katz_centrality

    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (0, 3)]
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in pairs], "src long, dst long, weight double"
    )
    nodes = spark.createDataFrame([(i,) for i in range(5)], "id long")
    g = Graph.from_edges(e, nodes=nodes)
    got = {r.id: r.rank for r in katz_centrality(g, 0.1, 1.0, 12).collect()}

    A = np.zeros((5, 5))
    for s, d in pairs:
        A[s, d] = 1.0
    x = np.ones(5)
    for _ in range(12):
        x = 0.1 * (A.T @ x) + 1.0
    for i in range(5):
        assert abs(got[i] - x[i]) < 1e-9


def test_katz_join_path_matches_pull(spark):
    from linkgraph.graph import Graph
    from linkgraph.algorithms.pagerank import katz_centrality

    pairs = [(i, (i * 3 + 1) % 9) for i in range(9)] + [(2, 7), (5, 1)]
    e = spark.createDataFrame(
        [(s, d, 1.0) for s, d in pairs if s != d], "src long, dst long, weight double"
    )
    # non-contiguous ids (shifted by 100) force the join loop; compare
    # against the contiguous pull path on the same structure
    e2 = e.select((F.col("src") + 100).alias("src"), (F.col("dst") + 100).alias("dst"), "weight")
    n1 = spark.createDataFrame([(i,) for i in range(9)], "id long")
    n2 = spark.createDataFrame([(i + 100,) for i in range(9)], "id long")
    a = {r.id: r.rank for r in katz_centrality(Graph.from_edges(e, nodes=n1), 0.15, 1.0, 8).collect()}
    b = {r.id - 100: r.rank for r in katz_centrality(Graph.from_edges(e2, nodes=n2), 0.15, 1.0, 8).collect()}
    for i in a:
        assert abs(a[i] - b[i]) < 1e-9


def test_walk_skipgram_pairs_reference(spark):
    from linkgraph.pipeline.cooccur import walk_skipgram_pairs

    walks = spark.createDataFrame(
        [
            (0, 0, [0, 1, 2, 3]),
            (1, 0, [1, 2, -1, -1]),   # died after step 1: -1 never pairs
            (2, 0, [2, 0, 2, 0]),
        ],
        "start long, walk_idx int, path array<long>",
    )
    got = {
        (r.u, r.v): r.cnt
        for r in walk_skipgram_pairs(walks, window=2, k=1000).collect()
    }
    from collections import Counter

    exp = Counter()
    for p in [[0, 1, 2, 3], [1, 2, -1, -1], [2, 0, 2, 0]]:
        for i, x in enumerate(p):
            for y in p[i + 1 : i + 3]:
                if x >= 0 and y >= 0:
                    exp[(x, y)] += 1
    assert got == dict(exp)


def test_pull_store_cache_reuses_and_isolates(spark, monkeypatch):
    """The plan-keyed store cache must (a) skip the rebuild on a repeat
    run over the same logical edges and (b) never serve one graph's store
    to a different graph."""
    import linkgraph.algorithms.blocks as B
    from linkgraph.graph import Graph
    from linkgraph.algorithms.pagerank import katz_centrality

    builds = []
    real_write = B.write_pull_blocks

    def counting_write(*a, **kw):
        builds.append(1)
        return real_write(*a, **kw)

    monkeypatch.setattr(B, "write_pull_blocks", counting_write)

    def graph_of(pairs, n):
        e = spark.createDataFrame(
            [(s, d, 1.0) for s, d in pairs], "src long, dst long, weight double"
        )
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        return Graph.from_edges(e, nodes=nodes)

    g1 = graph_of([(0, 1), (1, 2), (2, 0)], 3)
    g2 = graph_of([(0, 1), (1, 0), (2, 1)], 3)

    r1a = {r.id: r.rank for r in katz_centrality(g1, 0.1, 1.0, 5).collect()}
    n_after_first = len(builds)
    r1b = {r.id: r.rank for r in katz_centrality(g1, 0.1, 1.0, 5).collect()}
    assert len(builds) == n_after_first  # repeat: no rebuild
    assert r1a == r1b
    r2 = {r.id: r.rank for r in katz_centrality(g2, 0.1, 1.0, 5).collect()}
    assert len(builds) > n_after_first  # different graph: its own store
    assert r2 != r1a  # and genuinely different results


def test_sample_neighbors_fallback_path_exact(spark):
    """With a tiny oversample factor most nodes fail the prefilter
    deficiency check and take the full-adjacency fallback — the result
    must STILL equal the deterministic top-f exactly."""
    pairs = [(s, d) for s in range(6) for d in range(40) if s != d]
    got = {
        (r.src, r.dst)
        for r in sample_neighbors(
            _edges(spark, pairs), fanout=5, oversample=0.25
        ).collect()
    }
    assert got == _expected_topf(pairs, 5)
