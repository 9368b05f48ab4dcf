"""Utility procedures — `algo.list`, `algo.help`, `algo.version`, `algo.memrec`.

Reference: `algo/src/main/java/org/neo4j/graphalgo/ListProc.java`,
`MemRecProc.java`, `VersionFunc.java`. The registry below is the engine's
procedure catalog: name → callable + one-line description, filterable like
`CALL algo.list('pagerank')`.
"""

from __future__ import annotations

import linkgraph

_REGISTRY: dict[str, tuple[str, str]] = {
    # name: (module path, description)
    "algo.pageRank": ("linkgraph.algorithms.pagerank.PageRank", "PageRank, damping/tolerance/weighted/personalized; push-CSR, pull-CSC or join strategies"),
    "algo.articleRank": ("linkgraph.algorithms.pagerank.article_rank", "ArticleRank (denominator outdeg+avg_outdeg)"),
    "algo.eigenvector": ("linkgraph.algorithms.pagerank.eigenvector_centrality", "eigenvector centrality, power iteration + normalization"),
    "algo.degree": ("linkgraph.algorithms.degrees.degree_centrality", "in/out/both (weighted) degree centrality"),
    "algo.closeness": ("linkgraph.algorithms.msbfs.closeness_centrality", "closeness via MSBFS bitset frontiers; improved=Wasserman-Faust"),
    "algo.closeness.harmonic": ("linkgraph.algorithms.msbfs.harmonic_centrality", "harmonic centrality"),
    "algo.closeness.dangalchev": ("linkgraph.algorithms.msbfs.dangalchev_closeness", "Dangalchev closeness"),
    "algo.betweenness": ("linkgraph.algorithms.betweenness.betweenness_centrality", "Brandes, exact or RA-Brandes sampled"),
    "algo.unionFind": ("linkgraph.algorithms.wcc.wcc", "weakly connected components (hash-min + pointer jumping), threshold"),
    "algo.scc": ("linkgraph.algorithms.scc.scc", "strongly connected components (forward-backward coloring)"),
    "algo.labelPropagation": ("linkgraph.algorithms.lpa.label_propagation", "seeded synchronous LPA, deterministic tie-break"),
    "algo.louvain": ("linkgraph.algorithms.louvain.louvain", "multi-level modularity optimization + coarsening"),
    "algo.triangleCount": ("linkgraph.algorithms.triangles.triangle_count", "per-node triangles + clustering coefficient"),
    "algo.triangle.stream": ("linkgraph.algorithms.triangles.triangle_stream", "stream (a,b,c) triangles"),
    "algo.balancedTriads": ("linkgraph.algorithms.triangles.balanced_triads", "signed balanced/unbalanced triads"),
    "algo.shortestPath": ("linkgraph.algorithms.paths.shortest_path", "single-pair Dijkstra"),
    "algo.shortestPath.astar": ("linkgraph.algorithms.paths.astar", "A* with haversine heuristic"),
    "algo.shortestPath.deltaStepping": ("linkgraph.algorithms.paths.delta_stepping", "parallel SSSP, bucketed relaxation"),
    "algo.shortestPaths": ("linkgraph.algorithms.paths.shortest_paths", "SSSP Dijkstra"),
    "algo.allShortestPaths.stream": ("linkgraph.algorithms.msbfs.all_shortest_paths_stream", "all-pairs BFS distances (MSBFS)"),
    "algo.kShortestPaths": ("linkgraph.algorithms.paths.yens_k_shortest_paths", "Yen's k shortest loopless paths"),
    "algo.bfs.stream": ("linkgraph.algorithms.paths.bfs", "BFS frontier traversal"),
    "algo.dfs.stream": ("linkgraph.algorithms.paths.dfs", "DFS preorder traversal"),
    "algo.spanningTree.minimum": ("linkgraph.algorithms.paths.minimum_spanning_forest", "min spanning forest (Boruvka)"),
    "algo.spanningTree.maximum": ("linkgraph.algorithms.paths.minimum_spanning_forest", "max spanning forest (maximum=True)"),
    "algo.randomWalk.stream": ("linkgraph.algorithms.randomwalk.random_walks", "random / node2vec walks"),
    "algo.similarity.jaccard": ("linkgraph.algorithms.similarity.jaccard", "set jaccard, inverted-index join, topK/cutoffs"),
    "algo.similarity.overlap": ("linkgraph.algorithms.similarity.overlap", "set overlap similarity"),
    "algo.similarity.cosine": ("linkgraph.algorithms.vector_similarity.cosine", "weighted-vector cosine, topK/cutoffs"),
    "algo.similarity.pearson": ("linkgraph.algorithms.vector_similarity.pearson", "weighted-vector pearson"),
    "algo.similarity.euclidean": ("linkgraph.algorithms.vector_similarity.euclidean", "weighted-vector euclidean distance"),
    "algo.linkprediction.*": ("linkgraph.functions.linkprediction.link_prediction_scores", "adamicAdar/resourceAllocation/commonNeighbors/totalNeighbors/preferentialAttachment"),
    "algo.similarity.functions": ("linkgraph.functions.similarities", "scalar jaccard/cosine/pearson/overlap/euclidean over lists"),
    "algo.ml.oneHotEncoding": ("linkgraph.functions.similarities.one_hot_encoding", "one-hot list encoding"),
    "algo.isFinite": ("linkgraph.functions.similarities.is_finite", "float guard"),
    "algo.graph.load": ("linkgraph.catalog.GraphCatalog.load", "named graph catalog: load/info/list/remove/save"),
}


def list_procs(filter_substr: str | None = None) -> list[dict]:
    """`CALL algo.list([filter])`."""
    out = []
    for name, (impl, desc) in sorted(_REGISTRY.items()):
        if filter_substr and filter_substr.lower() not in name.lower():
            continue
        out.append({"name": name, "implementation": impl, "description": desc})
    return out


def help_proc(name: str) -> dict | None:
    """`CALL algo.help(name)`."""
    hits = list_procs(name)
    return hits[0] if hits else None


def version() -> str:
    """`algo.version()`."""
    return linkgraph.__version__
