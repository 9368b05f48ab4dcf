"""Algorithm procedures — the `algo.*` surface re-expressed Spark-first."""

from linkgraph.algorithms.betweenness import betweenness_centrality
from linkgraph.algorithms.degrees import degree_centrality
from linkgraph.algorithms.louvain import louvain
from linkgraph.algorithms.lpa import label_propagation
from linkgraph.algorithms.msbfs import (
    all_shortest_paths_stream,
    closeness_centrality,
    dangalchev_closeness,
    harmonic_centrality,
)
from linkgraph.algorithms.pagerank import PageRank, article_rank, eigenvector_centrality, pagerank
from linkgraph.algorithms.paths import (
    astar,
    bfs,
    delta_stepping,
    dfs,
    minimum_spanning_forest,
    shortest_path,
    shortest_paths,
    yens_k_shortest_paths,
)
from linkgraph.algorithms.randomwalk import random_walks
from linkgraph.algorithms.scc import scc, scc_tarjan
from linkgraph.algorithms.triangles import (
    balanced_triads,
    triangle_count,
    triangle_count_global,
    triangle_stream,
)
from linkgraph.algorithms.wcc import wcc, wcc_stats

__all__ = [
    "PageRank",
    "pagerank",
    "article_rank",
    "eigenvector_centrality",
    "wcc",
    "wcc_stats",
    "label_propagation",
    "louvain",
    "triangle_count",
    "triangle_count_global",
    "triangle_stream",
    "balanced_triads",
    "degree_centrality",
    "closeness_centrality",
    "harmonic_centrality",
    "dangalchev_closeness",
    "all_shortest_paths_stream",
    "betweenness_centrality",
    "shortest_path",
    "shortest_paths",
    "astar",
    "yens_k_shortest_paths",
    "delta_stepping",
    "bfs",
    "dfs",
    "minimum_spanning_forest",
    "random_walks",
    "scc",
    "scc_tarjan",
]
