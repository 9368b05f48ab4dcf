"""Algorithm procedures — the `algo.*` surface re-expressed Spark-first."""

from linkgraph.algorithms.degrees import degree_centrality
from linkgraph.algorithms.lpa import label_propagation
from linkgraph.algorithms.pagerank import PageRank, article_rank, eigenvector_centrality, pagerank
from linkgraph.algorithms.triangles import triangle_count, triangle_stream
from linkgraph.algorithms.wcc import wcc

__all__ = [
    "PageRank",
    "pagerank",
    "article_rank",
    "eigenvector_centrality",
    "wcc",
    "label_propagation",
    "triangle_count",
    "triangle_stream",
    "degree_centrality",
]
