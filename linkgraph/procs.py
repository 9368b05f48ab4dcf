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
    "algo.katz": ("linkgraph.algorithms.pagerank.katz_centrality", "Katz centrality x = alpha*A'x + beta (engine-added; gds.katz analogue)"),
    "algo.degree": ("linkgraph.algorithms.degrees.degree_centrality", "in/out/both (weighted) degree centrality"),
    "algo.closeness": ("linkgraph.algorithms.msbfs.closeness_centrality", "closeness via MSBFS bitset frontiers; improved=Wasserman-Faust"),
    "algo.closeness.harmonic": ("linkgraph.algorithms.msbfs.harmonic_centrality", "harmonic centrality"),
    "algo.closeness.dangalchev": ("linkgraph.algorithms.msbfs.dangalchev_closeness", "Dangalchev closeness"),
    "algo.betweenness": ("linkgraph.algorithms.betweenness.betweenness_centrality", "Brandes, exact or RA-Brandes sampled"),
    "algo.unionFind": ("linkgraph.algorithms.wcc.wcc", "weakly connected components (alternating large/small-star), threshold"),
    "algo.kcore": ("linkgraph.algorithms.kcore.k_core", "k-core membership by iterative peeling (engine-added; gds.kcore analogue)"),
    "algo.kcore.coreness": ("linkgraph.algorithms.kcore.core_numbers", "per-node core number via iterated h-index fixpoint"),
    "algo.hits": ("linkgraph.algorithms.hits.hits", "hubs & authorities (Kleinberg HITS; engine-added, gds.hits analogue)"),
    "algo.ktruss": ("linkgraph.algorithms.ktruss.k_truss", "k-truss edges by synchronous support peel (engine-added cohesion ladder step)"),
    "algo.contract": ("linkgraph.algorithms.coarsen.contract_edges", "contract an edge list onto a node->group mapping (host/repo rollup)"),
    "algo.scc": ("linkgraph.algorithms.scc.scc", "strongly connected components (forward-backward coloring)"),
    "algo.labelPropagation": ("linkgraph.algorithms.lpa.label_propagation", "seeded synchronous LPA, deterministic tie-break"),
    "algo.louvain": ("linkgraph.algorithms.louvain.louvain", "multi-level modularity optimization + coarsening"),
    "algo.infoMap": ("linkgraph.algorithms.infomap.infomap", "two-level map equation over PageRank flows"),
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
    "algo.spanningTree.kmin": ("linkgraph.algorithms.paths.k_spanning_tree", "k-cluster spanning tree (cut k-1 heaviest MST edges)"),
    "algo.spanningTree.kmax": ("linkgraph.algorithms.paths.k_spanning_tree", "k-cluster max spanning tree (maximum=True)"),
    "algo.randomWalk.stream": ("linkgraph.algorithms.randomwalk.random_walks", "random / node2vec walks"),
    "algo.similarity.jaccard": ("linkgraph.algorithms.similarity.jaccard", "set jaccard, inverted-index join, topK/cutoffs"),
    "algo.similarity.overlap": ("linkgraph.algorithms.similarity.overlap", "set overlap similarity"),
    "algo.similarity.cosine": ("linkgraph.algorithms.vector_similarity.cosine", "weighted-vector cosine, topK/cutoffs"),
    "algo.similarity.pearson": ("linkgraph.algorithms.vector_similarity.pearson", "weighted-vector pearson"),
    "algo.similarity.euclidean": ("linkgraph.algorithms.vector_similarity.euclidean", "weighted-vector euclidean distance"),
    "algo.similarity.cosine.sparse": ("linkgraph.algorithms.vector_similarity.cosine_sparse", "sparse (item,category,weight) cosine via inverted index - asVector path"),
    "algo.similarity.pearson.sparse": ("linkgraph.algorithms.vector_similarity.pearson_sparse", "sparse pearson via inverted index"),
    "algo.similarity.euclidean.sparse": ("linkgraph.algorithms.vector_similarity.euclidean_sparse", "sparse euclidean via inverted index"),
    "algo.similarity.asVector": ("linkgraph.functions.similarities.as_vector", "(item,category,weight) rows to sparse/dense vectors"),
    "algo.linkprediction.*": ("linkgraph.functions.linkprediction.link_prediction_scores", "adamicAdar/resourceAllocation/commonNeighbors/totalNeighbors/preferentialAttachment"),
    "algo.similarity.functions": ("linkgraph.functions.similarities", "scalar jaccard/cosine/pearson/overlap/euclidean over lists"),
    "algo.ml.oneHotEncoding": ("linkgraph.functions.similarities.one_hot_encoding", "one-hot list encoding"),
    "algo.isFinite": ("linkgraph.functions.similarities.is_finite", "float guard"),
    "algo.isInfinite": ("linkgraph.functions.similarities.is_infinite", "float guard"),
    "algo.asNode": ("linkgraph.functions.nodes.as_node", "rehydrate node properties onto a result stream"),
    "algo.asNodes": ("linkgraph.functions.nodes.as_nodes", "rehydrate an array of node ids"),
    "algo.getNodesById": ("linkgraph.functions.nodes.get_nodes_by_id", "node rows for given ids"),
    "algo.anf": ("linkgraph.algorithms.anf.neighborhood_function", "ANF neighborhood function N(h) via FM bit_or sketches (engine-added; HyperANF analogue)"),
    "algo.anf.effectiveDiameter": ("linkgraph.algorithms.anf.effective_diameter", "effective diameter (q-quantile of N(h), interpolated)"),
    "algo.memrec": ("linkgraph.procs.memrec", "memory estimate for an algorithm over a graph"),
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


_MEMREC_PER_ALGO = {
    # bytes-per-node / bytes-per-edge coefficient estimates for the Spark
    # engine's structures (rank vectors, CSR block arrays, label frames) —
    # the analogue of MemRecProc's MemoryEstimation trees (P/MemRecProc.java)
    # keys are the post-normalization form (lowercase, dots and the
    # 'algo' prefix stripped) so every registry name actually matches
    "pagerank": (3 * 8, 8 + 8 + 4),     # ranks+teleport+tmp / w_norm+src+code
    "unionfind": (2 * 8, 2 * 2 * 8),    # labels / symmetric star edge rows
    "labelpropagation": (2 * 8, 2 * 8),
    "trianglecount": (2 * 8, 3 * 8),
    "louvain": (4 * 8, 3 * 8),
    "betweenness": (4 * 8, 2 * 8),
    "kcore": (2 * 8, 2 * 2 * 8),        # est/core labels / symmetric edges
    "kcorecoreness": (2 * 8, 2 * 2 * 8),
    "hits": (3 * 8, 2 * 8),             # hub+auth+raw / edge rows
    "anf": (16 * 8 * 2, 8),             # R=16 masks ×(old+new) / edge keys
    "ktruss": (2 * 8, 3 * 2 * 8),       # degree keys / oriented+support rows
}


def memrec(graph, algo: str = "pagerank", num_executors: int = 1) -> dict:
    """`CALL algo.memrec` — estimated memory footprint for `algo` over the
    projected graph, per executor and total (heap-equivalent bytes)."""
    key = algo.lower().replace(".", "").replace("algo", "")
    per_node, per_edge = _MEMREC_PER_ALGO.get(key, _MEMREC_PER_ALGO["pagerank"])
    n = graph.num_nodes()
    m = graph.num_edges()
    total = n * per_node + m * per_edge
    return {
        "algo": algo,
        "nodes": n,
        "relationships": m,
        "bytesPerNode": per_node,
        "bytesPerRel": per_edge,
        "requiredMemoryTotal": int(total),
        "requiredMemoryPerExecutor": int(total / max(num_executors, 1)),
    }


_WRITE_MODE = {
    # procs whose `write: true` config returns the reference-style stats
    # row (algo/.../results/*) instead of the stream DataFrame
    "algo.pageRank": "pageRank",
    "algo.katz": "katz",
    "algo.articleRank": "articleRank",
    "algo.eigenvector": "eigenvector",
    "algo.degree": "degree",
    "algo.unionFind": "unionFind",
    "algo.scc": "scc",
    "algo.labelPropagation": "labelPropagation",
    "algo.louvain": "louvain",
    "algo.infoMap": "infomap",
    "algo.betweenness": "betweenness",
    "algo.closeness": "closeness",
    "algo.closeness.harmonic": "closeness",
    "algo.closeness.dangalchev": "closeness",
    "algo.triangleCount": "triangleCount",
    "algo.kcore": "kcore",
    "algo.kcore.coreness": "kcoreCoreness",
    "algo.hits": "hits",
    "algo.ktruss": "ktruss",
    "algo.spanningTree.minimum": "spanningTree",
    "algo.spanningTree.maximum": "spanningTree",
}

_SIM_WRITE = {
    # pair-producing similarity procs whose write mode returns the
    # reference's SimilaritySummaryResult row (nodes, similarityPairs,
    # min/max/mean, percentiles) — ref algo/.../SimilarityProc.java
    "algo.similarity.jaccard",
    "algo.similarity.overlap",
    "algo.similarity.cosine",
    "algo.similarity.pearson",
    "algo.similarity.euclidean",
    "algo.similarity.cosine.sparse",
    "algo.similarity.pearson.sparse",
    "algo.similarity.euclidean.sparse",
}


def call(name: str, *args, **kwargs):
    """`CALL algo.<name>(...)` — string-dispatch to the implementation.

    Resolves the registry's dotted path (module.attr, with an optional
    class-method step like GraphCatalog.load), imports it, and invokes it
    with the given arguments. Class paths are instantiated with no args
    first; functions/classes are called directly. Raises KeyError for an
    unknown procedure (use list_procs()/help_proc() to discover).

    Reference write-mode parity: `write=True` (+ optional `writePath` /
    `writeProperty`) on a supported proc runs it through
    `results.run_write_proc` and returns the single stats row."""
    import importlib

    if name not in _REGISTRY:
        raise KeyError(f"unknown procedure {name!r}; see algo.list")
    # reference config keys that Spark manages itself (executor/task
    # parallelism, scan batching) — accepted and ignored for call parity,
    # so a migrated `CALL algo.x(..., concurrency: 4)` keeps working
    for noop in ("concurrency", "readConcurrency", "writeConcurrency",
                 "batchSize", "graph"):
        kwargs.pop(noop, None)
    write = bool(kwargs.pop("write", False))
    write_path = kwargs.pop("writePath", None)
    write_property = kwargs.pop("writeProperty", None)
    rel_type = kwargs.pop("writeRelationshipType", "SIMILAR")
    if write and name.startswith("algo.similarity.") and name in _SIM_WRITE:
        # reference SimilarityProc write mode (SimilaritySummaryResult):
        # the input is an item table, not a Graph, so the stats row is the
        # pair-score percentile summary, with the SIMILAR-rel export when
        # a writePath is given (SimilarityExporter analogue)
        from pyspark.sql import functions as SF

        from linkgraph.algorithms.vector_similarity import (
            similarity_summary,
            write_similar_relationships,
        )

        pairs = call(name, *args, **kwargs)
        if write_path is not None:
            summary = write_similar_relationships(
                pairs, write_path, rel_type=rel_type
            )
        else:
            summary = similarity_summary(pairs)
        return summary.select(
            "*",
            SF.lit(rel_type).alias("writeRelationshipType"),
            SF.lit(write_property or "score").alias("writeProperty"),
        )
    if write:
        if name not in _WRITE_MODE or not args:
            raise ValueError(
                f"write mode not supported for {name!r} "
                f"(supported: {sorted(_WRITE_MODE)})"
            )
        from linkgraph.results import run_write_proc

        graph, rest = args[0], args[1:]
        return run_write_proc(
            _WRITE_MODE[name],
            graph,
            lambda g: call(name, g, *rest, **kwargs),
            write_path=write_path,
            write_property=write_property,
        )
    impl, _desc = _REGISTRY[name]
    parts = impl.split(".")
    # longest importable module prefix, then walk attributes
    obj = None
    attrs: list[str] = []
    for cut in range(len(parts), 0, -1):
        try:
            obj = importlib.import_module(".".join(parts[:cut]))
            attrs = parts[cut:]
            break
        except ImportError:
            continue
    for a in attrs:
        obj = getattr(obj, a)
    if name.startswith("algo.graph."):
        # catalog procs dispatch through a module-level default instance
        # (the resolved attribute is an unbound method)
        from linkgraph.catalog import default_catalog

        method = impl.rsplit(".", 1)[1]
        return getattr(default_catalog(), method)(*args, **kwargs)
    if name == "algo.spanningTree.maximum" or name == "algo.spanningTree.kmax":
        kwargs.setdefault("maximum", True)
    if isinstance(obj, type) and hasattr(obj, "run"):
        # class-style algorithm (e.g. PageRank): config kwargs go to the
        # constructor, the graph (first positional) to .run()
        graph, rest = args[0], args[1:]
        return obj(*rest, **kwargs).run(graph)
    return obj(*args, **kwargs)
