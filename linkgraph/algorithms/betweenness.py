"""Betweenness centrality — `algo.betweenness` (+ RA-Brandes sampling).

Reference: `algo/.../impl/betweenness/{BetweennessCentrality,
ParallelBetweennessCentrality,RABrandesBetweennessCentrality}.java`.

Brandes' dependency accumulation doesn't decompose into joins (SURVEY.md §7
hard-part 6). Spark-native form: batch the SOURCES — each Arrow task runs
exact per-source Brandes over the worker-resident CSR block store (the
whole graph, mmap-shared via the OS page cache like pagerank blocks) and
emits partial dependency scores; `groupBy(id).agg(sum)` combines. Exact
when sources = all nodes; RA-Brandes sampling (`strategy: random|degree`,
`probability`) scales it down, scores scaled by n/|S| as in the reference.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph

_CSR_CACHE: dict[str, tuple] = {}


def _csr_store(graph: Graph, direction: str, path: str) -> None:
    import os

    edges = (
        graph.undirected_edges() if direction == "BOTH" else graph.edges
    ).select("src", "dst")
    pdf = edges.toPandas()
    n = int(graph.nodes.agg(F.max("id")).first()[0]) + 1
    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, src + 1, 1)
    indptr = np.cumsum(indptr)
    os.makedirs(path, exist_ok=True)
    np.save(os.path.join(path, "indptr.npy"), indptr)
    np.save(os.path.join(path, "indices.npy"), dst)
    open(os.path.join(path, "_SUCCESS"), "w").close()


def _load_csr(path: str):
    import os

    csr = _CSR_CACHE.get(path)
    if csr is None:
        csr = (
            np.load(os.path.join(path, "indptr.npy"), mmap_mode="r"),
            np.load(os.path.join(path, "indices.npy"), mmap_mode="r"),
        )
        _CSR_CACHE[path] = csr
    return csr


def _brandes_batch(path: str):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        indptr, indices = _load_csr(path)
        n = len(indptr) - 1
        for pdf in batches:
            dep_total = np.zeros(n)
            for s in pdf["source"].to_numpy(np.int64):
                # BFS phase
                dist = np.full(n, -1, np.int64)
                sigma = np.zeros(n)
                dist[s] = 0
                sigma[s] = 1.0
                order = [int(s)]
                frontier = [int(s)]
                d = 0
                while frontier:
                    nxt = []
                    for u in frontier:
                        for v in indices[indptr[u] : indptr[u + 1]]:
                            v = int(v)
                            if dist[v] == -1:
                                dist[v] = d + 1
                                nxt.append(v)
                                order.append(v)
                            if dist[v] == d + 1:
                                sigma[v] += sigma[u]
                    frontier = nxt
                    d += 1
                # accumulation phase (reverse BFS order)
                delta = np.zeros(n)
                for u in reversed(order):
                    for v in indices[indptr[u] : indptr[u + 1]]:
                        v = int(v)
                        if dist[v] == dist[u] + 1 and sigma[v] > 0:
                            delta[u] += sigma[u] / sigma[v] * (1.0 + delta[v])
                    if u != s:
                        dep_total[u] += delta[u]
            nz = np.nonzero(dep_total)[0]
            yield pd.DataFrame({"id": nz.astype(np.int64), "partial": dep_total[nz]})

    return run


def betweenness_centrality(
    graph: Graph,
    direction: str = "OUTGOING",
    probability: float | None = None,
    strategy: str = "random",
    seed: int = 42,
    batch_size: int = 16,
) -> DataFrame:
    """→ (id, centrality). Exact Brandes when probability is None, else
    RA-Brandes sampled pivots with n/|S| scaling."""
    import tempfile

    path = tempfile.mkdtemp(prefix="linkgraph_brandes_")
    _csr_store(graph, direction, path)
    sources = graph.nodes.select(F.col("id").alias("source"))
    n = sources.count()
    scale = 1.0
    if probability is not None:
        if strategy == "degree":
            deg = graph.degrees(direction="BOTH").withColumnRenamed("id", "source")
            mx = deg.agg(F.max("degree")).first()[0] or 1.0
            sources = (
                sources.join(deg, "source")
                .withColumn("_r", F.rand(seed))
                .filter(F.col("_r") < probability * (F.col("degree") / mx) * 2)
                .select("source")
            )
        else:
            sources = sources.sample(probability, seed=seed)
        n_sampled = sources.count()
        scale = n / max(n_sampled, 1)
    spark = graph.nodes.sparkSession
    b = spark.sparkContext.defaultParallelism
    partials = sources.repartition(b).mapInPandas(
        _brandes_batch(path), schema="id long, partial double"
    )
    dep = partials.groupBy("id").agg(F.sum("partial").alias("dep"))
    half = 0.5 if direction == "BOTH" else 1.0
    out = (
        graph.nodes.select("id")
        .join(dep, "id", "left")
        .select(
            "id",
            (F.coalesce("dep", F.lit(0.0)) * F.lit(scale) * F.lit(half)).alias(
                "centrality"
            ),
        )
    )
    return out
