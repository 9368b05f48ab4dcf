"""Random walks — `algo.randomWalk.stream` (random / node2vec modes).

Reference: `algo/.../impl/walking/{RandomWalk,NodeWalker}.java`: per-start
walks with uniform or node2vec (p=return, q=inOut) transition bias.

Spark-native: walks run per start-node batch inside an Arrow UDF over the
worker-resident global CSR merged from the DISTRIBUTED block store
(blocks.write_edge_blocks on shared storage — no driver collect), seeded
numpy RNG per start node → deterministic given (seed, start).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph
from linkgraph.algorithms import blocks
from linkgraph.algorithms.betweenness import _ensure_store


def random_walks(
    graph: Graph,
    steps: int = 10,
    walks_per_node: int = 1,
    mode: str = "random",
    return_param: float = 1.0,
    in_out_param: float = 1.0,
    direction: str = "BOTH",
    seed: int = 42,
    start_nodes: list[int] | None = None,
    store_path: str | None = None,
) -> DataFrame:
    """→ (start, walk_idx, path: array<long>)."""
    path_dir, n_arr = _ensure_store(graph, direction, store_path)

    p_ret, q_io = float(return_param), float(in_out_param)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        indptr, indices, _ = blocks.load_global_csr(path_dir, n_arr)
        for pdf in batches:
            rows = []
            for s in pdf["start"].to_numpy(np.int64):
                for wi in range(walks_per_node):
                    rng = np.random.RandomState((seed * 1_000_003 + int(s)) % (2**31) + wi)
                    walk = [int(s)]
                    prev = -1
                    cur = int(s)
                    for _ in range(steps):
                        nbrs = indices[indptr[cur] : indptr[cur + 1]]
                        if len(nbrs) == 0:
                            break
                        if mode == "node2vec" and prev >= 0:
                            prev_nbrs = indices[indptr[prev] : indptr[prev + 1]]
                            w = np.where(
                                nbrs == prev,
                                1.0 / p_ret,
                                np.where(np.isin(nbrs, prev_nbrs), 1.0, 1.0 / q_io),
                            )
                            w = w / w.sum()
                            nxt = int(rng.choice(nbrs, p=w))
                        else:
                            nxt = int(nbrs[rng.randint(len(nbrs))])
                        walk.append(nxt)
                        prev, cur = cur, nxt
                    rows.append((int(s), wi, walk))
            yield pd.DataFrame(rows, columns=["start", "walk_idx", "path"])

    starts = graph.nodes.select(F.col("id").alias("start"))
    if start_nodes is not None:
        starts = starts.filter(F.col("start").isin([int(x) for x in start_nodes]))
    b = graph.nodes.sparkSession.sparkContext.defaultParallelism
    return starts.repartition(b).mapInPandas(
        run, schema="start long, walk_idx int, path array<bigint>"
    )
