"""Scaling-benchmark job — launched via spark-submit --py-files.

Reads the cached power-law edge graph, runs the PageRank superstep loop,
prints one JSON line with throughput.

Usage: spark-submit --master local[N] --py-files dist/linkgraph.zip \
         BENCH/pagerank_job.py <edges_parquet> <supersteps> <num_blocks> <strategy> [n_nodes]
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession


def main() -> None:
    path, supersteps, num_blocks = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    strategy = sys.argv[4] if len(sys.argv) > 4 else "pull"
    n_nodes = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    spark = (
        SparkSession.builder.appName("linkgraph-scaling")
        .config("spark.sql.shuffle.partitions", str(num_blocks))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from linkgraph.graph import Graph
    from linkgraph.algorithms.pagerank import PageRank

    edges = spark.read.parquet(path)
    n_edges = edges.count()
    # node ids are 0..n-1 by construction: avoid an 800M-row distinct
    nodes = spark.range(n_nodes).select("id") if n_nodes else None
    g = Graph.from_edges(edges, nodes=nodes)
    # shared block store: built by the first run, reused (identical bytes)
    block_store = f"{path.rstrip('/')}_{strategy}blocks{num_blocks}"
    # warm-up supersteps (block build, worker spin-up, JIT, and the host's
    # CPU-frequency ramp under sustained load — measured: the identical
    # numpy kernel runs 4-12x slower on its first 1-2 invocations on this
    # sandbox VM) then the measured loop
    PageRank(max_iterations=3, strategy=strategy, num_blocks=num_blocks,
             block_store=block_store).run(g).count()
    pr = PageRank(max_iterations=supersteps, strategy=strategy,
                  num_blocks=num_blocks, block_store=block_store)
    t0 = time.time()
    pr.run(g).count()
    wall = time.time() - t0
    loop_sec = sum(pr.metrics.superstep_millis) / 1000.0
    # steady-state: median of the last half of supersteps — what a long
    # to-convergence run (20-50 iters at 1e-6) experiences once the host
    # frequency ramp settles; whole-loop edges_per_sec stays as the
    # conservative number
    import statistics

    tail = pr.metrics.superstep_millis[len(pr.metrics.superstep_millis) // 2:]
    steady_sec = statistics.median(tail) / 1000.0
    print(
        "SCALING_RESULT "
        + json.dumps(
            {
                "master": spark.sparkContext.master,
                "strategy": strategy,
                "num_blocks": num_blocks,
                "n_edges": int(n_edges),
                "supersteps": supersteps,
                "wall_sec": round(wall, 3),
                "loop_sec": round(loop_sec, 3),
                "edges_per_sec": round(n_edges * supersteps / loop_sec, 1),
                "steady_superstep_sec": round(steady_sec, 3),
                "edges_per_sec_steady": round(n_edges / steady_sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
