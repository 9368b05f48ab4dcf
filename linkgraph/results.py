"""Write-mode stats rows — the reference's per-proc result records.

Every write-mode procedure in the reference returns a single stats row
(`algo/.../results/{PageRankScore.Stats,UnionFindResult,LouvainResult,
SCCResult,CentralityProcResult,...}.java`) with `loadMillis /
computeMillis / writeMillis`, node counts, and algorithm-specific fields
(setCount, iterations, didConverge, modularity, min/max centrality...).

``run_write_proc`` is the shared Spark analogue: time graph
materialization (load), the algorithm (compute), and the optional parquet
write-back (write), and return the one-row stats DataFrame. Algorithm
extras are read from attributes the implementations attach to their
result (``iterations`` / ``did_converge`` / ``final_modularity``) plus
one aggregate over the result DataFrame.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph
from linkgraph.io import write_table


def _component_extras(result: DataFrame, col: str = "component") -> dict:
    row = (
        result.groupBy(col)
        .agg(F.count(F.lit(1)).alias("sz"))
        .agg(
            F.count(F.lit(1)).alias("setCount"),
            F.min("sz").alias("minSetSize"),
            F.max("sz").alias("maxSetSize"),
        )
        .first()
    )
    return {
        "setCount": int(row["setCount"] or 0),
        "minSetSize": int(row["minSetSize"] if row["minSetSize"] is not None else 0),
        "maxSetSize": int(row["maxSetSize"] if row["maxSetSize"] is not None else 0),
    }


def _centrality_extras(result: DataFrame, col: str) -> dict:
    row = result.agg(
        F.min(col).alias("mn"), F.max(col).alias("mx"), F.sum(col).alias("sm")
    ).first()
    return {
        "minCentrality": float(row["mn"] if row["mn"] is not None else 0.0),
        "maxCentrality": float(row["mx"] if row["mx"] is not None else 0.0),
        "sumCentrality": float(row["sm"] if row["sm"] is not None else 0.0),
    }


def _triangle_extras(result: DataFrame) -> dict:
    """TriangleProc.Result: triangleCount / averageClusteringCoefficient."""
    row = result.agg(
        F.sum("triangles").alias("t3"), F.avg("coefficient").alias("acc")
    ).first()
    return {
        # per-node counts see each triangle at all 3 corners
        "triangleCount": int((row["t3"] or 0) // 3),
        "averageClusteringCoefficient": float(
            row["acc"] if row["acc"] is not None else 0.0
        ),
    }


def _kcore_extras(result: DataFrame) -> dict:
    row = result.agg(
        F.sum(F.col("in_core").cast("long")).alias("k"),
    ).first()
    return {"kCoreCount": int(row["k"] or 0)}


def _coreness_extras(result: DataFrame) -> dict:
    row = result.agg(F.max("core").alias("mx")).first()
    return {"maxCoreNumber": int(row["mx"] if row["mx"] is not None else 0)}


def _spanning_extras(result: DataFrame) -> dict:
    """SpanningTree Result: effectiveNodeCount / totalWeight."""
    nodes = (
        result.select(F.col("src").alias("i"))
        .unionByName(result.select(F.col("dst").alias("i")))
        .distinct()
        .count()
    )
    row = result.agg(F.sum("weight").alias("w")).first()
    return {
        "effectiveNodeCount": int(nodes),
        "totalWeight": float(row["w"] if row["w"] is not None else 0.0),
    }


# algo key → (callable path on the result, extras fn)
def _hits_extras(result: DataFrame) -> dict:
    row = result.agg(
        F.max("hub").alias("mh"), F.max("authority").alias("ma")
    ).first()
    return {
        "maxHub": float(row["mh"] if row["mh"] is not None else 0.0),
        "maxAuthority": float(row["ma"] if row["ma"] is not None else 0.0),
    }


def _ktruss_extras(result: DataFrame) -> dict:
    nodes = (
        result.select(F.col("src").alias("i"))
        .unionByName(result.select(F.col("dst").alias("i")))
        .distinct()
        .count()
    )
    row = result.agg(
        F.count(F.lit(1)).alias("m"), F.min("support").alias("ms")
    ).first()
    return {
        "edgeCount": int(row["m"] or 0),
        "effectiveNodeCount": int(nodes),
        "minSupport": int(row["ms"] if row["ms"] is not None else 0),
    }


_EXTRAS = {
    "unionFind": lambda r: _component_extras(r, "component"),
    "scc": lambda r: _component_extras(r, "component"),
    "labelPropagation": lambda r: _component_extras(r, "label"),
    "louvain": lambda r: _component_extras(r, "community"),
    "infomap": lambda r: _component_extras(r, "community"),
    "betweenness": lambda r: _centrality_extras(r, "centrality"),
    "closeness": lambda r: _centrality_extras(r, "centrality"),
    "pageRank": lambda r: _centrality_extras(r, "rank"),
    "katz": lambda r: _centrality_extras(r, "rank"),
    "articleRank": lambda r: _centrality_extras(r, "rank"),
    "eigenvector": lambda r: _centrality_extras(r, "rank"),
    "degree": lambda r: _centrality_extras(r, "score"),
    "triangleCount": _triangle_extras,
    "kcore": _kcore_extras,
    "kcoreCoreness": _coreness_extras,
    "spanningTree": _spanning_extras,
    "hits": _hits_extras,
    "ktruss": _ktruss_extras,
}


def run_write_proc(
    algo: str,
    graph: Graph,
    compute,
    write_path: str | None = None,
    write_property: str | None = None,
) -> DataFrame:
    """Run ``compute(graph) -> DataFrame`` in write mode and return the
    reference-style single stats row.

    loadMillis times graph materialization (node/edge counts — the Spark
    analogue of the reference's projection load), computeMillis times the
    algorithm INCLUDING result materialization, writeMillis the parquet
    write-back (0 when ``write_path`` is None, = stream mode).
    """
    spark = graph.nodes.sparkSession

    t0 = time.time()
    nodes = graph.num_nodes()
    rels = graph.num_edges()
    load_millis = int((time.time() - t0) * 1000)

    t0 = time.time()
    result = compute(graph)
    result = result.persist()
    result.count()  # materialize under the compute timer
    compute_millis = int((time.time() - t0) * 1000)

    t0 = time.time()
    if write_path is not None:
        write_table(result, write_path)
    write_millis = int((time.time() - t0) * 1000)

    row = {
        "loadMillis": load_millis,
        "computeMillis": compute_millis,
        "writeMillis": write_millis,
        "nodes": nodes,
        "relationships": rels,
        "iterations": int(getattr(result, "iterations", 0) or 0),
        "didConverge": bool(getattr(result, "did_converge", False)),
        "writeProperty": write_property or "",
    }
    modularity = getattr(result, "final_modularity", None)
    if modularity is not None:
        row["modularity"] = float(modularity)
    codelength = getattr(result, "codelength", None)
    if codelength is not None:
        row["codelength"] = float(codelength)
    extras_fn = _EXTRAS.get(algo)
    if extras_fn is not None:
        row.update(extras_fn(result))
    result.unpersist()
    # stable column order: canonical prefix, then sorted extras
    prefix = [
        "loadMillis", "computeMillis", "writeMillis", "nodes",
        "relationships", "iterations", "didConverge", "writeProperty",
    ]
    ordered = {k: row[k] for k in prefix}
    ordered.update({k: row[k] for k in sorted(row) if k not in prefix})
    return spark.createDataFrame([tuple(ordered.values())], list(ordered.keys()))
