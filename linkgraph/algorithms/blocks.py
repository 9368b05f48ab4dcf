"""Per-partition CSR blocks held in Arrow UDFs.

The Spark analogue of the reference's compressed adjacency pages
(`core/src/main/java/org/neo4j/graphalgo/core/huge/HugeAdjacencyList.java`,
`AdjacencyCompression.java`) and of PageRank's degree-partitioned
ComputeSteps (`algo/.../impl/pagerank/ComputeSteps.java`): edges are
hash-partitioned by ``src`` into B blocks; each block is ONE DataFrame row
holding numpy buffers

    src_ids   int64[n_src]   sorted unique sources in the block
    indptr    int64[n_src+1] CSR row pointers into the edge arrays
    wsum      float64[n_src] total out-weight W(u) per source (degree cache,
                             cf. impl/pagerank/DegreeComputer.java)
    dst_uniq  int64[n_dst]   unique targets touched by the block
    dst_code  int32[n_edge]  per-edge index into dst_uniq (pre-computed so the
                             per-superstep scatter is a single np.bincount)
    weights   float64[n_edge]

Packing arrays as BinaryType keeps each block a single Arrow cell — cheap to
cache, cheap to join against the per-superstep rank blocks. The scatter UDF
does a map-side combine (bincount per block) so each superstep's
``groupBy(dst).agg(sum)`` shuffles at most B rows per target — the built-in
answer to high-in-degree skew; explicit salting additionally covers the
pure-DataFrame strategy (pagerank.py).

Everything per-element is numpy (Arrow batches); Python loops only over
blocks/supersteps, never rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

EDGE_BLOCK_SCHEMA = (
    "part int, n_src long, n_edge long, src_ids binary, indptr binary, "
    "wsum binary, dst_uniq binary, dst_code binary, weights binary"
)

RANK_BLOCK_SCHEMA = "part int, ids binary, vals binary"


def _build_edge_block(pdf: pd.DataFrame) -> pd.DataFrame:
    part = int(pdf["part"].iloc[0])
    src = pdf["src"].to_numpy(np.int64)
    dst = pdf["dst"].to_numpy(np.int64)
    w = pdf["weight"].to_numpy(np.float64)
    order = np.argsort(src, kind="stable")
    src, dst, w = src[order], dst[order], w[order]
    src_ids, counts = np.unique(src, return_counts=True)
    indptr = np.concatenate(([0], np.cumsum(counts)))
    wsum = np.add.reduceat(w, indptr[:-1]) if len(src_ids) else np.empty(0)
    dst_uniq, dst_code = np.unique(dst, return_inverse=True)
    return pd.DataFrame(
        {
            "part": [part],
            "n_src": [len(src_ids)],
            "n_edge": [len(src)],
            "src_ids": [src_ids.tobytes()],
            "indptr": [indptr.astype(np.int64).tobytes()],
            "wsum": [wsum.astype(np.float64).tobytes()],
            "dst_uniq": [dst_uniq.tobytes()],
            "dst_code": [dst_code.astype(np.int32).tobytes()],
            "weights": [w.tobytes()],
        }
    )


def build_edge_blocks(edges: DataFrame, num_blocks: int) -> DataFrame:
    """edges(src,dst,weight) → B cached CSR block rows, partitioned by src."""
    e = edges.withColumn("part", F.pmod(F.col("src"), F.lit(num_blocks)).cast("int"))
    return e.groupBy("part").applyInPandas(_build_edge_block, schema=EDGE_BLOCK_SCHEMA)


def _pack_rank_block(pdf: pd.DataFrame) -> pd.DataFrame:
    part = int(pdf["part"].iloc[0])
    ids = pdf["id"].to_numpy(np.int64)
    vals = pdf["val"].to_numpy(np.float64)
    order = np.argsort(ids, kind="stable")
    return pd.DataFrame(
        {"part": [part], "ids": [ids[order].tobytes()], "vals": [vals[order].tobytes()]}
    )


def pack_rank_blocks(ranks: DataFrame, value_col: str, num_blocks: int) -> DataFrame:
    """ranks(id, <value_col>) → per-partition sorted (ids, vals) buffers."""
    r = ranks.select(
        F.col("id"),
        F.col(value_col).cast("double").alias("val"),
        F.pmod(F.col("id"), F.lit(num_blocks)).cast("int").alias("part"),
    )
    return r.groupBy("part").applyInPandas(_pack_rank_block, schema=RANK_BLOCK_SCHEMA)


def _scatter_batches(it: Iterator[pd.DataFrame], weighted: bool) -> Iterator[pd.DataFrame]:
    for pdf in it:
        for row in pdf.itertuples(index=False):
            src_ids = np.frombuffer(row.src_ids, np.int64)
            if len(src_ids) == 0:
                continue
            indptr = np.frombuffer(row.indptr, np.int64)
            wsum = np.frombuffer(row.wsum, np.float64)
            dst_uniq = np.frombuffer(row.dst_uniq, np.int64)
            dst_code = np.frombuffer(row.dst_code, np.int32)
            ids = np.frombuffer(row.ids, np.int64)
            vals = np.frombuffer(row.vals, np.float64)
            # rank lookup for this block's sources (ids are sorted)
            pos = np.searchsorted(ids, src_ids)
            # guard: sources missing from the rank vector contribute 0
            ok = (pos < len(ids)) & (ids[np.minimum(pos, len(ids) - 1)] == src_ids)
            r_src = np.where(ok, vals[np.minimum(pos, len(ids) - 1)], 0.0)
            per_src = np.divide(
                r_src, wsum, out=np.zeros_like(r_src), where=wsum != 0.0
            )
            counts = np.diff(indptr)
            per_edge = np.repeat(per_src, counts)
            if weighted:
                per_edge = per_edge * np.frombuffer(row.weights, np.float64)
            partial = np.bincount(dst_code, weights=per_edge, minlength=len(dst_uniq))
            yield pd.DataFrame({"dst": dst_uniq, "partial": partial})


def scatter_gather(
    edge_blocks: DataFrame, rank_blocks: DataFrame, weighted: bool
) -> DataFrame:
    """One superstep's contribution table: (dst, contrib=Σ rank(u)·w/W(u)).

    join-on-part (B small rows each side) → per-block bincount scatter
    (map-side combine) → global groupBy(dst).sum gather shuffle.
    """
    joined = edge_blocks.join(rank_blocks, "part")
    partials = joined.mapInPandas(
        lambda it: _scatter_batches(it, weighted), schema="dst long, partial double"
    )
    return partials.groupBy("dst").agg(F.sum("partial").alias("contrib"))
