"""Weighted-vector similarity procedures — `algo.similarity.cosine/pearson/
euclidean(.stream)`.

Reference: `algo/src/main/java/org/neo4j/graphalgo/similarity/{CosineProc,
PearsonProc,EuclideanProc}.java` — all-pairs over per-item weight vectors
(RLE-packed in the reference), bounded top-k heap, cutoffs.

Spark form: block the pair space with a broadcast of the (small) right
side and evaluate the kernels as numpy matrix ops inside one Arrow UDF per
left block — vectorized all the way; `topK`/`top`/`similarityCutoff` as in
SimilarityProc. For corpora too large to broadcast, pre-bucket with LSH
(pipeline.dedup / pipeline.ann) and feed buckets here.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F


def _pairwise(
    items: DataFrame,
    metric: str,
    top_k: int | None,
    similarity_cutoff: float | None,
    top: int | None,
    item_col: str,
    vector_col: str,
) -> DataFrame:
    rows = items.select(item_col, vector_col).collect()
    ids = np.array([r[item_col] for r in rows], dtype=np.int64)
    mat = np.array([list(map(float, r[vector_col])) for r in rows], dtype=np.float64)
    spark = items.sparkSession
    bc_ids = spark.sparkContext.broadcast(ids)
    bc_mat = spark.sparkContext.broadcast(mat)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, m = bc_ids.value, bc_mat.value
        if metric == "cosine":
            norms = np.linalg.norm(m, axis=1)
        elif metric == "pearson":
            centered = m - m.mean(axis=1, keepdims=True)
            cnorms = np.linalg.norm(centered, axis=1)
        for pdf in batches:
            idx = pdf["idx"].to_numpy(np.int64)
            if metric == "cosine":
                sims = (m[idx] @ m.T) / np.maximum(
                    norms[idx][:, None] * norms[None, :], 1e-300
                )
            elif metric == "pearson":
                sims = (centered[idx] @ centered.T) / np.maximum(
                    cnorms[idx][:, None] * cnorms[None, :], 1e-300
                )
            else:  # euclidean distance
                d2 = (
                    (m[idx] ** 2).sum(1)[:, None]
                    + (m**2).sum(1)[None, :]
                    - 2.0 * (m[idx] @ m.T)
                )
                sims = np.sqrt(np.maximum(d2, 0.0))
            a = np.repeat(all_ids[idx], len(all_ids))
            b = np.tile(all_ids, len(idx))
            yield pd.DataFrame(
                {"a": a, "b": b, "similarity": sims.reshape(-1)}
            )

    n = len(ids)
    b_par = spark.sparkContext.defaultParallelism
    left = spark.range(n).select(F.col("id").cast("long").alias("idx")).repartition(b_par)
    scored = left.mapInPandas(kernel, schema="a long, b long, similarity double").filter(
        F.col("a") != F.col("b")
    )
    asc = metric == "euclidean"  # distance: smaller is better
    if similarity_cutoff is not None:
        scored = scored.filter(
            F.col("similarity") <= similarity_cutoff
            if asc
            else F.col("similarity") >= similarity_cutoff
        )
    order = (F.asc("similarity") if asc else F.desc("similarity"))
    if top_k is not None:
        win = Window.partitionBy("a").orderBy(order, F.asc("b"))
        scored = (
            scored.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") <= top_k)
            .drop("_rn")
        )
    if top is not None:
        scored = scored.orderBy(order, F.asc("a"), F.asc("b")).limit(top)
    return scored.select("a", "b", F.round("similarity", 6).alias("similarity"))


def cosine(items: DataFrame, item_col: str = "item", vector_col: str = "weights",
           top_k: int | None = None, similarity_cutoff: float | None = None,
           top: int | None = None) -> DataFrame:
    return _pairwise(items, "cosine", top_k, similarity_cutoff, top, item_col, vector_col)


def pearson(items: DataFrame, item_col: str = "item", vector_col: str = "weights",
            top_k: int | None = None, similarity_cutoff: float | None = None,
            top: int | None = None) -> DataFrame:
    return _pairwise(items, "pearson", top_k, similarity_cutoff, top, item_col, vector_col)


def euclidean(items: DataFrame, item_col: str = "item", vector_col: str = "weights",
              top_k: int | None = None, similarity_cutoff: float | None = None,
              top: int | None = None) -> DataFrame:
    """Euclidean DISTANCE pairs (smaller = more similar), as in the reference."""
    return _pairwise(items, "euclidean", top_k, similarity_cutoff, top, item_col, vector_col)
