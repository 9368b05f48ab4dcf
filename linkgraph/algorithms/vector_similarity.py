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
    max_broadcast_bytes: int = 2 << 30,
) -> DataFrame:
    # Guard on the broadcast's actual SIZE (rows × dim × 8 bytes), not row
    # count alone — 200k rows of 2048-dim float64 is already ~3.3 GB. dim =
    # MAX vector size across rows (one agg; NULL-safe, conservative for
    # ragged inputs — the first row alone could underestimate 256×).
    agg = items.agg(
        F.count(F.lit(1)).alias("n"), F.max(F.size(vector_col)).alias("dim")
    ).first()
    n_items = int(agg["n"] or 0)
    dim = int(agg["dim"] or 0)
    est_bytes = n_items * max(dim, 1) * 8
    if est_bytes > max_broadcast_bytes:
        raise ValueError(
            f"dense vector-similarity broadcasts the whole item matrix "
            f"({n_items} rows × {dim} dims ≈ {est_bytes / (1 << 30):.1f} GiB "
            f"> {max_broadcast_bytes / (1 << 30):.1f} GiB); use "
            f"cosine_sparse/pearson_sparse/euclidean_sparse (inverted-index, "
            f"no collect) or LSH-bucket first (pipeline.dedup/ann)"
        )
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
           top: int | None = None, max_broadcast_bytes: int = 2 << 30) -> DataFrame:
    return _pairwise(items, "cosine", top_k, similarity_cutoff, top, item_col, vector_col, max_broadcast_bytes)


def pearson(items: DataFrame, item_col: str = "item", vector_col: str = "weights",
            top_k: int | None = None, similarity_cutoff: float | None = None,
            top: int | None = None, max_broadcast_bytes: int = 2 << 30) -> DataFrame:
    return _pairwise(items, "pearson", top_k, similarity_cutoff, top, item_col, vector_col, max_broadcast_bytes)


def euclidean(items: DataFrame, item_col: str = "item", vector_col: str = "weights",
              top_k: int | None = None, similarity_cutoff: float | None = None,
              top: int | None = None, max_broadcast_bytes: int = 2 << 30) -> DataFrame:
    """Euclidean DISTANCE pairs (smaller = more similar), as in the reference."""
    return _pairwise(items, "euclidean", top_k, similarity_cutoff, top, item_col, vector_col, max_broadcast_bytes)


# ---------------------------------------------------------------- sparse path
def _sparse_stats(df: DataFrame, item_col: str, category_col: str, weight_col: str):
    """(rows, per-item stats) for the inverted-index kernels.

    rows: (item, cat, w) deduped; stats: (item, s=Σw, q=Σw², nnz)."""
    rows = (
        df.select(
            F.col(item_col).alias("item"),
            F.col(category_col).alias("cat"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .groupBy("item", "cat")
        .agg(F.sum("w").alias("w"))
    )
    stats = rows.groupBy("item").agg(
        F.sum("w").alias("s"),
        F.sum(F.col("w") * F.col("w")).alias("q"),
        F.count(F.lit(1)).alias("nnz"),
    )
    return rows, stats


def _sparse_pairwise(
    df: DataFrame,
    metric: str,
    item_col: str,
    category_col: str,
    weight_col: str,
    top_k: int | None,
    similarity_cutoff: float | None,
    top: int | None,
) -> DataFrame:
    """Inverted-index (no broadcast, no collect) sparse similarity.

    The pair space is generated by an equi-join on the shared category —
    cost Σ_cat df(cat)², the 100 TB-safe shape (cf. SimilarityProc's
    all-pairs loops, which assume one machine). Missing categories are
    treated as weight 0 over the GLOBAL category universe C, so cosine /
    pearson / euclidean match the dense semantics exactly for pairs that
    share ≥ 1 category; pairs sharing none are omitted (their cosine is 0;
    euclidean/pearson callers needing them should use the dense path).
    """
    rows, stats = _sparse_stats(df, item_col, category_col, weight_col)
    rows = rows.persist()
    n_cats = rows.select("cat").distinct().count()
    a = rows.select(F.col("item").alias("a"), "cat", F.col("w").alias("wa"))
    b = rows.select(F.col("item").alias("b"), "cat", F.col("w").alias("wb"))
    dots = (
        a.join(b, "cat")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    sa = stats.select(
        F.col("item").alias("a"), F.col("s").alias("s_a"), F.col("q").alias("q_a")
    )
    sb = stats.select(
        F.col("item").alias("b"), F.col("s").alias("s_b"), F.col("q").alias("q_b")
    )
    j = dots.join(sa, "a").join(sb, "b")
    if metric == "cosine":
        sim = F.col("dot") / F.greatest(
            F.sqrt(F.col("q_a")) * F.sqrt(F.col("q_b")), F.lit(1e-300)
        )
    elif metric == "pearson":
        # centered over the global C-dim space from sparse aggregates:
        # cov = dot − (s_a·s_b)/C ; var_i = q_i − s_i²/C
        c = float(max(n_cats, 1))
        cov = F.col("dot") - F.col("s_a") * F.col("s_b") / F.lit(c)
        va = F.col("q_a") - F.col("s_a") * F.col("s_a") / F.lit(c)
        vb = F.col("q_b") - F.col("s_b") * F.col("s_b") / F.lit(c)
        sim = cov / F.greatest(F.sqrt(va) * F.sqrt(vb), F.lit(1e-300))
    else:  # euclidean distance
        sim = F.sqrt(
            F.greatest(F.col("q_a") + F.col("q_b") - 2.0 * F.col("dot"), F.lit(0.0))
        )
    scored = j.select("a", "b", sim.alias("similarity"))
    asc = metric == "euclidean"
    if similarity_cutoff is not None:
        scored = scored.filter(
            F.col("similarity") <= similarity_cutoff
            if asc
            else F.col("similarity") >= similarity_cutoff
        )
    order = F.asc("similarity") if asc else F.desc("similarity")
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


def cosine_sparse(df: DataFrame, item_col: str = "item", category_col: str = "category",
                  weight_col: str = "weight", top_k: int | None = None,
                  similarity_cutoff: float | None = None, top: int | None = None) -> DataFrame:
    """`algo.similarity.cosine` over sparse (item, category, weight) rows —
    the asVector input path, inverted-index instead of collect+broadcast."""
    return _sparse_pairwise(df, "cosine", item_col, category_col, weight_col,
                            top_k, similarity_cutoff, top)


def pearson_sparse(df: DataFrame, item_col: str = "item", category_col: str = "category",
                   weight_col: str = "weight", top_k: int | None = None,
                   similarity_cutoff: float | None = None, top: int | None = None) -> DataFrame:
    return _sparse_pairwise(df, "pearson", item_col, category_col, weight_col,
                            top_k, similarity_cutoff, top)


def euclidean_sparse(df: DataFrame, item_col: str = "item", category_col: str = "category",
                     weight_col: str = "weight", top_k: int | None = None,
                     similarity_cutoff: float | None = None, top: int | None = None) -> DataFrame:
    return _sparse_pairwise(df, "euclidean", item_col, category_col, weight_col,
                            top_k, similarity_cutoff, top)


# ------------------------------------------------------------- write results
def similarity_summary(pairs: DataFrame, sim_col: str = "similarity") -> DataFrame:
    """The reference's SimilarityProc writeResult row: nodes, pair count and
    score percentiles (SimilaritySummaryResult / HdrHistogram analogue)."""
    items = pairs.select(F.col("a").alias("i")).unionByName(
        pairs.select(F.col("b").alias("i"))
    )
    n_nodes = items.distinct().count()
    return pairs.agg(
        F.lit(n_nodes).cast("long").alias("nodes"),
        F.count(F.lit(1)).alias("similarityPairs"),
        F.min(sim_col).alias("min"),
        F.max(sim_col).alias("max"),
        F.avg(sim_col).alias("mean"),
        F.expr(
            f"percentile_approx({sim_col}, array(0.25, 0.5, 0.75, 0.9, 0.95, 0.99, 0.999))"
        ).alias("percentiles"),
    )


def write_similar_relationships(
    pairs: DataFrame,
    path: str,
    sim_col: str = "similarity",
    rel_type: str = "SIMILAR",
) -> DataFrame:
    """SimilarityExporter analogue: persist (a)-[:rel_type {score}]->(b) rows
    as parquet and return the summary row. ``rel_type`` mirrors the
    reference's ``writeRelationshipType`` config."""
    pairs.select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        F.lit(rel_type).alias("rel_type"),
        F.col(sim_col).alias("score"),
    ).write.mode("overwrite").parquet(path)
    return similarity_summary(pairs, sim_col)
