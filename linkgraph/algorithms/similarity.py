"""Similarity procedures — `algo.similarity.jaccard/overlap/cosine/...`.

Reference: `algo/src/main/java/org/neo4j/graphalgo/similarity/{JaccardProc,
OverlapProc,CosineProc,SimilarityProc,TopKConsumer}.java`. There: all-pairs
loops over RLE-packed vectors with a bounded top-k heap per item. Here:

* set similarities (jaccard/overlap) use an **inverted-index equi-join** on
  the shared category — the scale path; cost is Σ_cat df(cat)², no
  cross-join ever materializes all pairs.
* top-k per item = window `row_number() ≤ k` ordered by (similarity desc,
  id asc) — the deterministic analogue of TopKConsumer's heap.
* `similarityCutoff` / `degreeCutoff` / global `top` map to filters/limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _item_categories(df: DataFrame, item_col: str, category_col: str) -> DataFrame:
    return df.select(
        F.col(item_col).alias("item"), F.col(category_col).alias("cat")
    ).distinct()


def jaccard(
    df: DataFrame,
    item_col: str,
    category_col: str,
    top_k: int | None = None,
    similarity_cutoff: float | None = None,
    degree_cutoff: int | None = None,
    top: int | None = None,
) -> DataFrame:
    """→ (a, b, similarity): |A∩B| / |A∪B| over item category-sets."""
    return _set_similarity(
        df, item_col, category_col, "jaccard", top_k, similarity_cutoff, degree_cutoff, top
    )


def overlap(
    df: DataFrame,
    item_col: str,
    category_col: str,
    top_k: int | None = None,
    similarity_cutoff: float | None = None,
    degree_cutoff: int | None = None,
    top: int | None = None,
) -> DataFrame:
    """→ (a, b, similarity): |A∩B| / min(|A|,|B|)."""
    return _set_similarity(
        df, item_col, category_col, "overlap", top_k, similarity_cutoff, degree_cutoff, top
    )


def _set_similarity(
    df: DataFrame,
    item_col: str,
    category_col: str,
    kind: str,
    top_k: int | None,
    similarity_cutoff: float | None,
    degree_cutoff: int | None,
    top: int | None,
) -> DataFrame:
    cats = _item_categories(df, item_col, category_col).persist()
    deg = cats.groupBy("item").agg(F.count(F.lit(1)).alias("d"))
    if degree_cutoff is not None:
        deg = deg.filter(F.col("d") >= degree_cutoff)
        cats = cats.join(deg.select("item"), "item")
    a = cats.select(F.col("item").alias("a"), "cat")
    b = cats.select(F.col("item").alias("b"), "cat")
    inter = (
        a.join(b, "cat")
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    da = deg.select(F.col("item").alias("a"), F.col("d").alias("da"))
    db = deg.select(F.col("item").alias("b"), F.col("d").alias("db"))
    joined = inter.join(da, "a").join(db, "b")
    if kind == "jaccard":
        sim = F.col("i").cast("double") / (F.col("da") + F.col("db") - F.col("i"))
    else:  # overlap
        sim = F.col("i").cast("double") / F.least("da", "db")
    scored = joined.select("a", "b", sim.alias("similarity"))
    if similarity_cutoff is not None:
        scored = scored.filter(F.col("similarity") >= similarity_cutoff)
    if top_k is not None:
        win = Window.partitionBy("a").orderBy(F.desc("similarity"), F.asc("b"))
        scored = (
            scored.withColumn("_rn", F.row_number().over(win))
            .filter(F.col("_rn") <= top_k)
            .drop("_rn")
        )
    if top is not None:
        scored = scored.orderBy(F.desc("similarity"), F.asc("a"), F.asc("b")).limit(top)
    return scored.select("a", "b", F.round("similarity", 5).alias("similarity"))
