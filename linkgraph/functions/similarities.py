"""Pairwise similarity scalar functions — `algo.similarity.*(list, list)`.

Reference: `algo/src/main/java/org/neo4j/graphalgo/SimilaritiesFunc.java`
(@UserFunction jaccard/cosine/pearson/overlap/euclideanDistance/
euclideanSimilarity over two lists).

Spark form: column expressions over array columns — JVM built-ins where the
math is a fold (cosine/euclidean), `array_intersect` for set measures, and
an Arrow-vectorized pandas UDF for Pearson (needs two passes). Usable in
any select; no per-row Python except the numpy-vectorized Pearson.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, functions as F
from pyspark.sql.types import DoubleType
from pyspark.sql.functions import pandas_udf


def jaccard_lists(a, b) -> Column:
    """|A∩B| / |A∪B| over array columns (set semantics)."""
    a, b = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(a, b)).cast("double")
    union = F.size(F.array_union(a, b)).cast("double")
    return F.when(union > 0, inter / union).otherwise(0.0)


def overlap_lists(a, b) -> Column:
    """|A∩B| / min(|A|,|B|)."""
    a, b = F.array_distinct(a), F.array_distinct(b)
    inter = F.size(F.array_intersect(a, b)).cast("double")
    mn = F.least(F.size(a), F.size(b)).cast("double")
    return F.when(mn > 0, inter / mn).otherwise(0.0)


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_lists(a, b) -> Column:
    na = F.sqrt(_dot(a, a))
    nb = F.sqrt(_dot(b, b))
    return F.when((na > 0) & (nb > 0), _dot(a, b) / (na * nb)).otherwise(0.0)


def euclidean_distance_lists(a, b) -> Column:
    sq = F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return F.sqrt(sq)


def euclidean_similarity_lists(a, b) -> Column:
    """Reference: 1 / (1 + d) squashing."""
    return 1.0 / (1.0 + euclidean_distance_lists(a, b))


@pandas_udf(DoubleType())
def pearson_lists(a: pd.Series, b: pd.Series) -> pd.Series:
    """Batch-vectorized Pearson over ragged list pairs: one concatenate +
    segment-reduce (np.add.reduceat) per Arrow batch, no per-row Python."""
    out = np.zeros(len(a))
    la = a.str.len().to_numpy()
    lb = b.str.len().to_numpy()
    ok = (la == lb) & (la > 0)
    if not ok.any():
        return pd.Series(out)
    counts = la[ok].astype(np.int64)
    va = np.concatenate([np.asarray(x, np.float64) for x in a[ok]])
    vb = np.concatenate([np.asarray(x, np.float64) for x in b[ok]])
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    ma = np.add.reduceat(va, offs) / counts
    mb = np.add.reduceat(vb, offs) / counts
    ca = va - np.repeat(ma, counts)
    cb = vb - np.repeat(mb, counts)
    cov = np.add.reduceat(ca * cb, offs)
    sa = np.sqrt(np.add.reduceat(ca * ca, offs))
    sb = np.sqrt(np.add.reduceat(cb * cb, offs))
    denom = sa * sb
    r = np.where(denom > 0, cov / np.maximum(denom, 1e-300), 0.0)
    out[ok] = r
    return pd.Series(out)


def one_hot_encoding(available, selected) -> Column:
    """`algo.ml.oneHotEncoding(available, selected)` → array<int> indicator.

    Reference: `algo/.../OneHotEncodingFunc.java`.
    """
    return F.transform(available, lambda x: F.array_contains(selected, x).cast("int"))


def is_finite(col) -> Column:
    """`algo.isFinite` — float guards (IsFiniteFunc.java)."""
    c = F.col(col) if isinstance(col, str) else col
    return (~F.isnan(c)) & (c != float("inf")) & (c != float("-inf")) & c.isNotNull()


def is_infinite(col) -> Column:
    """`algo.isInfinite` (IsFiniteFunc.java)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isNotNull() & ((c == float("inf")) | (c == float("-inf")))


def nan() -> Column:
    """`algo.NaN()` literal."""
    return F.lit(float("nan"))


def infinity() -> Column:
    """`algo.Infinity()` literal."""
    return F.lit(float("inf"))


def as_vector(
    df,
    item_col: str = "item",
    category_col: str = "category",
    weight_col: str = "weight",
    dense: bool = False,
):
    """`algo.similarity.asVector` — (item, category, weight) rows → per-item
    vector representation.

    Default: sparse (item, indices array<long>, weights array<double>) with
    indices = dense category ranks (the RLE-vector analogue). dense=True
    additionally expands to a C-dim array (only sane for small C).
    The sparse form feeds cosine_sparse/pearson_sparse/euclidean_sparse.
    """
    spark = df.sparkSession
    cats = df.select(F.col(category_col).alias("cat")).distinct()
    idx = spark.createDataFrame(
        cats.orderBy("cat").rdd.map(lambda r: r[0]).zipWithIndex().map(
            lambda t: (t[0], int(t[1]))
        ),
        ["cat", "cat_idx"],
    )
    rows = (
        df.select(
            F.col(item_col).alias("item"),
            F.col(category_col).alias("cat"),
            F.col(weight_col).cast("double").alias("w"),
        )
        .groupBy("item", "cat")
        .agg(F.sum("w").alias("w"))
        .join(idx, "cat")
    )
    out = rows.groupBy("item").agg(
        F.sort_array(F.collect_list(F.struct("cat_idx", "w"))).alias("_s")
    ).select(
        "item",
        F.transform("_s", lambda s: s["cat_idx"].cast("long")).alias("indices"),
        F.transform("_s", lambda s: s["w"]).alias("weights"),
    )
    if dense:
        c = cats.count()
        dense_col = F.transform(
            F.sequence(F.lit(0), F.lit(int(c) - 1)),
            lambda i: F.coalesce(
                F.element_at(
                    F.map_from_arrays("indices", "weights"), i.cast("long")
                ),
                F.lit(0.0),
            ),
        )
        out = out.withColumn("vector", dense_col)
    return out
