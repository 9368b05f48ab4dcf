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


@pandas_udf("double")
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
