"""Token co-occurrence statistics: document-level PMI.

Pointwise mutual information over within-document token pairs (Church &
Hanks 1990) — the standard collocation/association mining pass an LLM
data pipeline runs to build phrase lists and to audit topical skew.
Document-level counting: n_ab = documents containing BOTH tokens,
n_a = documents containing a, N = all documents,
PMI(a,b) = ln(n_ab · N / (n_a · n_b)).

Scale shape: one distinct (doc, token) projection; a df-band filter
[min_df, max_df] both de-noises (rare pairs have garbage PMI) and
BOUNDS the per-document self-join exactly the way the df cutoff bounds
the Jaccard pair stage in dedup.py — the join fan-out is
Σ_doc (tokens-in-band choose 2), and the hot stopword tail is excluded
by max_df. All built-ins (split/explode/groupBy/join/ln); the global
top-k is a TakeOrderedAndProject, not a single-partition window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pmi_topk(
    docs: DataFrame,
    k: int = 100,
    min_df: int = 5,
    max_df: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """→ (tok_a, tok_b, n_ab, n_a, n_b, pmi) — the k strongest
    document-level collocations among tokens with df in [min_df, max_df],
    ordered by (pmi desc, tok_a, tok_b) with pmi rounded to 5 digits so
    the ordering (and any oracle comparison) is float-stable."""
    n_docs = docs.count()
    dtok = docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.col("tok") != "").distinct()
    df_counts = dtok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    band = df_counts.filter(F.col("df") >= min_df)
    if max_df is not None:
        band = band.filter(F.col("df") <= max_df)
    dt = dtok.join(band, "tok").select("doc_id", "tok", "df")
    a = dt.select("doc_id", F.col("tok").alias("tok_a"), F.col("df").alias("n_a"))
    b = dt.select("doc_id", F.col("tok").alias("tok_b"), F.col("df").alias("n_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    out = pairs.select(
        "tok_a",
        "tok_b",
        F.col("n_ab").cast("long").alias("n_ab"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(
            F.log(
                F.col("n_ab").cast("double")
                * F.lit(float(n_docs))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ),
            5,
        ).alias("pmi"),
    )
    return out.orderBy(F.desc("pmi"), "tok_a", "tok_b").limit(k)
