"""Corpus-level vocabulary statistics and data-selection scoring.

Two audits every LLM-corpus build runs before training:

* :func:`vocab_stats` — one-row corpus health report: token/type counts,
  type-token ratio, hapax share, and the Zipf slope (the log-log
  rank-frequency regression coefficient; natural text sits near −1,
  boilerplate-heavy or synthetic corpora drift far from it).
* :func:`moore_lewis_scores` — cross-entropy-difference data selection
  (Moore & Lewis, ACL 2010): score every pool document by
  mean_token[ ln p_in(tok) − ln p_pool(tok) ]; the top of the ranking is
  the pool data that looks most like the in-domain sample. The workhorse
  behind "select web data that looks like Wikipedia" — and the unigram
  ancestor of DSIR-style importance resampling.

Scale shape: both are linear token scans — explode → groupBy(token) →
broadcast-join the (vocabulary-sized) LM tables back onto the token
stream. Vocabulary tables are tiny relative to the corpus (≤ millions of
rows at 100 TB), so Spark's AQE broadcasts them; nothing pairwise, nothing
driver-side. Zipf's slope is computed with closed-form least squares
(covariance / variance aggregates), not a fit loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _tokens(docs: DataFrame, text_col: str) -> DataFrame:
    return docs.select(
        "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.col("tok") != "")


def vocab_stats(
    docs: DataFrame, text_col: str = "text", zipf_top: int = 1000
) -> DataFrame:
    """→ one row (n_tokens, n_types, type_token_ratio, n_hapax,
    hapax_share, zipf_slope).

    ``zipf_slope`` is the OLS slope of ln(freq) on ln(rank) over the
    ``zipf_top`` most frequent types (ties broken by token so the ranking —
    and the oracle comparison — is deterministic).
    """
    freqs = _tokens(docs, text_col).groupBy("tok").agg(
        F.count(F.lit(1)).alias("freq")
    )
    totals = freqs.agg(
        F.sum("freq").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("freq") == 1, 1).otherwise(0)).alias("n_hapax"),
    )
    # TakeOrderedAndProject bounds the candidate set FIRST; the unpartitioned
    # rank window then runs over ≤ zipf_top rows, never the full vocabulary
    top = freqs.orderBy(F.desc("freq"), F.asc("tok")).limit(zipf_top)
    ranked = top.select(
        F.log(
            F.row_number()
            .over(Window.orderBy(F.desc("freq"), F.asc("tok")))
            .cast("double")
        ).alias("lr"),
        F.log(F.col("freq").cast("double")).alias("lf"),
    )
    slope = ranked.agg(
        (F.covar_samp("lr", "lf") / F.var_samp("lr")).alias("zipf_slope")
    )
    return totals.crossJoin(slope).select(
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        F.round(F.col("n_types") / F.col("n_tokens"), 5).alias("type_token_ratio"),
        F.col("n_hapax").cast("long").alias("n_hapax"),
        F.round(F.col("n_hapax") / F.col("n_types"), 5).alias("hapax_share"),
        F.round("zipf_slope", 5).alias("zipf_slope"),
    )


def moore_lewis_scores(
    docs: DataFrame,
    in_domain_source: str,
    k: int = 200,
    alpha: float = 0.5,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """→ (doc_id, n_toks, score) — the ``k`` pool documents ranked most
    in-domain by unigram cross-entropy difference.

    In-domain LM: documents with ``source == in_domain_source``; pool LM:
    the whole corpus. Both are add-``alpha``-smoothed unigram models over
    the POOL vocabulary (so every pool token has finite in-domain
    probability). score(d) = mean over d's tokens of
    ln p_in(tok) − ln p_pool(tok); ranking is (score desc, doc_id asc) with
    the score rounded to 5 digits FIRST so the cutoff membership (and any
    oracle comparison) is float-stable. Selection itself excludes in-domain
    documents — they are the seed, not candidates.
    """
    toks = _tokens(docs, text_col)
    in_ids = docs.filter(F.col(source_col) == in_domain_source).select("doc_id")
    pool_freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("pf"))
    in_freq = (
        toks.join(F.broadcast(in_ids), "doc_id")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("inf_"))
    )
    vocab = pool_freq.join(in_freq, "tok", "left").na.fill({"inf_": 0})
    sizes = vocab.agg(
        F.sum("pf").alias("pn"),
        F.sum("inf_").alias("inn"),
        F.count(F.lit(1)).alias("v"),
    )
    lm = vocab.crossJoin(F.broadcast(sizes)).select(
        "tok",
        (
            F.log((F.col("inf_") + alpha) / (F.col("inn") + alpha * F.col("v")))
            - F.log((F.col("pf") + alpha) / (F.col("pn") + alpha * F.col("v")))
        ).alias("llr"),
    )
    scored = (
        toks.join(lm, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(F.avg("llr"), 5).alias("score"),
        )
        .join(F.broadcast(in_ids), "doc_id", "left_anti")
    )
    return (
        scored.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", F.col("n_toks").cast("long").alias("n_toks"), "score")
    )
