"""Text analysis operators — language-ID, quality scoring, token stats,
document fingerprinting. All JVM-side built-ins (whole-stage codegen);
no Python in the hot path."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

STOPWORDS = ["the", "a"]


def token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_uniq_tokens) — whitespace tokenization."""
    toks = F.split(F.col(text_col), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq_tokens"),
    )


# GPT-2-style pre-tokenizer shape, restricted to constructs that behave
# identically in Java regex (Spark) and RE2 (DuckDB oracle): a run of
# letters, a run of digits, or a run of other non-space symbols, each with
# an optional leading space. No lookahead, no \p classes.
BPE_ISH_PATTERN = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def token_counts(
    docs: DataFrame, text_col: str = "text", pattern: str = BPE_ISH_PATTERN
) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens) — whitespace count plus a
    BPE-style pre-tokenizer count (`regexp_extract_all`, JVM-side): the
    per-document token-budget estimate an LLM-data pipeline bills by."""
    return docs.select(
        "doc_id",
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0))
        .cast("long")
        .alias("n_bpe_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, stop_ratio, avg_token_len) — length/stopword heuristics."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks).cast("long")
    stop_cnt = F.size(
        F.filter(toks, lambda x: x.isin(STOPWORDS))
    ).cast("long")
    text_len = F.length(F.col(text_col)).cast("long")
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.round(stop_cnt.cast("double") / n_tokens, 5).alias("stop_ratio"),
        F.round((text_len - (n_tokens - 1)).cast("double") / n_tokens, 5).alias(
            "avg_token_len"
        ),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang) — deterministic n-gram/stopword-ratio heuristic.

    A stand-in classifier with the real Spark plumbing; buckets by the
    stopword density of the text (synthetic corpora are English-ish).
    """
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks).cast("long")
    stop_cnt = F.size(F.filter(toks, lambda x: x.isin(STOPWORDS))).cast("long")
    r = stop_cnt.cast("double") / n_tokens
    return docs.select(
        "doc_id",
        F.when(r >= 0.09, "en_high")
        .when(r >= 0.05, "en_med")
        .otherwise("en_low")
        .alias("pred_lang"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp16) — 64-bit content fingerprint as 16 hex chars."""
    return docs.select(
        "doc_id", F.substring(F.md5(F.col(text_col)), 1, 16).alias("fp16")
    )
