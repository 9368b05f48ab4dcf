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


# PII patterns restricted to the Java-regex ∩ RE2 intersection (no
# lookaround, no \b, no \p classes) so the DuckDB oracle counts matches
# identically. Both engines use leftmost non-overlapping match semantics.
PII_PATTERNS = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+",
    "ipv4": "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
    "phone": "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
}


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_emails, n_ipv4, n_phones, has_pii) — per-document counts
    of email / IPv4 / E.164-ish phone matches, the redaction pre-pass a
    training-data pipeline runs before anything else.

    Pure `regexp_count` over the row — whole-stage codegen, zero shuffle,
    embarrassingly parallel at any corpus size. Ref (pipeline-op family):
    standard C4/RefinedWeb-style PII filtering stage.
    """
    cnt = {
        k: F.regexp_count(F.col(text_col), F.lit(p)).cast("long")
        for k, p in PII_PATTERNS.items()
    }
    return docs.select(
        "doc_id",
        cnt["email"].alias("n_emails"),
        cnt["ipv4"].alias("n_ipv4"),
        cnt["phone"].alias("n_phones"),
        (cnt["email"] + cnt["ipv4"] + cnt["phone"] > 0).alias("has_pii"),
    )


def ngram_repetition(docs: DataFrame, n: int = 2, text_col: str = "text") -> DataFrame:
    """(doc_id, n_grams, n_uniq_grams, dup_ratio) — within-document word
    n-gram repetition, the Rae et al. (Gopher) style boilerplate/loop
    filter signal.

    Grams are built row-locally with higher-order array functions
    (`sequence` → `transform` → `slice` → `concat_ws`): zero shuffle, all
    JVM codegen — the only shape that survives 100 TB (no explode, no
    group-by; gram lists never leave the row).
    """
    toks = F.split(F.col(text_col), " ")
    # sequence(a, b) is DESCENDING when b < a, so guard short docs first
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams).cast("long")
    uniq = F.size(F.array_distinct(grams)).cast("long")
    return docs.select(
        "doc_id",
        total.alias("n_grams"),
        uniq.alias("n_uniq_grams"),
        F.when(total > 0, F.round(1.0 - uniq.cast("double") / total, 5))
        .otherwise(F.lit(0.0))
        .alias("dup_ratio"),
    )


def benchmark_contamination(
    docs: DataFrame,
    bench_docs: DataFrame,
    n: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_uniq_grams, n_contaminated, contamination_ratio) — for
    each candidate training document, how many of its distinct word
    n-grams also occur anywhere in the benchmark/eval corpus — the
    decontamination check every LLM data pipeline runs (GPT-3 appendix C /
    PaLM style n-gram overlap).

    Scale shape: the benchmark side (eval sets are MBs, not TBs) is
    reduced to DISTINCT grams and broadcast; the corpus side explodes
    per-doc distinct grams and left-joins the broadcast set — one narrow
    pass over the corpus, no corpus×corpus shuffle. The join key is the
    raw gram string here for oracle parity; at 100 TB hash it first
    (xxhash64) to shrink the broadcast and the shuffle rows.
    """
    from pyspark.sql.functions import broadcast

    def gram_col():
        toks = F.split(F.col(text_col), " ")
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    doc_grams = docs.select(
        "doc_id", F.explode(F.array_distinct(gram_col())).alias("gram")
    )
    bench_grams = (
        bench_docs.select(F.explode(F.array_distinct(gram_col())).alias("gram"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    per_doc = (
        doc_grams.join(broadcast(bench_grams), "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_uniq_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_uniq_grams", F.lit(0)).cast("long").alias("n_uniq_grams"),
        F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
        F.when(
            F.coalesce("n_uniq_grams", F.lit(0)) > 0,
            F.round(
                F.col("n_contaminated").cast("double") / F.col("n_uniq_grams"), 5
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("contamination_ratio"),
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str = "source",
    per_stratum: int = 10,
    key_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, <strata_col>, sample_rank) — deterministic top-``k`` sample
    per stratum, ordered by a content-independent pseudo-random key
    (md5 of the id): the data-mixing primitive for per-source quotas.

    One hash-partitioned window per stratum — the sort is per-group, not
    global. With few giant strata (web crawl domains) the per-stratum sort
    is the bottleneck; the documented at-scale variant is a two-phase
    threshold sample (approx quantile of the hash per stratum → filter),
    which this function's deterministic hash key makes drop-in.
    """
    from pyspark.sql import Window

    rnd = F.md5(F.col(key_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(rnd.asc(), F.col(key_col).asc())
    return (
        docs.select(key_col, strata_col, F.row_number().over(w).alias("sample_rank"))
        .filter(F.col("sample_rank") <= per_stratum)
    )
