"""Substring-level (span) duplicate detection.

Document-level dedup misses the dominant duplication mode in web corpora:
long spans (boilerplate paragraphs, licence blocks, quoted posts) repeated
inside otherwise-distinct pages. Lee et al., "Deduplicating Training Data
Makes Language Models Better" (ACL 2022) showed removing duplicated ~50-token
spans beats whole-document dedup. The exact suffix-array construction they
use is single-machine; the standard distributed reformulation — and the one
implemented here — is fixed-width token-window hashing: every w-token window
is a key, a window key seen in ≥2 distinct documents marks a duplicated span.

Scale shape: windows are generated JVM-side (``sequence`` + ``transform`` +
``slice`` inside whole-stage codegen — no Python, no explode-then-window),
keyed by ``xxhash64`` so the shuffle carries an 8-byte key instead of the
span text, and aggregated with map-side partial ``count(distinct)`` collapse.
Cost is O(total tokens) rows through one shuffle — linear in corpus size,
no pairwise term anywhere (contrast the df² inverted-index join in
dedup.token_jaccard_pairs). The per-doc fraction pass is a second broadcast-
able semi-join against the (small) duplicated-key set at realistic w; at
adversarial duplication rates it degrades to a shuffle join, never a
cross product.

Reference anchor: the reference engine has no substring dedup (it is a graph
library); this operator family comes from the LLM-pipeline mandate. Window
hashing follows Broder's shingling (as in dedup.py) with exact — not
sketched — keys, so recall is 1 at the chosen width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _window_grams_arr(toks, width: int):
    """array<string> of all ``width``-token windows from a MATERIALIZED
    token-array column. Documents shorter than ``width`` tokens yield an
    empty array (no partial windows — matches the SQL oracle). Callers
    stage ``split(text, ' ')`` in its own projection first: the transform
    lambda runs interpreted with no CSE, so an inline split would be
    re-evaluated once per window (r6; same fix as dsir._grams_arr)."""
    n_win = F.size(toks) - width + 1
    return F.when(n_win >= 1, F.transform(
        F.sequence(F.lit(1), n_win),
        lambda i: F.concat_ws(" ", F.slice(toks, i, width)),
    )).otherwise(F.array().cast("array<string>"))


def duplicated_spans_topk(
    docs: DataFrame,
    width: int = 8,
    k: int = 100,
    min_docs: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """→ (span, n_docs, n_occurrences) — the ``k`` most widely duplicated
    ``width``-token spans (distinct-document count desc, then span asc).

    ``n_docs`` counts distinct documents containing the span; ``n_occurrences``
    counts every (possibly overlapping) window occurrence. The global top-k is
    a TakeOrderedAndProject, not a single-partition sort.
    """
    wins = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("_toks")
    ).select("doc_id", F.explode(_window_grams_arr(F.col("_toks"), width)).alias("span"))
    agg = (
        wins.groupBy("span")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    return agg.orderBy(F.desc("n_docs"), F.asc("span")).limit(k).select(
        "span",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
    )


def span_dup_fraction(
    docs: DataFrame,
    width: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, n_windows, n_dup_windows, dup_fraction) per document —
    the Lee-et-al. span-duplication signal a quality gate thresholds on.

    ``dup_fraction`` is the share of the document's ``width``-token windows
    whose window also appears in ≥ ``min_docs`` distinct documents (itself
    included). Documents with fewer than ``width`` tokens report 0 windows
    and fraction 0.0.

    Two linear passes over the window stream: a distinct-doc count per
    window HASH (8-byte xxhash64 keys — the span text never shuffles), then
    a semi-join of each doc's window hashes against the duplicated-key set.
    """
    wins = (
        docs.select("doc_id", F.split(F.col(text_col), " ").alias("_toks"))
        .select(
            "doc_id", F.explode(_window_grams_arr(F.col("_toks"), width)).alias("span")
        )
        .select("doc_id", F.xxhash64("span").alias("h"))
    )
    dup_keys = (
        wins.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= min_docs)
        .select("h")
    )
    per_doc = (
        wins.join(dup_keys.withColumn("is_dup", F.lit(1)), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(F.coalesce("is_dup", F.lit(0))).alias("n_dup_windows"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.round(
                F.when(
                    F.coalesce("n_windows", F.lit(0)) > 0,
                    F.coalesce("n_dup_windows", F.lit(0)).cast("double")
                    / F.col("n_windows"),
                ).otherwise(F.lit(0.0)),
                5,
            ).alias("dup_fraction"),
        )
    )
