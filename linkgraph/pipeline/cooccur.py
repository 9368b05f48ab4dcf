"""Token co-occurrence statistics: document-level PMI and positional
skip-gram pair mining.

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


def skipgram_pairs(
    docs: DataFrame,
    window: int = 3,
    k: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """→ (w_left, w_right, cnt) — corpus-wide counts of ordered token
    pairs at positional distance ≤ `window` (word2vec skip-gram training
    pairs, Mikolov et al. 2013), top-k by count with a (cnt desc, w_left,
    w_right) total order.

    Scale shape: pair generation is a PURE per-row array expansion —
    nested `transform` over the token array emits each position's forward
    window with zero joins and zero shuffle (contrast the positional
    self-join a naive formulation needs, which shuffles the exploded
    token table twice). The only shuffle is the final (w_left, w_right)
    count, which map-side combines; the top-k is TakeOrderedAndProject,
    not a single-partition window. A document with T tokens emits ≤ T·w
    pairs, so executor memory per row is bounded by the longest document,
    not the corpus.
    """
    # stage split() into its own projection: HOFs run interpreted without
    # common-subexpression elimination, so referencing the raw split
    # inside the nested transform re-tokenized the document once per
    # POSITION (r6; same fix as dsir._grams_arr)
    toks = F.col("_toks")
    pairs = F.flatten(
        F.transform(
            toks,
            lambda x, i: F.transform(
                F.slice(toks, i + F.lit(2), F.lit(window)),
                lambda y: F.struct(x.alias("w_left"), y.alias("w_right")),
            ),
        )
    )
    counts = (
        docs.select(F.split(F.col(text_col), " ").alias("_toks"))
        .select(F.explode(pairs).alias("p"))
        .select("p.w_left", "p.w_right")
        .where((F.col("w_left") != "") & (F.col("w_right") != ""))
        .groupBy("w_left", "w_right")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return counts.orderBy(F.desc("cnt"), "w_left", "w_right").limit(k)


def walk_skipgram_pairs(
    walks: DataFrame,
    window: int = 2,
    k: int = 100,
    path_col: str = "path",
) -> DataFrame:
    """→ (u, v, cnt) — DeepWalk/node2vec training pairs (Perozzi et al.
    KDD'14): treat each random-walk path as a sentence and emit forward
    (center, context) node pairs at distance ≤ `window`, counted
    corpus-wide, top-k by (cnt desc, u, v).

    Same zero-join nested-transform expansion as `skipgram_pairs`, over
    long arrays; `-1` entries (a walk that died at a dangling node pads
    with -1) never pair. This is the embedding-training corpus exporter —
    walks come from `algorithms.randomwalk.random_walks`, pairs feed a
    skip-gram trainer."""
    arr = F.col(path_col)
    pairs = F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), F.lit(window)),
                lambda y: F.struct(x.alias("u"), y.alias("v")),
            ),
        )
    )
    counts = (
        walks.select(F.explode(pairs).alias("p"))
        .select("p.u", "p.v")
        .where((F.col("u") >= 0) & (F.col("v") >= 0))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    return counts.orderBy(F.desc("cnt"), "u", "v").limit(k)
