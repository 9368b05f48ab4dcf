"""Hashed-feature linear quality classifier — the fasttext-shaped
document scorer the CCNet / LLaMA-era pipelines use ("keep pages a
linear model thinks look like Wikipedia").

Features are the SAME hashed n-gram buckets as DSIR (pipeline/dsir.py):
unigrams + bigrams hashed into ``n_buckets`` counters, L1-normalized
per document. The model is logistic regression trained by full-batch
gradient descent:

    p_d     = sigmoid(b + Σ_bucket x_db · w_bucket)
    grad_w  = (1/N) Σ_d x_db (p_d − y_d)        (no regularizer — the
    grad_b  = (1/N) Σ_d (p_d − y_d)              hashed dim is fixed)

Scale shape: the model is ``n_buckets + 1`` doubles — bounded state like
a sketch. Features are packed once into per-doc sorted arrays
(key, [(bucket, x)...]) and materialized; each GD iteration is then ONE
map-side-combining shuffle: the residual is a row-local expression (the
weight vector inlined as a literal array — no margins join), and a
sentinel feature (bucket=-1, x=1) per doc folds the bias gradient into
the same groupBy(bucket). The driver round-trip per iteration carries
n_buckets + 1 rows (same documented pattern as BPE's per-merge argmax
and IVF's Lloyd partials).

Determinism: features, labels, and updates are exact arithmetic over a
deterministic hash — no RNG anywhere. Float sum-order differences across
engines stay ~1e-13 after a handful of iterations and are absorbed by
the end-of-pipeline rounding, so train + score replays in ANSI SQL
(queries.sql_quality_classifier unrolls the gradient loop into a CTE
chain — the oracle re-trains the model from scratch in DuckDB).
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import DataFrame, functions as F

from linkgraph.pipeline.dsir import _bucket, _grams_arr


def doc_features(
    docs: DataFrame,
    n_buckets: int = 256,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """→ (key, bucket, x) — L1-normalized hashed n-gram features: x_db =
    cnt_db / Σ_b cnt_db. One explode + one map-side-combining groupBy;
    the normalizer needs no second pass — total grams per doc is
    size(unigrams) + size(bigrams) = 2·n_tokens − 1, a row-local
    expression carried through the groupBy key. NULL text is coalesced to
    '' so a NULL-text doc still emits its one ''-gram feature row — the
    join-form and row-local scorers therefore agree on output cardinality
    (r5 ADVICE: explode of a NULL gram array silently dropped the doc)."""
    toks = F.col("_toks")
    total = (F.lit(2) * F.size(toks) - F.lit(1)).cast("double")
    g = docs.select(
        F.col(key_col).alias("key"),
        F.split(F.coalesce(F.col(text_col), F.lit("")), " ").alias("_toks"),
    ).select(
        "key",
        total.alias("tot"),
        F.explode(_grams_arr(toks)).alias("gram"),
    )
    return (
        g.select("key", "tot", _bucket(F.col("gram"), n_buckets).alias("bucket"))
        .groupBy("key", "tot", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("key", "bucket", (F.col("cnt") / F.col("tot")).alias("x"))
    )


def _doc_feature_arrays(
    docs: DataFrame,
    n_buckets: int = 256,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """→ (key, bx: array<struct<bucket,x>>) — each doc's L1-normalized
    hashed features packed into ONE bucket-sorted array row. Same x
    values as :func:`doc_features`; the packed form makes a GD
    iteration's margin a row-local expression (literal weight array — no
    join, no groupBy) and the gradient one map-side-combining shuffle."""
    return (
        doc_features(docs, n_buckets=n_buckets, text_col=text_col, key_col=key_col)
        .groupBy("key")
        .agg(F.array_sort(F.collect_list(F.struct("bucket", "x"))).alias("bx"))
    )


def _w_literal_array(w: np.ndarray):
    """Full weight vector as a literal ARRAY (element_at is O(1) by
    position; a literal MAP's GetMapValue is a linear key scan — measured
    ~n_buckets× slower per gram). Zero entries contribute exactly 0.0 to
    the margin, so including them is bit-identical to skipping them."""
    return F.array(*[F.lit(float(v)) for v in w])


def _margin_expr(warr, bias: float):
    """bias + Σ x·w[bucket] over a packed `bx` array — row-local codegen."""
    return F.lit(float(bias)) + F.aggregate(
        F.col("bx"),
        F.lit(0.0),
        lambda acc, e: acc + e["x"] * F.element_at(warr, e["bucket"] + F.lit(1)),
    )


def _train_on_arrays(
    fda_y: DataFrame, n: float, n_buckets: int, iters: int, lr: float
) -> tuple[np.ndarray, float]:
    """Full-batch GD over a materialized (key, bx, y) table — ONE
    map-side-combining shuffle per iteration. The residual r is row-local
    (margin via the literal weight array), and appending a sentinel feature
    (bucket=-1, x=1) per doc folds the bias gradient into the same
    groupBy(bucket): Σ x_db·r_d lands on each real bucket, Σ r_d on the
    sentinel. (r5 ADVICE: the old margins-join form ran three shuffle
    computations per iteration.)"""
    w = np.zeros(int(n_buckets), dtype=np.float64)
    bias = 0.0
    sentinel = F.array(
        F.struct(F.lit(-1).cast("int").alias("bucket"), F.lit(1.0).alias("x"))
    )
    for _ in range(int(iters)):
        r = (
            F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin_expr(_w_literal_array(w), bias)))
            - F.col("y")
        )
        # r STAGED below the explode: a single select would pull the
        # margin expression above the Generate and re-evaluate it per
        # exploded feature row (measured ~10× per iteration)
        grad = (
            fda_y.select("bx", r.alias("r"))
            .select("r", F.explode(F.concat(F.col("bx"), sentinel)).alias("e"))
            .groupBy(F.col("e.bucket").alias("bucket"))
            .agg((F.sum(F.col("e.x") * F.col("r")) / n).alias("g"))
            .collect()
        )
        for row in grad:
            if row["bucket"] < 0:
                bias -= lr * float(row["g"])
            else:
                w[row["bucket"]] -= lr * float(row["g"])
    return w, bias


def _feature_arrays_with_labels(
    docs: DataFrame,
    target_source: str,
    n_buckets: int,
    text_col: str,
    source_col: str,
    key_col: str,
    checkpoint: bool = True,
) -> tuple[DataFrame, float]:
    """Materialized (key, bx, y) + N. checkpoint=True → localCheckpoint
    (blocks die with this run's RDD — a persist()'s CacheManager entry is
    plan-keyed and would be silently shared with a later identical call);
    checkpoint=False → lazy persist, for callers that unpersist
    themselves (train-only path, which must leave no pinned RDDs)."""
    y = (F.col(source_col) == target_source).cast("double")
    labels = docs.select(F.col(key_col).alias("key"), y.alias("y"))
    fda_y = _doc_feature_arrays(
        docs, n_buckets=n_buckets, text_col=text_col, key_col=key_col
    ).join(labels, "key")
    fda_y = fda_y.localCheckpoint(eager=True) if checkpoint else fda_y.persist()
    return fda_y, float(labels.count())


def train_quality_classifier(
    docs: DataFrame,
    target_source: str,
    n_buckets: int = 256,
    iters: int = 5,
    lr: float = 10.0,
    text_col: str = "text",
    source_col: str = "source",
    key_col: str = "doc_id",
) -> tuple[np.ndarray, float]:
    """→ (w[n_buckets], b) — logistic regression separating docs with
    ``source == target_source`` (y=1) from the rest (y=0), full-batch
    GD, ``iters`` iterations from w=0, b=0. lr=10 suits L1-normalized
    features whose per-doc mass is 1 (margins live in [-|w|∞, |w|∞])."""
    fda_y, n = _feature_arrays_with_labels(
        docs, target_source, int(n_buckets), text_col, source_col, key_col,
        checkpoint=False,
    )
    try:
        return _train_on_arrays(fda_y, n, int(n_buckets), iters, lr)
    finally:
        fda_y.unpersist()


def classifier_scores(
    docs: DataFrame,
    w: np.ndarray,
    bias: float,
    n_buckets: int = 256,
    text_col: str = "text",
    key_col: str = "doc_id",
    ndigits: int = 5,
) -> DataFrame:
    """→ (doc_id, score) — sigmoid quality score in (0,1) for EVERY doc
    under a trained model; the weight table (≤ n_buckets rows) broadcasts
    onto one pass over the features. Rounded to ``ndigits`` (the engine's
    float-stability recipe)."""
    spark = docs.sparkSession
    wdf = spark.createDataFrame(
        [(i, float(wv)) for i, wv in enumerate(w) if wv != 0.0] or [(0, 0.0)],
        "bucket int, w double",
    )
    feats = doc_features(docs, n_buckets=n_buckets, text_col=text_col, key_col=key_col)
    m = (
        feats.join(F.broadcast(wdf), "bucket", "left")
        .groupBy("key")
        .agg(
            (
                F.lit(float(bias))
                + F.sum(F.col("x") * F.coalesce(F.col("w"), F.lit(0.0)))
            ).alias("m")
        )
    )
    return m.select(
        F.col("key").alias(key_col),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m"))), ndigits).alias(
            "score"
        ),
    )


def quality_classifier_scores(
    docs: DataFrame,
    target_source: str,
    n_buckets: int = 256,
    iters: int = 5,
    lr: float = 10.0,
    text_col: str = "text",
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Train-then-score in one call (the contract-query entry point).

    Features are packed + materialized ONCE and shared by the GD loop and
    the scoring pass (previously scoring re-tokenized + re-hashed the
    whole corpus); scoring itself is row-local over the packed arrays —
    same margin arithmetic as classifier_scores' broadcast-join form, and
    the same output cardinality (docs with ≥1 feature row)."""
    fda_y, n = _feature_arrays_with_labels(
        docs, target_source, int(n_buckets), text_col, source_col, key_col
    )
    w, bias = _train_on_arrays(fda_y, n, int(n_buckets), iters, lr)
    m = _margin_expr(_w_literal_array(w), bias)
    return fda_y.select(
        F.col("key").alias(key_col),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-m)), 5).alias("score"),
    )


def py_reference_classifier(
    rows: list[tuple[int, str, str]],
    target_source: str,
    n_buckets: int,
    iters: int,
    lr: float,
) -> dict[int, float]:
    """Pure-Python/numpy reference (tests + documentation of the exact
    arithmetic): rows = [(doc_id, source, text)] → {doc_id: score}."""
    import hashlib
    from collections import Counter

    def grams(text: str) -> list[str]:
        t = text.split(" ")
        return t + [f"{t[i]} {t[i + 1]}" for i in range(len(t) - 1)]

    def bucket(gm: str) -> int:
        return int(hashlib.md5(gm.encode()).hexdigest()[:15], 16) % n_buckets

    feats, ys = {}, {}
    for did, src, text in rows:
        c = Counter(bucket(g) for g in grams(text))
        tot = float(sum(c.values()))
        feats[did] = {bk: cnt / tot for bk, cnt in c.items()}
        ys[did] = 1.0 if src == target_source else 0.0
    n = float(len(rows))
    w = np.zeros(n_buckets)
    bias = 0.0
    for _ in range(iters):
        gw = np.zeros(n_buckets)
        gb = 0.0
        for did, fx in feats.items():
            m = bias + sum(x * w[bk] for bk, x in fx.items())
            r = 1.0 / (1.0 + math.exp(-m)) - ys[did]
            for bk, x in fx.items():
                gw[bk] += x * r
            gb += r
        w -= lr * gw / n
        bias -= lr * gb / n
    out = {}
    for did, fx in feats.items():
        m = bias + sum(x * w[bk] for bk, x in fx.items())
        out[did] = 1.0 / (1.0 + math.exp(-m))
    return out


def classifier_scores_rowlocal(
    docs: DataFrame,
    w: np.ndarray,
    bias: float,
    n_buckets: int = 256,
    text_col: str = "text",
    key_col: str = "doc_id",
    ndigits: int = 5,
) -> DataFrame:
    """→ (doc_id, score) — ZERO-SHUFFLE scoring: the weight vector is
    inlined as a literal map and the margin is a row-local higher-order
    aggregate over the doc's grams (Σ_b x_b·w_b = (Σ_grams
    w[bucket(gram)]) / total_grams — per-OCCURRENCE weight sum, same
    arithmetic as the join form up to float sum order). No explode, no
    groupBy, no join — whole-stage codegen end to end, which also makes
    it a stateless STREAMING transformation (streaming.stream_
    classifier_scores). Literal-map width is n_buckets entries: fine to ~10^4;
    past that use classifier_scores' broadcast-join form. NULL text is
    coalesced to '' — same as doc_features — so both scorer forms emit the
    same rows with the same (non-NULL) score for NULL-text docs (r5
    ADVICE: the forms used to differ in cardinality on NULL text)."""
    pairs: list = []
    for i, wv in enumerate(w):
        if wv != 0.0:
            pairs += [F.lit(int(i)), F.lit(float(wv))]
    wmap = (
        F.create_map(*pairs) if pairs else F.create_map(F.lit(0), F.lit(0.0))
    )
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    tot = (F.lit(2) * F.size(toks) - F.lit(1)).cast("double")
    msum = F.aggregate(
        _grams_arr(toks),
        F.lit(0.0),
        # try_element_at: ANSI mode throws on missing map keys; buckets
        # with zero weight are absent from the literal map by design
        lambda acc, g: acc
        + F.coalesce(F.try_element_at(wmap, _bucket(g, n_buckets)), F.lit(0.0)),
    )
    margin = F.lit(float(bias)) + msum / tot
    return docs.select(
        F.col(key_col).alias(key_col),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-margin)), ndigits).alias(
            "score"
        ),
    )
