"""Deduplication operators: exact, token-Jaccard, MinHash+LSH, SimHash.

Exact + Jaccard are pure DataFrame ops (hash-groupBy / inverted-index
equi-join — the scale path: no cross-join). MinHash/SimHash signatures are
Arrow-vectorized pandas UDFs over token arrays; LSH banding turns near-dup
search into an equi-join on (band, band_hash) — the standard shuffle-
friendly formulation for 100 TB corpora.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(text_hash, cnt, rep_id): groups by content hash; rep = min doc_id."""
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("doc_id").alias("rep_id"))
    )


def token_jaccard_pairs(
    docs: DataFrame, threshold: float = 0.8, text_col: str = "text"
) -> DataFrame:
    """(a, b, jaccard) for unordered doc pairs with unigram-set Jaccard ≥ t.

    Inverted-index formulation: explode distinct tokens, equi-join on token,
    count intersections, |∪| from per-doc distinct counts. No cross-join —
    cost scales with Σ_token df(token)², controllable via document-frequency
    cutoffs at corpus scale.
    """
    dtok = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok")
    ).persist()
    dcnt = dtok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    a = dtok.select(F.col("doc_id").alias("a"), "tok")
    b = dtok.select(F.col("doc_id").alias("b"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    ca = dcnt.select(F.col("doc_id").alias("a"), F.col("c").alias("ca"))
    cb = dcnt.select(F.col("doc_id").alias("b"), F.col("c").alias("cb"))
    sim = (
        inter.join(ca, "a")
        .join(cb, "b")
        .select(
            "a",
            "b",
            F.round(
                F.col("i").cast("double") / (F.col("ca") + F.col("cb") - F.col("i")), 5
            ).alias("jaccard"),
        )
    )
    return sim.filter(F.col("jaccard") >= threshold).select("a", "b", "jaccard")


_MERSENNE = (1 << 61) - 1


def _minhash_params(num_hashes: int, seed: int = 42):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return a, b


def _token_hashes(tokens: pd.Series) -> list[np.ndarray]:
    """Stable 61-bit token hashes (md5-based, platform-independent)."""
    out = []
    for toks in tokens:
        hs = np.fromiter(
            (
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
                & _MERSENNE
                for t in set(toks)
            ),
            dtype=np.int64,
        )
        out.append(hs)
    return out


def minhash_signatures(
    docs: DataFrame, num_hashes: int = 64, text_col: str = "text", seed: int = 42
) -> DataFrame:
    """(doc_id, sig: array<long>) — MinHash over unigram shingles."""
    a, b = _minhash_params(num_hashes, seed)

    @pandas_udf("array<long>")
    def sig_udf(texts: pd.Series) -> pd.Series:
        tokens = texts.str.split(" ")
        sigs = []
        for hs in _token_hashes(tokens):
            if len(hs) == 0:
                sigs.append(np.full(num_hashes, _MERSENNE, dtype=np.int64))
                continue
            # (a*h + b) mod p for all hashes × tokens, then min over tokens
            m = (hs[None, :] * a[:, None] + b[:, None]) % _MERSENNE
            sigs.append(m.min(axis=1))
        return pd.Series(sigs)

    return docs.select("doc_id", sig_udf(F.col(text_col)).alias("sig"))


def minhash_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    text_col: str = "text",
    seed: int = 42,
) -> DataFrame:
    """(a, b) candidate near-dup pairs via LSH banding.

    shingle → minhash → band → bucket equi-join; each band's rows hash to a
    bucket key, pairs sharing any bucket become candidates. The shuffle is
    an equi-join on (band, bucket) — no cross-join at any scale.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, text_col, seed)
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.slice(F.col("sig"), i * rows_per_band + 1, rows_per_band)
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    l = banded.select(F.col("doc_id").alias("a"), "band", "bucket")
    r = banded.select(F.col("doc_id").alias("b"), "band", "bucket")
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) — 64-bit SimHash over unigram token hashes."""

    @pandas_udf("long")
    def sim_udf(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        for i, txt in enumerate(texts):
            toks = set(txt.split(" "))
            if not toks:
                out[i] = 0
                continue
            hs = np.fromiter(
                (
                    int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
                    for t in toks
                ),
                dtype=np.uint64,
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = np.int64(
                np.uint64(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
            )
        return pd.Series(out)

    return docs.select("doc_id", sim_udf(F.col(text_col)).alias("simhash"))


def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.98,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_on: int = 8,
) -> DataFrame:
    """(a, b, cosine) pairs above a cosine threshold, LSH-blocked.

    Random-hyperplane sign bits (computed JVM-side from the first
    ``block_on`` dimensions' signs as a cheap deterministic stand-in for
    sampled projections) gate a within-bucket pair join, then exact cosine.
    """
    sig = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.xxhash64(
            *[
                (F.element_at(F.col(vec_col), i + 1) >= 0).cast("int")
                for i in range(block_on)
            ]
        ).alias("bucket"),
    )
    a = sig.select(F.col("id").alias("a"), F.col("v").alias("va"), "bucket")
    b = sig.select(F.col("id").alias("b"), F.col("v").alias("vb"), "bucket")
    pairs = a.join(b, "bucket").filter(F.col("a") < F.col("b"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(
            F.transform("va", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.transform("vb", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    return (
        pairs.select("a", "b", F.round(dot / (na * nb), 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
