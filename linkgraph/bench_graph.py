"""Deterministic power-law benchmark graph (FIXTURES.md §4).

Preferential-attachment-like digraph: src uniform, dst drawn from a
log-uniform (zipf-ish, P(dst=k) ∝ 1/(k+1)) distribution → heavy in-degree
skew on low ids (max in-degree ~1e4 at 2^20 nodes) — exactly the "popular
repos" skew the salting / map-side-combine paths exist for. Generated
distributed (mapInPandas over spark.range chunks), deterministic per chunk
via seeded numpy; cached as parquet so both parallelism levels read
identical bytes.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def generate_powerlaw_edges(
    spark: SparkSession,
    n_nodes: int = 1 << 20,
    avg_deg: int = 16,
    seed: int = 42,
    chunk: int = 1 << 18,
) -> DataFrame:
    n_edges = n_nodes * avg_deg
    log_n = float(np.log(n_nodes + 1.0))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf["id"].to_numpy(np.int64)
            # deterministic per chunk id, independent of partitioning
            for chunk_id in np.unique(idx // chunk):
                lo = int(chunk_id) * chunk
                hi = min(lo + chunk, n_edges)
                sel = idx[(idx >= lo) & (idx < hi)]
                if len(sel) == 0:
                    continue
                rng = np.random.RandomState(seed + int(chunk_id))
                src_all = rng.randint(0, n_nodes, size=hi - lo).astype(np.int64)
                u = rng.random_sample(hi - lo)
                dst_all = (np.exp(u * log_n) - 1.0).astype(np.int64)
                np.clip(dst_all, 0, n_nodes - 1, out=dst_all)
                off = sel - lo
                yield pd.DataFrame(
                    {"src": src_all[off], "dst": dst_all[off],
                     "weight": np.ones(len(off))}
                )

    return spark.range(n_edges).mapInPandas(gen, schema="src long, dst long, weight double")


def cached_powerlaw_edges(
    spark: SparkSession,
    path: str,
    n_nodes: int = 1 << 20,
    avg_deg: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Generate once → parquet; identical bytes for every run/parallelism."""
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        generate_powerlaw_edges(spark, n_nodes, avg_deg, seed).write.mode(
            "overwrite"
        ).parquet(path)
    return spark.read.parquet(path)
