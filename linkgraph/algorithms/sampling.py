"""GraphSAGE-style k-hop neighbor sampling (Hamilton et al., NIPS 2017).

Minibatch construction for graph learning over a link graph: given a set
of seed nodes and per-hop fanouts [f1, f2, ...], keep at most f_k
neighbors per frontier node at hop k. Sampling is DETERMINISTIC — each
node keeps the f neighbors with the smallest value of a fixed affine
hash of (src, dst) — so results are reproducible across runs, partition
counts, and engines (the same rule is expressible as a ROW_NUMBER window
in ANSI SQL, which is what the DuckDB oracle replays).

Scale shape
-----------
The naive formulation is a row_number window partitioned by src — one
reducer per node, which a power-law hub (degree 1e8+) turns into a
straggler. Instead the per-node top-f runs as a SALTED TWO-STAGE
aggregation (same pattern as the salted gather in pagerank/blocks):

  stage 1: groupBy(src, hash(dst) % S)  -> partial top-f per salt bucket
           (collect_list supports partial aggregation, so the map-side
            combine already caps each bucket's state at f structs)
  stage 2: groupBy(src)                 -> merge S partial lists, re-sort,
           take f

min-f-by-key is associative, so the two-stage result is exactly the
single-window result, but no reducer ever sees more than S·f rows per
node. Per hop: one bounded shuffle; the frontier join is broadcast-able
whenever the seed set is small (Catalyst/AQE decide).

Reference parity: the reference engine has no sampler proc (closest is
algo.randomWalk's neighbor selection, core/utils/RandomProvider usage);
this operator is engine-added for the LLM-training-pipeline surface
(GNN minibatch fan-out over the repo dependency graph).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

# Affine hash constants (glibc LCG multiplier/increment). Small enough
# that A*dst stays inside int64 for node ids < ~8e9; for 1e12-file-scale
# id spaces swap in F.xxhash64(src, dst) via hash_expr (the SQL oracle is
# the only reason the affine form is the default).
HASH_A = 1103515245
HASH_B = 12345
HASH_M = 2147483648  # 2^31


def _rank_hash(src: F.Column | str, dst: F.Column | str) -> F.Column:
    return (
        F.lit(HASH_A) * F.col(dst if isinstance(dst, str) else "dst")
        + F.lit(HASH_B) * F.col(src if isinstance(src, str) else "src")
    ) % F.lit(HASH_M)


def sample_neighbors(
    edges: DataFrame, fanout: int, salt_buckets: int = 8
) -> DataFrame:
    """(src, dst) — for each src keep the `fanout` neighbors with the
    smallest (rank_hash, dst); exact min-f via salted two-stage agg."""
    h = _rank_hash("src", "dst")
    partial = (
        edges.select("src", "dst")
        .withColumn("_h", h)
        .groupBy("src", F.pmod(F.xxhash64("dst"), F.lit(salt_buckets)).alias("_s"))
        .agg(
            F.slice(
                F.array_sort(F.collect_list(F.struct("_h", "dst"))), 1, fanout
            ).alias("part")
        )
    )
    merged = partial.groupBy("src").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("part"))), 1, fanout).alias(
            "top"
        )
    )
    return merged.select("src", F.explode("top").alias("t")).select(
        "src", F.col("t.dst").alias("dst")
    )


def k_hop_sample(
    edges: DataFrame,
    seeds: DataFrame,
    fanouts: Sequence[int],
    salt_buckets: int = 8,
) -> DataFrame:
    """(hop, src, dst) — the sampled computation graph: hop 1 keeps
    fanouts[0] neighbors per seed, hop k keeps fanouts[k-1] neighbors per
    hop-(k-1) frontier node. The frontier joins BEFORE sampling so only
    touched adjacency lists are read (predicate reaches the scan when
    `edges` is a plain source). One localCheckpoint per hop truncates
    lineage — the frontier feeds both the output and the next hop."""
    frontier = seeds.select(
        F.col(seeds.columns[0]).cast("long").alias("src")
    ).distinct()
    hops: list[DataFrame] = []
    for hop, fanout in enumerate(fanouts, start=1):
        cand = edges.select("src", "dst").join(frontier, "src")
        samp = (
            sample_neighbors(cand, fanout, salt_buckets)
            .select(
                F.lit(hop).cast("int").alias("hop"),
                F.col("src").cast("long").alias("src"),
                F.col("dst").cast("long").alias("dst"),
            )
            .localCheckpoint(eager=True)
        )
        hops.append(samp)
        frontier = samp.select(F.col("dst").alias("src")).distinct()
    out = hops[0]
    for d in hops[1:]:
        out = out.unionByName(d)
    return out
