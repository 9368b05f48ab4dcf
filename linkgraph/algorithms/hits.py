"""HITS (Hyperlink-Induced Topic Search) — hubs & authorities.

Kleinberg 1999 ("Authoritative sources in a hyperlinked environment",
JACM 46(5)). Beyond the reference's surface (reference-adjacent anchor:
`algo/src/main/java/org/neo4j/graphalgo/PageRankProc.java` — same
gather-normalize iteration family); the GDS successor ships `gds.hits`.
For a web-scale link graph, hubs/authorities is the canonical companion
to PageRank, so it is first-class here.

Synchronous power iteration with **L1 normalization** each half-step
(scores sum to n, matching PageRank's scale convention), deterministic
and partition-count invariant:

    auth(v) = norm( Σ_{u→v} hub(u) )
    hub(u)  = norm( Σ_{u→v} auth(v) )

Scale shape: each half-step is one `edges ⋈ scores` (shuffle keyed on the
edge's own partition key) + one map-side-combining `groupBy().sum()` —
identical plan shape to PageRank's join strategy, so the same 1000-executor
reasoning applies (partial aggregation bounds hot-key fan-in; AQE handles
residual skew). The two scalar L1 sums per iteration are single-row
aggregates broadcast back via crossJoin — no driver collect. Lineage is
truncated with an eager localCheckpoint per iteration, exactly like
LPA/WCC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from linkgraph.graph import Graph


def hits(
    graph: Graph,
    max_iterations: int = 20,
    tolerance: float | None = None,
) -> DataFrame:
    """→ (id, hub, authority) after `max_iterations` synchronous rounds
    (or earlier if the L1 delta of both vectors drops below `tolerance`).

    Isolated nodes (no in- or out-edges) keep score 0 after the first
    normalization, matching the linear-algebra definition on the adjacency
    matrix restricted to the node set.
    """
    edges = graph.edges.select("src", "dst").persist()
    nodes = graph.nodes.select("id")
    n = nodes.count()

    hub = nodes.select("id", F.lit(1.0).alias("hub")).localCheckpoint(eager=True)
    auth = None
    iterations, converged = 0, False
    for step in range(max_iterations):
        araw = (
            edges.join(hub, edges.src == hub.id)
            .groupBy("dst")
            .agg(F.sum("hub").alias("s"))
        )
        auth_new = _l1_normalize(nodes, araw, "authority", n)
        hraw = (
            edges.join(auth_new, edges.dst == auth_new.id)
            .groupBy("src")
            .agg(F.sum("authority").alias("s"))
        )
        hub_new = _l1_normalize(nodes, hraw, "hub", n).localCheckpoint(eager=True)
        auth_new = auth_new.localCheckpoint(eager=True)
        iterations = step + 1
        if tolerance is not None:
            prev = hub.select("id", F.col("hub").alias("_prev_hub"))
            delta = (
                hub_new.join(prev, "id")
                .agg(F.sum(F.abs(F.col("hub") - F.col("_prev_hub"))).alias("d"))
                .collect()[0]["d"]
            )
            if delta is not None and delta < tolerance * n:
                converged = True
        hub.unpersist()
        hub, auth = hub_new, auth_new
        if converged:
            break
    edges.unpersist()
    out = hub.join(auth, "id", "left").select(
        "id",
        F.col("hub"),
        F.coalesce("authority", F.lit(0.0)).alias("authority"),
    )
    out.iterations = iterations  # type: ignore[attr-defined]
    out.did_converge = converged  # type: ignore[attr-defined]
    return out


def _l1_normalize(nodes: DataFrame, raw: DataFrame, col: str, n: int) -> DataFrame:
    """(id, col) with Σ col = n; zero-sum guard returns all-zeros."""
    key = raw.columns[0]
    scores = nodes.join(raw, nodes.id == raw[key], "left").select(
        "id", F.coalesce("s", F.lit(0.0)).alias("_raw")
    )
    total = scores.agg(F.sum("_raw").alias("_t"))
    return scores.crossJoin(F.broadcast(total)).select(
        "id",
        F.when(F.col("_t") > 0, F.col("_raw") * F.lit(float(n)) / F.col("_t"))
        .otherwise(F.lit(0.0))
        .alias(col),
    )
