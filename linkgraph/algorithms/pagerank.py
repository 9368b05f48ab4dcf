"""PageRank family — `algo.pageRank`, `algo.articleRank`, `algo.eigenvector`.

Reference: `algo/src/main/java/org/neo4j/graphalgo/PageRankProc.java` and
`algo/.../impl/pagerank/{PageRank,ComputeSteps,BaseComputeStep,
WeightedComputeStep,DegreeComputer}.java`. Semantics preserved exactly
(SURVEY.md §2.8): **unnormalized** PageRank

    p(v) = (1 − d) · t(v) + d · Σ_{u→v} p(u) · w(u,v) / W(u)

with t ≡ 1 (or the indicator of ``source_nodes`` for personalized PR),
no dangling-mass redistribution, no 1/N normalization — hub scores ≫ 1.
Early exit on ``tolerance`` (max |Δ| across nodes), as in 3.5.x.

Execution re-imagined for Spark instead of the reference's shared-memory
BSP float[] buffers:

* ``strategy='auto'`` (default): resolves per run to ``pull`` (broadcast
  rank vector, zero shuffle) when node ids are contiguous and the vector
  fits a memory-aware driver budget, else ``csr``.
* ``strategy='csr'``: per-partition CSR blocks inside Arrow UDFs
  (blocks.py) — scatter is one numpy bincount per block (map-side combine),
  gather is ``groupBy(dst).agg(sum)``; at most B partial rows per target
  regardless of in-degree, so hot nodes cannot skew the shuffle.
* ``strategy='join'``: pure DataFrame — ranks ⋈ edges → salted two-stage
  ``groupBy(dst).agg(sum)``; Catalyst/AQE pick the join; ``salt`` > 0
  spreads hot targets across salt buckets before the final combine.

Per-superstep checkpoints (io.CheckpointManager) give resumability +
lineage truncation; metrics mirror the reference's stats row
(loadMillis/computeMillis/iterations/didConverge).
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from linkgraph.algorithms import blocks
from linkgraph.graph import Graph
from linkgraph.io import CheckpointManager


@dataclass
class RunMetrics:
    iterations: int = 0
    did_converge: bool = False
    compute_millis: int = 0
    superstep_millis: list[int] = field(default_factory=list)
    deltas: list[float] = field(default_factory=list)
    resumed_from: int | None = None


class PageRank:
    def __init__(
        self,
        damping: float = 0.85,
        max_iterations: int = 20,
        tolerance: float | None = None,
        weighted: bool = False,
        source_nodes: list[int] | None = None,
        strategy: str = "auto",
        num_blocks: int | None = None,
        salt: int = 0,
        checkpoint: CheckpointManager | None = None,
        checkpoint_every: int = 0,
        block_store: str | None = None,
    ):
        self.damping = damping
        self.max_iterations = max_iterations
        self.tolerance = tolerance
        self.weighted = weighted
        self.source_nodes = source_nodes
        self.strategy = strategy
        self.num_blocks = num_blocks
        self.salt = salt
        self.checkpoint = checkpoint
        self.checkpoint_every = checkpoint_every
        self.block_store = block_store
        self.metrics = RunMetrics()

    # ------------------------------------------------------------------ setup
    def _teleport(self, nodes: DataFrame) -> DataFrame:
        if self.source_nodes is None:
            return nodes.select("id", F.lit(1.0).alias("t"))
        srcs = [int(s) for s in self.source_nodes]
        return nodes.select(
            "id", F.when(F.col("id").isin(srcs), 1.0).otherwise(0.0).alias("t")
        )

    def _denominator(self, edges: DataFrame) -> DataFrame:
        """W(u): out-degree (unweighted) or total out-weight (weighted)."""
        agg = F.sum("weight") if self.weighted else F.count(F.lit(1)).cast("double")
        return edges.groupBy(F.col("src").alias("id")).agg(agg.alias("wsum"))

    # ------------------------------------------------------------ superstep
    def _contribs_join(self, edges: DataFrame, ranks: DataFrame, denom: DataFrame) -> DataFrame:
        share = ranks.join(denom, "id").select(
            "id", (F.col("rank") / F.col("wsum")).alias("share")
        )
        per_edge = edges.join(share, edges.src == share.id).select(
            F.col("dst"),
            (F.col("share") * F.col("weight")).alias("c")
            if self.weighted
            else F.col("share").alias("c"),
            F.col("src"),
        )
        if self.salt > 0:
            # two-stage salted combine: hot dst spread over `salt` buckets
            stage1 = per_edge.groupBy(
                "dst", F.pmod(F.xxhash64("src"), F.lit(self.salt)).alias("_salt")
            ).agg(F.sum("c").alias("c"))
            return stage1.groupBy("dst").agg(F.sum("c").alias("contrib"))
        return per_edge.groupBy("dst").agg(F.sum("c").alias("contrib"))

    # ------------------------------------------------------------- pull loop
    def _run_pull(self, graph: Graph) -> DataFrame:
        """Broadcast-pull execution: dst-sliced CSC blocks, zero shuffle.

        The rank vector lives on the driver (the BSP barrier); each superstep
        broadcasts q = p/W and every block computes its target slice with one
        gather + one bincount. Requires contiguous ids 0..n-1 and a vector
        that fits driver/executor memory — the fast path below ~10⁸ nodes;
        'csr' (push + shuffle gather) is the path beyond that.
        """
        import numpy as np
        import pandas as pd

        from linkgraph.algorithms import blocks

        spark = graph.edges.sparkSession
        sc = spark.sparkContext
        d = self.damping
        edges = (
            graph.edges
            if self.weighted
            else graph.edges.withColumn("weight", F.lit(1.0))
        )
        b = self.num_blocks

        node_pd = self._teleport(graph.nodes).toPandas()
        n = len(node_pd)
        ids = node_pd["id"].to_numpy(np.int64)
        if n == 0:
            return graph.nodes.select("id", F.lit(0.0).alias("rank"))
        if ids.min() != 0 or ids.max() != n - 1:
            raise ValueError(
                "pull strategy requires contiguous node ids 0..n-1 "
                "(densify first, or use strategy='csr')"
            )
        t = np.zeros(n)
        t[ids] = node_pd["t"].to_numpy(np.float64)

        block_path = self.block_store
        owns_blocks = False
        if block_path is None:
            # plan-keyed cache: repeat runs on the same logical edge table
            # (bench medians, parameter sweeps) reuse the materialized store
            key = blocks.semantic_store_key(edges, "pr-pull", self.weighted)
            block_path, _hit = blocks.cached_store_dir(
                key, "linkgraph_pullblocks_"
            )
            owns_blocks = key is None  # cache owns registered dirs
        if blocks.store_exists(block_path):
            # trust the STORE's geometry, not the caller's: a b mismatch
            # would silently mis-slice every superstep
            b = blocks.validate_store(block_path, "pull", self.weighted)
        else:
            if b is None:  # size by edge volume only when actually building
                b = blocks.auto_num_blocks(edges, sc.defaultParallelism)
            blocks.write_pull_blocks(edges, b, block_path, weighted=self.weighted)

        p = t.copy()
        start_step = 0
        if self.checkpoint is not None:
            latest = self.checkpoint.latest(fmt="pagerank/ranks-v1")
            if latest is not None:
                start_step, ck_df, _ = latest
                ck_pd = ck_df.toPandas()
                p = np.zeros(n)
                p[ck_pd["id"].to_numpy(np.int64)] = ck_pd["rank"].to_numpy(np.float64)
                self.metrics.resumed_from = start_step

        converged = False
        step = start_step
        # pin the block store across the superstep loop so the LRU eviction
        # in cached_store_dir can never rmtree it mid-run (a crash mid-loop
        # leaks the pin, which only disables eviction for this one path)
        blocks.pin_store(block_path)
        # r6: execution side resolved once — driver-local numpy gather when
        # the store's edge count fits DRIVER_EDGE_THRESHOLD (zero jobs per
        # superstep), the distributed pull job beyond it
        pull_step = blocks.pull_engine(sc, block_path, b, n)
        while step < self.max_iterations:
            it0 = time.time()
            contrib = pull_step(p)
            p_new = (1.0 - d) * t + d * contrib
            step += 1
            delta = float(np.abs(p_new - p).max())
            self.metrics.deltas.append(delta)
            p = p_new
            if self.checkpoint is not None and (
                self.checkpoint_every and step % self.checkpoint_every == 0
            ):
                ck_df = spark.createDataFrame(
                    pd.DataFrame({"id": np.arange(n), "rank": p})
                )
                self.checkpoint.write(ck_df, step, {"delta": delta, "iteration": step}, fmt="pagerank/ranks-v1")
            self.metrics.superstep_millis.append(int((time.time() - it0) * 1000))
            if self.tolerance is not None and delta < self.tolerance:
                converged = True
                break

        self.metrics.iterations = step
        self.metrics.did_converge = converged
        blocks.unpin_store(block_path)
        if owns_blocks:
            import shutil

            shutil.rmtree(block_path, ignore_errors=True)
        return spark.createDataFrame(pd.DataFrame({"id": np.arange(n), "rank": p}))

    # hard ceiling on the rank-vector length the pull strategy will broadcast;
    # the effective cap is memory-aware (see _pull_node_cap) — this is only
    # the upper bound when the driver is huge
    PULL_MAX_NODES = 100_000_000

    @classmethod
    def _pull_node_cap(cls, spark) -> int:
        """Memory-aware node cap for the pull strategy.

        The pull path holds the rank vector plus scratch copies (p, q, next,
        teleport, and the serialized broadcast) driver-side — budget ~64 B per
        node against 25 % of ``spark.driver.memory`` so auto never picks a
        plan that OOMs the driver a csr default would have survived."""
        mem = spark.conf.get("spark.driver.memory", None)
        if not mem:
            try:
                mem = spark.sparkContext.getConf().get("spark.driver.memory", "1g")
            except Exception:
                mem = "1g"
        units = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}
        m = str(mem).strip().lower()
        try:
            if m[-1] in units:
                mem_bytes = int(float(m[:-1]) * units[m[-1]])
            else:
                mem_bytes = int(float(m))
        except (ValueError, IndexError):
            mem_bytes = 1 << 30
        return max(1, min(cls.PULL_MAX_NODES, int(mem_bytes * 0.25) // 64))

    # -------------------------------------------------------------------- run
    def run(self, graph: Graph) -> DataFrame:
        strategy = self.strategy
        if strategy == "auto":
            # strategy resolution (per RUN, into a local + resolved_strategy
            # — a reused instance must re-resolve for each new graph):
            # pull = CSC blocks + one broadcast rank vector, ZERO shuffle
            # per superstep — the fast path whenever ids are contiguous and
            # the vector fits DRIVER memory (memory-aware cap); csr = push
            # scatter + groupBy(dst).sum gather beyond that.
            n = _contiguous_n(graph.nodes.select("id"))
            cap = self._pull_node_cap(graph.nodes.sparkSession)
            strategy = "pull" if n is not None and n <= cap else "csr"
        self.resolved_strategy = strategy
        if strategy == "pull":
            t0 = time.time()
            out = self._run_pull(graph)
            self.metrics.compute_millis = int((time.time() - t0) * 1000)
            out.iterations = self.metrics.iterations
            out.did_converge = self.metrics.did_converge
            return out
        t0 = time.time()
        d = self.damping
        nodes = self._teleport(graph.nodes).persist()
        edges = graph.edges
        start_step = 0

        denom = None
        block_path = None
        owns_blocks = False
        b = self.num_blocks
        if strategy == "csr":
            # materialize the CSR block store once (worker-resident thereafter)
            block_path = self.block_store
            if block_path is None:
                key = blocks.semantic_store_key(edges, "pr-csr", self.weighted)
                block_path, _hit = blocks.cached_store_dir(
                    key, "linkgraph_blocks_"
                )
                owns_blocks = key is None
            if blocks.store_exists(block_path):
                # adopt the store's num_blocks; reject weighted/layout drift
                b = blocks.validate_store(block_path, "push", self.weighted)
            else:
                if b is None:  # size by edge volume only when actually building
                    b = blocks.auto_num_blocks(
                        edges, edges.sparkSession.sparkContext.defaultParallelism
                    )
                blocks.write_edge_blocks(
                    edges if self.weighted else edges.withColumn("weight", F.lit(1.0)),
                    b,
                    block_path,
                    weighted=self.weighted,
                )
        else:
            denom = self._denominator(edges).persist()

        ranks = nodes.select("id", F.col("t").alias("rank"))
        if self.checkpoint is not None:
            latest = self.checkpoint.latest(fmt="pagerank/ranks-v1")
            if latest is not None:
                start_step, ranks, m = latest
                self.metrics.resumed_from = start_step
        ranks = ranks.localCheckpoint(eager=True)

        # r6: nodes with NO in-edges have the constant rank (1−d)·t every
        # superstep, so the per-superstep nodes ⟕ contribs shuffle join is
        # replaced by contribs-side arithmetic + a UNION with this static
        # slice (computed once) — one exchange fewer per superstep, same
        # values. The teleport is a row-local expression of id, so contrib
        # rows never need a join to fetch t.
        if self.source_nodes is None:
            def t_of(c):
                return F.lit(1.0)
        else:
            srcs = [int(s) for s in self.source_nodes]

            def t_of(c):
                return F.when(c.isin(srcs), 1.0).otherwise(0.0)
        static_ranks = (
            nodes.join(
                edges.select(F.col("dst").alias("id")).distinct(), "id", "left_anti"
            )
            .select("id", ((1.0 - d) * F.col("t")).alias("rank"))
            # lazy: the fused csr loop below never reads this; the
            # tolerance/resume loop materializes it in its first superstep
            .localCheckpoint(eager=False)
        )

        converged = False
        step = start_step
        if block_path is not None:
            blocks.pin_store(block_path)  # see pull strategy: guards LRU eviction

        # r6 fused csr loop (no tolerance/resume bookkeeping needed): one
        # exchange per superstep — scatter partials + injected zero rows
        # for no-in-edge nodes → repartition(pmod(dst, b)) → fused
        # gather/update/pack emits the NEXT superstep's rank blocks
        # directly. The tolerance / checkpoint-resume loop below keeps the
        # unpacked (id, rank) table per superstep and is unchanged.
        if (
            strategy == "csr"
            and self.tolerance is None
            and self.checkpoint is None
        ):
            static_zero = (
                nodes.join(
                    edges.select(F.col("dst").alias("id")).distinct(),
                    "id",
                    "left_anti",
                )
                .select(F.col("id").alias("dst"), F.lit(0.0).alias("partial"))
                .localCheckpoint(eager=True)
            )
            rank_blocks = blocks.pack_rank_blocks(ranks, "rank", b).localCheckpoint(
                eager=True
            )
            n_tasks = blocks._pull_task_count(block_path, b)
            while step < self.max_iterations:
                it0 = time.time()
                partials = blocks.scatter_partials_combined(
                    rank_blocks.coalesce(n_tasks), block_path
                ).unionByName(static_zero)
                rank_blocks = blocks.gather_pack(
                    partials, b, d, self.source_nodes
                ).localCheckpoint(eager=True)
                step += 1
                self.metrics.superstep_millis.append(int((time.time() - it0) * 1000))
            ranks = blocks.unpack_rank_blocks(rank_blocks)
            self.metrics.iterations = step
            self.metrics.did_converge = False
            self.metrics.compute_millis = int((time.time() - t0) * 1000)
            blocks.unpin_store(block_path)
            if owns_blocks and block_path:
                import shutil

                shutil.rmtree(block_path, ignore_errors=True)
            nodes.unpersist()
            ranks.iterations = self.metrics.iterations
            ranks.did_converge = self.metrics.did_converge
            return ranks

        while step < self.max_iterations:
            it0 = time.time()
            if strategy == "csr":
                rank_blocks = blocks.pack_rank_blocks(ranks, "rank", b)
                contribs = blocks.scatter_gather(rank_blocks, block_path)
            else:
                contribs = self._contribs_join(edges, ranks, denom)
            # eager localCheckpoint = superstep barrier + lineage truncation
            # (the reference's BSP sync point; durable resume = CheckpointManager)
            new_ranks = (
                contribs.select(
                    F.col("dst").alias("id"),
                    ((1.0 - d) * t_of(F.col("dst")) + d * F.col("contrib")).alias(
                        "rank"
                    ),
                )
                .unionByName(static_ranks)
                .localCheckpoint(eager=True)
            )
            step += 1
            delta = None
            if self.tolerance is not None:
                delta = (
                    new_ranks.alias("n")
                    .join(ranks.alias("o"), "id")
                    .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("m"))
                    .first()["m"]
                ) or 0.0
                self.metrics.deltas.append(float(delta))
            if self.checkpoint is not None and (
                self.checkpoint_every and step % self.checkpoint_every == 0
            ):
                new_ranks = self.checkpoint.write(
                    new_ranks, step, {"delta": delta, "iteration": step},
                    fmt="pagerank/ranks-v1",
                )
            ranks.unpersist()
            ranks = new_ranks
            self.metrics.superstep_millis.append(int((time.time() - it0) * 1000))
            if self.tolerance is not None and delta is not None and delta < self.tolerance:
                converged = True
                break

        self.metrics.iterations = step
        self.metrics.did_converge = converged
        self.metrics.compute_millis = int((time.time() - t0) * 1000)
        if block_path is not None:
            blocks.unpin_store(block_path)
        if owns_blocks and block_path:
            import shutil

            shutil.rmtree(block_path, ignore_errors=True)
        if denom is not None:
            denom.unpersist()
        nodes.unpersist()
        ranks.iterations = self.metrics.iterations
        ranks.did_converge = self.metrics.did_converge
        return ranks


def pagerank(graph: Graph, **kwargs) -> DataFrame:
    """Functional form: ``pagerank(g, damping=0.85, ...)`` → (id, rank)."""
    return PageRank(**kwargs).run(graph)


def _contiguous_n(nodes: DataFrame) -> int | None:
    """n if node ids are exactly 0..n-1 (pull-strategy precondition)."""
    row = nodes.agg(
        F.count("id").alias("c"), F.min("id").alias("mn"), F.max("id").alias("mx")
    ).first()
    if row["c"] and row["mn"] == 0 and row["mx"] == row["c"] - 1:
        return int(row["c"])
    return None


def _pull_power_iteration(
    edges: DataFrame,
    n: int,
    max_iterations: int,
    step,
    denom_add: float = 0.0,
    normalize: bool = True,
    tolerance: float | None = None,
):
    """Shared CSC-block power-iteration driver: build the pull store once
    (one shuffle), then zero-shuffle supersteps; `step(p, contrib)` returns
    the next vector. Returns the final numpy vector.

    The store is reused across calls through the plan-keyed cache
    (blocks.cached_store_dir): Katz/ArticleRank/Eigenvector re-runs on the
    same logical edge table skip the shuffle + rewrite entirely."""
    import shutil

    import numpy as np

    sc = edges.sparkSession.sparkContext
    key = blocks.semantic_store_key(edges, "pullpi", n, denom_add, normalize)
    path, hit = blocks.cached_store_dir(key, "linkgraph_pullpi_")
    blocks.pin_store(path)
    try:
        if hit:
            b = blocks.validate_store(path, "pull")
        else:
            b = blocks.auto_num_blocks(edges, sc.defaultParallelism)
            blocks.write_pull_blocks(
                edges, b, path, denom_add=denom_add, normalize=normalize
            )
        p = np.ones(n)
        pull_step = blocks.pull_engine(sc, path, b, n)  # r6: see _run_pull
        for _ in range(max_iterations):
            contrib = pull_step(p)
            p_new = step(p, contrib)
            delta = float(np.abs(p_new - p).max())
            p = p_new
            if tolerance is not None and delta < tolerance:
                break
        return p
    finally:
        blocks.unpin_store(path)
        if key is None:  # uncached build — nothing owns it, clean up
            shutil.rmtree(path, ignore_errors=True)


def _join_power_loop(
    nodes: DataFrame,
    edges: DataFrame,
    share_fn,
    update_fn,
    max_iterations: int,
    tolerance: float | None = None,
    step_post=None,
):
    """Shared join-strategy power-iteration scaffold — the
    non-contiguous-id fallback for ArticleRank / Eigenvector / Katz (one
    implementation instead of three hand-kept copies). Per iteration: one
    edges⋈share shuffle + map-side-combining groupBy(dst).sum + left-join
    update, eager localCheckpoint, optional per-step post-transform
    (eigenvector's L2 stabilization) and max|Δ| early exit.

    The superseded checkpoint is unpersisted once the next iterate is
    materialized and its delta read — otherwise every iteration pins one
    full rank-table copy in the block manager for the life of the plan.
    Returns (ranks, converged)."""
    ranks = nodes.select("id", F.lit(1.0).alias("rank"))
    prev_ck = None
    converged = False
    for _ in range(max_iterations):
        share = share_fn(ranks)
        contribs = (
            edges.join(share, edges.src == share.id)
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        new_ck = (
            nodes.join(contribs, nodes.id == contribs.dst, "left")
            .select(
                "id",
                update_fn(F.coalesce(F.col("contrib"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        new_ranks = step_post(new_ck) if step_post is not None else new_ck
        delta = None
        if tolerance is not None:
            delta = (
                new_ranks.alias("n")
                .join(ranks.alias("o"), "id")
                .agg(F.max(F.abs(F.col("n.rank") - F.col("o.rank"))))
                .first()[0]
            ) or 0.0
        if prev_ck is not None:
            prev_ck.unpersist()
        prev_ck = new_ck
        ranks = new_ranks
        if tolerance is not None and delta < tolerance:
            converged = True
            break
    return ranks, converged


def article_rank(
    graph: Graph,
    damping: float = 0.85,
    max_iterations: int = 20,
    tolerance: float | None = None,
) -> DataFrame:
    """`algo.articleRank` — PR variant with denominator outdeg(u) + avg_outdeg.

    Reference: `algo/.../ArticleRankProc.java` (variant compute step in
    impl/pagerank/). Contribution = p(u) / (outdeg(u) + mean outdeg).
    Runs on the shared CSC-block engine (denominator baked into w_norm at
    store build: w/(W+avgdeg)) when ids are contiguous; join loop otherwise.
    """
    edges, nodes = graph.edges, graph.nodes.select("id")
    outdeg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).cast("double").alias("deg")
    )
    # average degree = relationshipCount / nodeCount over ALL nodes (the
    # reference divides by total node count, so dangling nodes lower it)
    n_nodes = nodes.count()
    avg_deg = (outdeg.agg(F.sum("deg")).first()[0] or 0.0) / max(n_nodes, 1)

    n = _contiguous_n(nodes)
    if n:
        import numpy as np
        import pandas as pd

        p = _pull_power_iteration(
            edges.select("src", "dst").withColumn("weight", F.lit(1.0)),
            n,
            max_iterations,
            step=lambda p, c: (1.0 - damping) + damping * c,
            denom_add=avg_deg,
            tolerance=tolerance,
        )
        return edges.sparkSession.createDataFrame(
            pd.DataFrame({"id": np.arange(n), "rank": p})
        )

    ranks, _converged = _join_power_loop(
        nodes,
        edges,
        share_fn=lambda r: r.join(outdeg, "id").select(
            "id", (F.col("rank") / (F.col("deg") + F.lit(avg_deg))).alias("share")
        ),
        update_fn=lambda c: F.lit(1.0 - damping) + damping * c,
        max_iterations=max_iterations,
        tolerance=tolerance,
    )
    return ranks


def eigenvector_centrality(
    graph: Graph,
    max_iterations: int = 20,
    normalization: str = "none",
) -> DataFrame:
    """`algo.eigenvector` — power iteration, no damping, optional norm.

    Reference: `algo/.../EigenvectorCentralityProc.java`; per-step L2
    stabilization, final `normalization: none|max|l1norm|l2norm`.
    Runs on the shared CSC-block engine (raw weights, per-step L2 in numpy)
    when ids are contiguous; join loop otherwise.
    """
    edges, nodes = graph.edges, graph.nodes.select("id")

    n = _contiguous_n(nodes)
    if n:
        import numpy as np
        import pandas as pd

        def step(p, c):
            norm = float(np.sqrt((c * c).sum())) or 1.0
            return c / norm

        p = _pull_power_iteration(
            edges.select("src", "dst").withColumn("weight", F.lit(1.0)),
            n,
            max_iterations,
            step=step,
            normalize=False,
        )
        if normalization == "max":
            p = p / (p.max() or 1.0)
        elif normalization == "l1norm":
            p = p / (p.sum() or 1.0)
        return edges.sparkSession.createDataFrame(
            pd.DataFrame({"id": np.arange(n), "rank": p})
        )

    def _l2_post(ck: DataFrame) -> DataFrame:
        norm = ck.agg(F.sqrt(F.sum(F.col("rank") * F.col("rank")))).first()[0] or 1.0
        if norm == 0.0:
            norm = 1.0
        return ck.select("id", (F.col("rank") / F.lit(norm)).alias("rank"))

    ranks, _converged = _join_power_loop(
        nodes,
        edges,
        share_fn=lambda r: r.select("id", F.col("rank").alias("share")),
        update_fn=lambda c: c,
        max_iterations=max_iterations,
        step_post=_l2_post,
    )
    if normalization == "max":
        mx = ranks.agg(F.max("rank")).first()[0] or 1.0
        ranks = ranks.select("id", (F.col("rank") / F.lit(mx or 1.0)).alias("rank"))
    elif normalization == "l1norm":
        s = ranks.agg(F.sum("rank")).first()[0] or 1.0
        ranks = ranks.select("id", (F.col("rank") / F.lit(s or 1.0)).alias("rank"))
    elif normalization == "l2norm":
        pass  # already L2-stabilized each step
    return ranks


def katz_centrality(
    graph: Graph,
    alpha: float = 0.1,
    beta: float = 1.0,
    max_iterations: int = 20,
    tolerance: float | None = None,
) -> DataFrame:
    """Katz centrality — x = Σ_k α^k (Aᵀ)^k·β·1, computed as the power
    iteration x ← α·Aᵀx + β (Katz 1953). Converges for α < 1/λ_max; no
    degree normalization (contrast PageRank), so a node is credited for
    ALL walks reaching it, attenuated by length.

    Engine-added for GDS-successor parity (the reference ships the
    PageRank/ArticleRank/Eigenvector trio; Katz completes the family).
    Runs on the shared CSC-block pull engine when ids are contiguous
    (zero-shuffle supersteps, raw weights), join loop otherwise — the
    same two-strategy split as article_rank above.
    """
    edges, nodes = graph.edges, graph.nodes.select("id")

    n = _contiguous_n(nodes)
    if n:
        import numpy as np
        import pandas as pd

        p = _pull_power_iteration(
            edges.select("src", "dst").withColumn("weight", F.lit(1.0)),
            n,
            max_iterations,
            step=lambda p, c: alpha * c + beta,
            normalize=False,
            tolerance=tolerance,
        )
        return edges.sparkSession.createDataFrame(
            pd.DataFrame({"id": np.arange(n), "rank": p})
        )

    ranks, _converged = _join_power_loop(
        nodes,
        edges,
        share_fn=lambda r: r.select("id", F.col("rank").alias("share")),
        update_fn=lambda c: F.lit(beta) + F.lit(alpha) * c,
        max_iterations=max_iterations,
        tolerance=tolerance,
    )
    return ranks
