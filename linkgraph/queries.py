"""Driver-contract queries: Spark implementations + DuckDB oracle SQL.

Every query here exists twice: a Spark callable (spark, sf_dir) → DataFrame
running through the engine, and an ANSI-SQL string DuckDB runs on the same
parquet views. Column names/types and float rounding are aligned so the
driver's order-insensitive value-hash matches.

The document graph is derived from the `documents` table with deterministic
integer arithmetic over (doc_id, n_chars, #occurrences of 'spark' in text) —
content-dependent, yet expressible identically in both engines. Iterative
oracles (PageRank / WCC / LPA) are UNROLLED into generated CTE chains —
DuckDB recursive CTEs can't aggregate over the recursive term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from linkgraph.graph import Graph

DAMPING = 0.85
PR_ITERS = 20
WCC_ROUNDS = 16
LPA_ROUNDS = 8


# --------------------------------------------------------------------- edges
def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def doc_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic doc→doc link table (directed, ~4 out-edges per doc)."""
    docs = load_documents(spark, sf_dir)
    n = docs.count()
    ns5 = (
        F.length("text")
        - F.length(F.regexp_replace(F.col("text"), "spark", ""))
    ).cast("long")
    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_chars").cast("long").alias("n_chars"),
        ns5.alias("ns5"),
    )
    mod = F.lit(int(n)).cast("long")
    dsts = [
        (37 * F.col("doc_id") + F.col("n_chars")) % mod,
        (61 * F.col("doc_id") + 3 * F.col("ns5") + 7) % mod,
        (101 * F.col("doc_id") + 13 * F.col("n_chars") + 1) % mod,
        (17 * F.col("doc_id") + 29 * F.col("ns5") + 11 * F.col("n_chars")) % mod,
    ]
    parts = [
        base.select(F.col("doc_id").alias("src"), d.cast("long").alias("dst")) for d in dsts
    ]
    e = parts[0]
    for p in parts[1:]:
        e = e.unionByName(p)
    return e.filter(F.col("src") != F.col("dst")).distinct()


def doc_graph(spark: SparkSession, sf_dir: str) -> Graph:
    docs = load_documents(spark, sf_dir)
    nodes = docs.select(F.col("doc_id").cast("long").alias("id"))
    return Graph.from_edges(doc_edges(spark, sf_dir), nodes=nodes)


# DuckDB prolog: the same edge table in SQL. `nn` is a scalar subquery so the
# one SQL string works at every scale factor.
_PROLOG = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
base AS MATERIALIZED (
  SELECT doc_id, n_chars,
         (length(text) - length(replace(text, 'spark', ''))) AS ns5
  FROM documents
),
raw AS (
  SELECT doc_id AS src, (37*doc_id + n_chars) % (SELECT n FROM nn) AS dst FROM base
  UNION
  SELECT doc_id, (61*doc_id + 3*ns5 + 7) % (SELECT n FROM nn) FROM base
  UNION
  SELECT doc_id, (101*doc_id + 13*n_chars + 1) % (SELECT n FROM nn) FROM base
  UNION
  SELECT doc_id, (17*doc_id + 29*ns5 + 11*n_chars) % (SELECT n FROM nn) FROM base
),
edges AS MATERIALIZED (SELECT src, dst FROM raw WHERE src <> dst),
ue AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
ce AS MATERIALIZED (SELECT DISTINCT LEAST(src,dst) AS a, GREATEST(src,dst) AS b FROM edges),
nodes AS (SELECT doc_id AS id FROM documents)
"""

_D = "CAST(0.85 AS DOUBLE)"
_ONE_MINUS_D = "(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE))"


# ------------------------------------------------------------------ pagerank
def q_doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.pagerank import PageRank

    # strategy="auto": resolves to the zero-shuffle CSC-block pull engine
    # while the rank vector fits the memory-aware driver cap (it does at
    # every test SF), and to the csr push path beyond it — same math, same
    # 5-digit-rounded values (q_doc_pagerank_converged already proves
    # pull ≡ the shared PR oracle). r6: was pinned to "csr", which paid
    # 3 shuffles + a localCheckpoint per superstep on a graph whose
    # supersteps are pure fixed overhead; csr stays exercised by the
    # powerlaw headline benchmark.
    g = doc_graph(spark, sf_dir)
    ranks = PageRank(damping=DAMPING, max_iterations=PR_ITERS, strategy="auto").run(g)
    return ranks.select("id", F.round("rank", 5).alias("rank"))


def sql_doc_pagerank() -> str:
    parts = [_PROLOG]
    parts.append(", outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS wsum FROM edges GROUP BY src)")
    parts.append(", r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM nodes)")
    for k in range(1, PR_ITERS + 1):
        parts.append(
            f""", r{k} AS MATERIALIZED (
  SELECT n.id, {_ONE_MINUS_D} + {_D} * COALESCE(c.s, CAST(0.0 AS DOUBLE)) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / o.wsum) AS s
    FROM edges e JOIN r{k - 1} r ON e.src = r.id JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) c ON n.id = c.id)"""
        )
    parts.append(f"SELECT id, ROUND(rank, 5) AS rank FROM r{PR_ITERS}")
    return "\n".join(parts)


PR_CONV_ITERS = 60  # oracle unroll bound; past convergence extra iters no-op


def q_doc_pagerank_converged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-to-convergence semantics (tolerance/didConverge, the reference's
    PageRank.tolerance): iterate until max|Δ| < 1e-9, assert convergence,
    compare against an oracle unrolled well past the convergence point
    (extra fixpoint iterations change nothing at 5-decimal rounding)."""
    from linkgraph.algorithms.pagerank import PageRank

    g = doc_graph(spark, sf_dir)
    pr = PageRank(
        damping=DAMPING, max_iterations=PR_CONV_ITERS, tolerance=1e-9, strategy="pull"
    )
    ranks = pr.run(g)
    assert pr.metrics.did_converge, "PageRank did not converge within bound"
    return ranks.select("id", F.round("rank", 5).alias("rank"))


def sql_doc_pagerank_converged() -> str:
    parts = [_PROLOG]
    parts.append(", outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS wsum FROM edges GROUP BY src)")
    parts.append(", c0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM nodes)")
    for k in range(1, PR_CONV_ITERS + 1):
        parts.append(
            f""", c{k} AS MATERIALIZED (
  SELECT n.id, {_ONE_MINUS_D} + {_D} * COALESCE(c.s, CAST(0.0 AS DOUBLE)) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / o.wsum) AS s
    FROM edges e JOIN c{k - 1} r ON e.src = r.id JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) c ON n.id = c.id)"""
        )
    parts.append(f"SELECT id, ROUND(rank, 5) AS rank FROM c{PR_CONV_ITERS}")
    return "\n".join(parts)


def q_doc_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PR: deterministic edge weight 1 + (src+dst) % 3."""
    from linkgraph.algorithms.pagerank import PageRank

    e = doc_edges(spark, sf_dir).withColumn(
        "weight", (1 + (F.col("src") + F.col("dst")) % 3).cast("double")
    )
    docs = load_documents(spark, sf_dir)
    g = Graph.from_edges(e, nodes=docs.select(F.col("doc_id").alias("id")))
    ranks = PageRank(
        damping=DAMPING, max_iterations=PR_ITERS, weighted=True, strategy="csr"
    ).run(g)
    return ranks.select("id", F.round("rank", 5).alias("rank"))


def sql_doc_pagerank_weighted() -> str:
    parts = [_PROLOG]
    parts.append(
        ", we AS MATERIALIZED (SELECT src, dst, "
        "CAST(1 + (src + dst) % 3 AS DOUBLE) AS w FROM edges)"
    )
    parts.append(", outw AS MATERIALIZED (SELECT src, SUM(w) AS wsum FROM we GROUP BY src)")
    parts.append(", r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM nodes)")
    for k in range(1, PR_ITERS + 1):
        parts.append(
            f""", r{k} AS MATERIALIZED (
  SELECT n.id, {_ONE_MINUS_D} + {_D} * COALESCE(c.s, CAST(0.0 AS DOUBLE)) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank * e.w / o.wsum) AS s
    FROM we e JOIN r{k - 1} r ON e.src = r.id JOIN outw o ON e.src = o.src
    GROUP BY e.dst
  ) c ON n.id = c.id)"""
        )
    parts.append(f"SELECT id, ROUND(rank, 5) AS rank FROM r{PR_ITERS}")
    return "\n".join(parts)


def q_doc_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PR: teleport set = doc_id < 10."""
    from linkgraph.algorithms.pagerank import PageRank

    g = doc_graph(spark, sf_dir)
    ranks = PageRank(
        damping=DAMPING,
        max_iterations=PR_ITERS,
        source_nodes=list(range(10)),
        strategy="csr",
    ).run(g)
    return ranks.select("id", F.round("rank", 5).alias("rank"))


def sql_doc_pagerank_personalized() -> str:
    parts = [_PROLOG]
    parts.append(
        ", tele AS (SELECT id, CASE WHEN id < 10 THEN CAST(1.0 AS DOUBLE) "
        "ELSE CAST(0.0 AS DOUBLE) END AS t FROM nodes)"
    )
    parts.append(", outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS wsum FROM edges GROUP BY src)")
    parts.append(", r0 AS (SELECT id, t AS rank FROM tele)")
    for k in range(1, PR_ITERS + 1):
        parts.append(
            f""", r{k} AS MATERIALIZED (
  SELECT n.id, {_ONE_MINUS_D} * n.t + {_D} * COALESCE(c.s, CAST(0.0 AS DOUBLE)) AS rank
  FROM tele n LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / o.wsum) AS s
    FROM edges e JOIN r{k - 1} r ON e.src = r.id JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) c ON n.id = c.id)"""
        )
    parts.append(f"SELECT id, ROUND(rank, 5) AS rank FROM r{PR_ITERS}")
    return "\n".join(parts)


def q_doc_article_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.pagerank import article_rank

    g = doc_graph(spark, sf_dir)
    return article_rank(g, max_iterations=PR_ITERS).select(
        "id", F.round("rank", 5).alias("rank")
    )


def sql_doc_article_rank() -> str:
    parts = [_PROLOG]
    parts.append(", outdeg AS MATERIALIZED (SELECT src, CAST(COUNT(*) AS DOUBLE) AS deg FROM edges GROUP BY src)")
    # average degree = relationshipCount / nodeCount over ALL nodes
    parts.append(", avgd AS (SELECT SUM(deg) / (SELECT COUNT(*) FROM nodes) AS a FROM outdeg)")
    parts.append(", r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM nodes)")
    for k in range(1, PR_ITERS + 1):
        parts.append(
            f""", r{k} AS MATERIALIZED (
  SELECT n.id, {_ONE_MINUS_D} + {_D} * COALESCE(c.s, CAST(0.0 AS DOUBLE)) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / (o.deg + (SELECT a FROM avgd))) AS s
    FROM edges e JOIN r{k - 1} r ON e.src = r.id JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) c ON n.id = c.id)"""
        )
    parts.append(f"SELECT id, ROUND(rank, 5) AS rank FROM r{PR_ITERS}")
    return "\n".join(parts)


EV_ITERS = 12


def q_doc_eigenvector(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.pagerank import eigenvector_centrality

    g = doc_graph(spark, sf_dir)
    out = eigenvector_centrality(g, max_iterations=EV_ITERS, normalization="max")
    return out.select("id", F.round("rank", 5).alias("rank"))


def _sql_eigenvector_base() -> str:
    parts = [_PROLOG]
    parts.append(", r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM nodes)")
    for k in range(1, EV_ITERS + 1):
        parts.append(
            f""", c{k} AS MATERIALIZED (
  SELECT n.id, COALESCE(s.v, CAST(0.0 AS DOUBLE)) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank) AS v FROM edges e JOIN r{k - 1} r ON e.src = r.id
    GROUP BY e.dst) s ON n.id = s.id)
, r{k} AS MATERIALIZED (
  SELECT id, rank / (SELECT CASE WHEN sqrt(SUM(rank*rank)) = 0 THEN 1.0
                     ELSE sqrt(SUM(rank*rank)) END FROM c{k}) AS rank
  FROM c{k})"""
        )
    return "\n".join(parts)


def sql_doc_eigenvector() -> str:
    return (
        _sql_eigenvector_base()
        + f"""
SELECT id, ROUND(rank / (SELECT CASE WHEN MAX(rank) = 0 THEN 1.0
        ELSE MAX(rank) END FROM r{EV_ITERS}), 5) AS rank FROM r{EV_ITERS}"""
    )


def q_doc_eigenvector_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eigenvector norm variant: l1norm (scores sum to 1)."""
    from linkgraph.algorithms.pagerank import eigenvector_centrality

    g = doc_graph(spark, sf_dir)
    out = eigenvector_centrality(g, max_iterations=EV_ITERS, normalization="l1norm")
    return out.select("id", F.round("rank", 6).alias("rank"))


def sql_doc_eigenvector_l1() -> str:
    return (
        _sql_eigenvector_base()
        + f"""
SELECT id, ROUND(rank / (SELECT CASE WHEN SUM(rank) = 0 THEN 1.0
        ELSE SUM(rank) END FROM r{EV_ITERS}), 6) AS rank FROM r{EV_ITERS}"""
    )


SSSP_ROUNDS = 24


def q_doc_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-stepping SSSP from node 0 on the weighted doc graph."""
    from linkgraph.algorithms.paths import delta_stepping

    e = doc_edges(spark, sf_dir).withColumn(
        "weight", (1 + (F.col("src") + F.col("dst")) % 3).cast("double")
    )
    docs = load_documents(spark, sf_dir)
    g = Graph.from_edges(e, nodes=docs.select(F.col("doc_id").alias("id")))
    out = delta_stepping(g, 0, delta=2.0)
    return out.select(F.col("node_id"), F.round("distance", 5).alias("distance"))


def sql_doc_sssp(
    final: str = (
        "SELECT id AS node_id, ROUND(dist, 5) AS distance FROM d{last} "
        "WHERE dist IS NOT NULL"
    ),
) -> str:
    """Bellman-Ford unrolled to fixpoint (diameter of the random doc graph
    is far below SSSP_ROUNDS)."""
    parts = [_PROLOG]
    parts.append(
        ", we AS MATERIALIZED (SELECT src, dst, "
        "CAST(1 + (src + dst) % 3 AS DOUBLE) AS w FROM edges)"
    )
    parts.append(
        ", d0 AS (SELECT id, CASE WHEN id = 0 THEN CAST(0.0 AS DOUBLE) END AS dist FROM nodes)"
    )
    for k in range(1, SSSP_ROUNDS + 1):
        parts.append(
            f""", d{k} AS MATERIALIZED (
  SELECT n.id,
         CASE WHEN n.dist IS NULL THEN r.cand
              WHEN r.cand IS NULL THEN n.dist
              ELSE LEAST(n.dist, r.cand) END AS dist
  FROM d{k - 1} n LEFT JOIN (
    SELECT e.dst AS id, MIN(p.dist + e.w) AS cand
    FROM we e JOIN d{k - 1} p ON e.src = p.id AND p.dist IS NOT NULL
    GROUP BY e.dst) r ON n.id = r.id)"""
        )
    parts.append(final.format(last=SSSP_ROUNDS))
    return "\n".join(parts)


BFS_ROUNDS = 24


def q_doc_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BFS depths from node 0 over the directed doc graph."""
    from linkgraph.algorithms.paths import bfs

    g = doc_graph(spark, sf_dir)
    return bfs(g, 0, direction="OUTGOING").select("node_id", F.col("depth"))


def sql_doc_bfs() -> str:
    parts = [_PROLOG]
    parts.append(
        ", b0 AS (SELECT id, CASE WHEN id = 0 THEN CAST(0 AS BIGINT) END AS depth FROM nodes)"
    )
    for k in range(1, BFS_ROUNDS + 1):
        parts.append(
            f""", b{k} AS MATERIALIZED (
  SELECT n.id,
         CASE WHEN n.depth IS NULL THEN r.cand
              WHEN r.cand IS NULL THEN n.depth
              ELSE LEAST(n.depth, r.cand) END AS depth
  FROM b{k - 1} n LEFT JOIN (
    SELECT e.dst AS id, MIN(p.depth + 1) AS cand
    FROM edges e JOIN b{k - 1} p ON e.src = p.id AND p.depth IS NOT NULL
    GROUP BY e.dst) r ON n.id = r.id)"""
        )
    parts.append(
        f"SELECT id AS node_id, depth FROM b{BFS_ROUNDS} WHERE depth IS NOT NULL"
    )
    return "\n".join(parts)


def q_user_overlap_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.similarity import overlap

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return overlap(events, "user_id", "event_type", top_k=3).select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        "similarity",
    )


def sql_user_overlap_topk() -> str:
    return """
WITH cats AS MATERIALIZED (SELECT DISTINCT user_id, event_type FROM events),
deg AS MATERIALIZED (SELECT user_id, COUNT(*) AS d FROM cats GROUP BY user_id),
inter AS (
  SELECT x.user_id AS a, y.user_id AS b, COUNT(*) AS i
  FROM cats x JOIN cats y ON x.event_type = y.event_type AND x.user_id <> y.user_id
  GROUP BY x.user_id, y.user_id),
scored AS (
  SELECT i.a, i.b,
         CAST(i.i AS DOUBLE) / LEAST(da.d, db.d) AS similarity,
         ROW_NUMBER() OVER (PARTITION BY i.a
                            ORDER BY CAST(i.i AS DOUBLE) / LEAST(da.d, db.d) DESC, i.b ASC) AS rn
  FROM inter i JOIN deg da ON da.user_id = i.a JOIN deg db ON db.user_id = i.b)
SELECT a, b, ROUND(similarity, 5) AS similarity FROM scored WHERE rn <= 3"""


# ----------------------------------------------------------------------- wcc
def q_doc_wcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.wcc import wcc

    return wcc(doc_graph(spark, sf_dir)).select("id", "component")


def sql_doc_wcc(final: str = "SELECT id, comp AS component FROM l{last}") -> str:
    parts = [_PROLOG]
    parts.append(", l0 AS (SELECT doc_id AS id, doc_id AS comp FROM documents)")
    for k in range(1, WCC_ROUNDS + 1):
        parts.append(
            f""", m{k} AS MATERIALIZED (
  SELECT l.id, LEAST(l.comp, COALESCE(nm.nmin, l.comp)) AS comp
  FROM l{k - 1} l LEFT JOIN (
    SELECT u.dst AS id, MIN(p.comp) AS nmin FROM ue u JOIN l{k - 1} p ON u.src = p.id GROUP BY u.dst
  ) nm ON l.id = nm.id)
, l{k} AS MATERIALIZED (
  SELECT m.id, COALESCE(p2.comp, m.comp) AS comp
  FROM m{k} m LEFT JOIN m{k} p2 ON m.comp = p2.id)"""
        )
    parts.append(final.format(last=WCC_ROUNDS))
    return "\n".join(parts)


def q_doc_wcc_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    comp = q_doc_wcc(spark, sf_dir)
    return comp.groupBy("component").agg(F.count(F.lit(1)).alias("size"))


def sql_doc_wcc_sizes() -> str:
    return sql_doc_wcc(
        "SELECT comp AS component, COUNT(*) AS size FROM l{last} GROUP BY comp"
    )


# ----------------------------------------------------------------------- lpa
def q_doc_lpa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.lpa import label_propagation

    g = doc_graph(spark, sf_dir)
    return label_propagation(g, max_iterations=LPA_ROUNDS, weighted=False).select(
        "id", "label"
    )


def sql_doc_lpa() -> str:
    parts = [_PROLOG]
    parts.append(", s0 AS (SELECT doc_id AS id, doc_id AS label FROM documents)")
    for k in range(1, LPA_ROUNDS + 1):
        parts.append(
            f""", s{k} AS MATERIALIZED (
  SELECT l.id, COALESCE(v.new_label, l.label) AS label
  FROM s{k - 1} l LEFT JOIN (
    SELECT id, new_label FROM (
      SELECT u.dst AS id, p.label AS new_label,
             ROW_NUMBER() OVER (PARTITION BY u.dst ORDER BY COUNT(*) DESC, p.label ASC) AS rn
      FROM ue u JOIN s{k - 1} p ON u.src = p.id
      GROUP BY u.dst, p.label
    ) t WHERE rn = 1
  ) v ON l.id = v.id)"""
        )
    parts.append(f"SELECT id, label FROM s{LPA_ROUNDS}")
    return "\n".join(parts)


def q_doc_lpa_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted LPA: votes weighted by 1+(src+dst)%3 (symmetric)."""
    from linkgraph.algorithms.lpa import label_propagation

    g = _weighted_doc_graph(spark, sf_dir)
    return label_propagation(g, max_iterations=LPA_ROUNDS, weighted=True).select(
        "id", "label"
    )


def sql_doc_lpa_weighted() -> str:
    parts = [_PROLOG]
    parts.append(
        ", uew AS MATERIALIZED (SELECT src, dst, "
        "CAST(1 + (src + dst) % 3 AS DOUBLE) AS w FROM edges "
        "UNION SELECT dst, src, CAST(1 + (src + dst) % 3 AS DOUBLE) FROM edges)"
    )
    parts.append(", v0 AS (SELECT doc_id AS id, doc_id AS label FROM documents)")
    for k in range(1, LPA_ROUNDS + 1):
        parts.append(
            f""", v{k} AS MATERIALIZED (
  SELECT l.id, COALESCE(v.new_label, l.label) AS label
  FROM v{k - 1} l LEFT JOIN (
    SELECT id, new_label FROM (
      SELECT u.dst AS id, p.label AS new_label,
             ROW_NUMBER() OVER (PARTITION BY u.dst ORDER BY SUM(u.w) DESC, p.label ASC) AS rn
      FROM uew u JOIN v{k - 1} p ON u.src = p.id
      GROUP BY u.dst, p.label
    ) t WHERE rn = 1
  ) v ON l.id = v.id)"""
        )
    parts.append(f"SELECT id, label FROM v{LPA_ROUNDS}")
    return "\n".join(parts)


def q_doc_lpa_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded LPA: partitionProperty = first letter of lang."""
    from linkgraph.algorithms.lpa import label_propagation

    docs = load_documents(spark, sf_dir)
    nodes = docs.select(
        F.col("doc_id").cast("long").alias("id"),
        F.ascii(F.substring("lang", 1, 1)).cast("long").alias("seed"),
    )
    g = Graph.from_edges(doc_edges(spark, sf_dir), nodes=nodes)
    return label_propagation(
        g, max_iterations=LPA_ROUNDS, seed_col="seed", weighted=False
    ).select("id", "label")


def sql_doc_lpa_seeded() -> str:
    parts = [_PROLOG]
    parts.append(
        ", g0 AS (SELECT doc_id AS id, "
        "CAST(ascii(substr(lang, 1, 1)) AS BIGINT) AS label FROM documents)"
    )
    for k in range(1, LPA_ROUNDS + 1):
        parts.append(
            f""", g{k} AS MATERIALIZED (
  SELECT l.id, COALESCE(v.new_label, l.label) AS label
  FROM g{k - 1} l LEFT JOIN (
    SELECT id, new_label FROM (
      SELECT u.dst AS id, p.label AS new_label,
             ROW_NUMBER() OVER (PARTITION BY u.dst ORDER BY COUNT(*) DESC, p.label ASC) AS rn
      FROM ue u JOIN g{k - 1} p ON u.src = p.id
      GROUP BY u.dst, p.label
    ) t WHERE rn = 1
  ) v ON l.id = v.id)"""
        )
    parts.append(f"SELECT id, label FROM g{LPA_ROUNDS}")
    return "\n".join(parts)


# ------------------------------------------------------------------ triangles
def q_doc_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.triangles import triangle_count

    out = triangle_count(doc_graph(spark, sf_dir))
    return out.select("id", "triangles", F.round("coefficient", 5).alias("coefficient"))


_TRI_CTES = """
, tri AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM ce e1 JOIN ce e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b)
, corners AS (SELECT x AS id FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri)
, tcnt AS (SELECT id, COUNT(*) AS triangles FROM corners GROUP BY id)
, cdeg AS (SELECT id, COUNT(*) AS deg
           FROM (SELECT a AS id FROM ce UNION ALL SELECT b FROM ce) dd GROUP BY id)
, pernode AS (
  SELECT n.id,
         COALESCE(t.triangles, 0) AS triangles,
         CASE WHEN COALESCE(d.deg, 0) >= 2
              THEN CAST(2.0 AS DOUBLE) * COALESCE(t.triangles, 0) / (d.deg * (d.deg - 1))
              ELSE CAST(0.0 AS DOUBLE) END AS coefficient
  FROM nodes n LEFT JOIN tcnt t ON n.id = t.id LEFT JOIN cdeg d ON n.id = d.id)
"""


def sql_doc_triangles() -> str:
    return (
        _PROLOG
        + _TRI_CTES
        + "SELECT id, triangles, ROUND(coefficient, 5) AS coefficient FROM pernode"
    )


def q_doc_triangle_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.triangles import triangle_count

    per = triangle_count(doc_graph(spark, sf_dir))
    return per.agg(
        (F.sum("triangles") / 3).cast("long").alias("triangle_count"),
        F.round(F.avg("coefficient"), 5).alias("avg_coefficient"),
    )


def sql_doc_triangle_global() -> str:
    return (
        _PROLOG
        + _TRI_CTES
        + """SELECT CAST(SUM(triangles) / 3 AS BIGINT) AS triangle_count,
       ROUND(AVG(coefficient), 5) AS avg_coefficient
FROM pernode"""
    )


# -------------------------------------------------------------------- degree
def q_doc_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = doc_graph(spark, sf_dir)
    out_d = g.degrees(direction="OUTGOING").select(
        "id", F.col("degree").cast("long").alias("out_degree")
    )
    in_d = g.degrees(direction="INCOMING").select(
        "id", F.col("degree").cast("long").alias("in_degree")
    )
    return out_d.join(in_d, "id")


def sql_doc_degree() -> str:
    return (
        _PROLOG
        + """SELECT n.id, COALESCE(o.c, 0) AS out_degree, COALESCE(i.c, 0) AS in_degree
FROM nodes n
LEFT JOIN (SELECT src, COUNT(*) AS c FROM edges GROUP BY src) o ON n.id = o.src
LEFT JOIN (SELECT dst, COUNT(*) AS c FROM edges GROUP BY dst) i ON n.id = i.dst"""
    )


# --------------------------------------------------------------- linkpred
def q_doc_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.functions.linkprediction import link_prediction_scores

    g = doc_graph(spark, sf_dir)
    pairs = g.edges.select("src", "dst")
    return link_prediction_scores(g, pairs)


def sql_doc_linkpred() -> str:
    return (
        _PROLOG
        + """, deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS d FROM ue GROUP BY src)
, cn AS MATERIALIZED (
  SELECT e.src, e.dst, COUNT(*) AS c,
         ROUND(SUM(CAST(1.0 AS DOUBLE) / LN(zd.d)), 5) AS aa,
         ROUND(SUM(CAST(1.0 AS DOUBLE) / zd.d), 5) AS ra
  FROM edges e
  JOIN ue n1 ON n1.src = e.src
  JOIN ue n2 ON n2.src = e.dst AND n2.dst = n1.dst
  JOIN deg zd ON zd.id = n1.dst
  GROUP BY e.src, e.dst)
SELECT e.src, e.dst,
       COALESCE(cn.c, 0) AS common_neighbors,
       (ds.d + dd.d - COALESCE(cn.c, 0)) AS total_neighbors,
       COALESCE(cn.aa, CAST(0.0 AS DOUBLE)) AS adamic_adar,
       COALESCE(cn.ra, CAST(0.0 AS DOUBLE)) AS resource_allocation,
       ds.d * dd.d AS preferential_attachment
FROM edges e
JOIN deg ds ON ds.id = e.src
JOIN deg dd ON dd.id = e.dst
LEFT JOIN cn ON cn.src = e.src AND cn.dst = e.dst"""
    )


# --------------------------------------------------------- jaccard over events
def q_user_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.similarity import jaccard

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return jaccard(events, "user_id", "event_type", top_k=3).select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        "similarity",
    )


def sql_user_jaccard_topk() -> str:
    return """
WITH cats AS MATERIALIZED (SELECT DISTINCT user_id, event_type FROM events),
deg AS MATERIALIZED (SELECT user_id, COUNT(*) AS d FROM cats GROUP BY user_id),
inter AS (
  SELECT x.user_id AS a, y.user_id AS b, COUNT(*) AS i
  FROM cats x JOIN cats y ON x.event_type = y.event_type AND x.user_id <> y.user_id
  GROUP BY x.user_id, y.user_id),
scored AS (
  SELECT i.a, i.b,
         CAST(i.i AS DOUBLE) / (da.d + db.d - i.i) AS similarity,
         ROW_NUMBER() OVER (PARTITION BY i.a
                            ORDER BY CAST(i.i AS DOUBLE) / (da.d + db.d - i.i) DESC, i.b ASC) AS rn
  FROM inter i JOIN deg da ON da.user_id = i.a JOIN deg db ON db.user_id = i.b)
SELECT a, b, ROUND(similarity, 5) AS similarity FROM scored WHERE rn <= 3"""


# ------------------------------------------------------------- pipeline ops
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline.dedup import exact_duplicates

    return exact_duplicates(load_documents(spark, sf_dir))


def sql_dedup_exact() -> str:
    return """
SELECT md5(text) AS text_hash, COUNT(*) AS cnt, MIN(doc_id) AS rep_id
FROM documents GROUP BY md5(text)"""


def q_dedup_tokenset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline.dedup import tokenset_duplicates

    return tokenset_duplicates(load_documents(spark, sf_dir))


def sql_dedup_tokenset() -> str:
    return """
SELECT md5(array_to_string(list_sort(list_distinct(str_split(coalesce(text, ''), ' '))), ' '))
         AS tokenset_hash,
       COUNT(*) AS cnt, MIN(doc_id) AS rep_id
FROM documents
GROUP BY 1"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-style pre-tokenizer counts (regexp_extract_all,
    JVM-side; pattern restricted to Java-regex ∩ RE2 so the DuckDB oracle
    tokenizes identically)."""
    from linkgraph.pipeline.text import token_counts

    return token_counts(load_documents(spark, sf_dir))


def sql_token_counts() -> str:
    from linkgraph.pipeline.text import BPE_ISH_PATTERN

    return f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT) AS n_bpe_tokens
FROM documents"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline.text import token_stats

    return token_stats(load_documents(spark, sf_dir))


def sql_token_stats() -> str:
    return """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq_tokens
FROM documents"""


def q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline.text import quality_scores

    return quality_scores(load_documents(spark, sf_dir))


def sql_quality() -> str:
    return """
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a'))) AS BIGINT) AS stop_cnt,
         CAST(length(text) AS BIGINT) AS text_len
  FROM documents)
SELECT doc_id, n_tokens,
       ROUND(CAST(stop_cnt AS DOUBLE) / n_tokens, 5) AS stop_ratio,
       ROUND(CAST(text_len - (n_tokens - 1) AS DOUBLE) / n_tokens, 5) AS avg_token_len
FROM t"""


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline.text import language_id

    return language_id(load_documents(spark, sf_dir))


def sql_langid() -> str:
    return """
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a'))) AS DOUBLE)
           / len(string_split(text, ' ')) AS r
  FROM documents)
SELECT doc_id,
       CASE WHEN r >= 0.09 THEN 'en_high' WHEN r >= 0.05 THEN 'en_med' ELSE 'en_low' END AS pred_lang
FROM t"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline.text import fingerprint

    return fingerprint(load_documents(spark, sf_dir))


def sql_fingerprint() -> str:
    return "SELECT doc_id, substr(md5(text), 1, 16) AS fp16 FROM documents"


def _planted_pii_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with deterministically PLANTED PII (the synthetic corpus
    has none) so the pii_scan oracle is non-vacuous — same planted-fixture
    pattern as emb_near_dup. The identical augmentation is expressed in
    SQL inside sql_pii_scan."""
    d = load_documents(spark, sf_dir)
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" reach user"), F.col("doc_id"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" from 192.168."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                (F.col("doc_id") % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                (100 + F.col("doc_id") % 900).cast("string"),
                F.lit("-"),
                (1000 + F.col("doc_id") % 9000).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    return d.select("doc_id", "lang", aug.alias("text"))


_PII_PLANT_SQL = """
  SELECT doc_id,
         lang,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' reach user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' from 192.168.' || (doc_id % 256) || '.' || (doc_id % 100)
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' call +1-555-' || (100 + doc_id % 900) || '-' || (1000 + doc_id % 9000)
                 ELSE '' END AS text
  FROM documents"""


def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII counts (email/IPv4/phone regexp_count, zero-shuffle
    JVM codegen) over deterministically planted fixtures."""
    from linkgraph.pipeline.text import pii_scan

    return pii_scan(_planted_pii_text(spark, sf_dir))


def sql_pii_scan() -> str:
    from linkgraph.pipeline.text import PII_PATTERNS

    e, i, p = PII_PATTERNS["email"], PII_PATTERNS["ipv4"], PII_PATTERNS["phone"]
    return f"""
WITH planted AS ({_PII_PLANT_SQL})
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{e}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{i}')) AS BIGINT) AS n_ipv4,
       CAST(len(regexp_extract_all(text, '{p}')) AS BIGINT) AS n_phones,
       len(regexp_extract_all(text, '{e}')) + len(regexp_extract_all(text, '{i}'))
         + len(regexp_extract_all(text, '{p}')) > 0 AS has_pii
FROM planted"""


def q_ngram_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document word-bigram repetition ratio (Gopher-style
    boilerplate signal) — row-local higher-order array ops, zero shuffle."""
    from linkgraph.pipeline.text import ngram_repetition

    return ngram_repetition(load_documents(spark, sf_dir), n=2)


def sql_ngram_repetition(n: int = 2) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {n}
              THEN list_transform(range(1, len(t) - {n} + 2),
                                  i -> array_to_string(t[i:i+{n}-1], ' '))
              ELSE [] END AS g
  FROM toks)
SELECT doc_id,
       CAST(len(g) AS BIGINT) AS n_grams,
       CAST(len(list_distinct(g)) AS BIGINT) AS n_uniq_grams,
       CASE WHEN len(g) > 0
            THEN ROUND(1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g), 5)
            ELSE 0.0 END AS dup_ratio
FROM grams"""


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination check: distinct word-3-gram overlap of
    every candidate doc (doc_id % 20 != 0) against the 'benchmark' slice
    (doc_id % 20 = 0). Benchmark grams are broadcast — eval sets are MBs
    at any corpus scale."""
    from linkgraph.pipeline.text import benchmark_contamination

    docs = load_documents(spark, sf_dir)
    return benchmark_contamination(
        docs.filter(F.col("doc_id") % 20 != 0),
        docs.filter(F.col("doc_id") % 20 == 0),
        n=3,
    )


def sql_contamination(n: int = 3) -> str:
    gram_cte = f"""
  SELECT doc_id,
         unnest(list_distinct(
           CASE WHEN len(t) >= {n}
                THEN list_transform(range(1, len(t) - {n} + 2),
                                    i -> array_to_string(t[i:i+{n}-1], ' '))
                ELSE [] END)) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)"""
    return f"""
WITH all_grams AS MATERIALIZED ({gram_cte}),
doc_grams AS (SELECT * FROM all_grams WHERE doc_id % 20 != 0),
bench_grams AS (SELECT DISTINCT gram FROM all_grams WHERE doc_id % 20 = 0),
per_doc AS (
  SELECT d.doc_id,
         COUNT(*) AS n_uniq_grams,
         COUNT(b.gram) AS n_contaminated
  FROM doc_grams d LEFT JOIN bench_grams b ON d.gram = b.gram
  GROUP BY d.doc_id)
SELECT doc_id,
       CAST(COALESCE(n_uniq_grams, 0) AS BIGINT) AS n_uniq_grams,
       CAST(COALESCE(n_contaminated, 0) AS BIGINT) AS n_contaminated,
       CASE WHEN COALESCE(n_uniq_grams, 0) > 0
            THEN ROUND(CAST(n_contaminated AS DOUBLE) / n_uniq_grams, 5)
            ELSE 0.0 END AS contamination_ratio
FROM (SELECT doc_id FROM documents WHERE doc_id % 20 != 0) base
LEFT JOIN per_doc USING (doc_id)"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source quota sample (data-mixing primitive):
    top-10 docs per source by md5(doc_id) — content-independent
    pseudo-random, identical in both engines."""
    from linkgraph.pipeline.text import stratified_sample

    return stratified_sample(load_documents(spark, sf_dir), "source", 10)


def sql_stratified_sample(per_stratum: int = 10) -> str:
    return f"""
SELECT doc_id, source, sample_rank FROM (
  SELECT doc_id, source,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS INT)
           AS sample_rank
  FROM documents)
WHERE sample_rank <= {per_stratum}"""


_GATE_PARAMS = dict(min_tokens=20, max_dup_ratio=0.5, langs=("en", "fr"))


def q_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed keep/drop funnel (first-failing-rule semantics:
    too_few_tokens → too_repetitive → bad_lang → has_pii) over the
    planted-PII corpus — zero-shuffle column expressions."""
    from linkgraph.pipeline.text import quality_gate

    return quality_gate(_planted_pii_text(spark, sf_dir), **_GATE_PARAMS)


def sql_quality_gate() -> str:
    from linkgraph.pipeline.text import PII_PATTERNS

    pii = " + ".join(
        f"len(regexp_extract_all(text, '{p}'))" for p in PII_PATTERNS.values()
    )
    mt, mdr = _GATE_PARAMS["min_tokens"], _GATE_PARAMS["max_dup_ratio"]
    langs = ", ".join(f"'{l}'" for l in _GATE_PARAMS["langs"])
    return f"""
WITH planted AS ({_PII_PLANT_SQL}),
feats AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 2
              THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
              ELSE 0.0 END AS dup_ratio,
         len(t) AS n_tokens, lang, {pii} AS pii
  FROM (SELECT *, string_split(text, ' ') AS t,
               CASE WHEN len(string_split(text, ' ')) >= 2
                    THEN list_transform(range(1, len(string_split(text, ' '))),
                                        i -> array_to_string(string_split(text, ' ')[i:i+1], ' '))
                    ELSE [] END AS g
        FROM planted)),
decided AS (
  SELECT doc_id,
         CASE WHEN n_tokens < {mt} THEN 'too_few_tokens'
              WHEN dup_ratio > {mdr} THEN 'too_repetitive'
              WHEN lang NOT IN ({langs}) THEN 'bad_lang'
              WHEN pii > 0 THEN 'has_pii'
              ELSE '' END AS fail_reason
  FROM feats)
SELECT doc_id, fail_reason = '' AS keep, fail_reason FROM decided"""


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per doc: token-keyed df join (never broadcast at
    corpus scale) + per-doc top-k window."""
    from linkgraph.pipeline.text import tfidf_topk

    return tfidf_topk(load_documents(spark, sf_dir), k=5)


def sql_tfidf_topk(k: int = 5) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, token,
         tf * (ln((n_docs + 1) / (df + 1.0)) + 1.0) AS t
  FROM tf JOIN df USING (token) CROSS JOIN n)
SELECT doc_id, token, ROUND(t, 4) AS tfidf, rk FROM (
  SELECT doc_id, token, t,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY t DESC, token ASC) AS INT) AS rk
  FROM scored)
WHERE rk <= {k}"""


def q_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(source, lang) corpus mixture report — one partial-aggregated
    groupBy."""
    from linkgraph.pipeline.text import mix_report

    return mix_report(load_documents(spark, sf_dir))


def sql_mix_report() -> str:
    return """
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(SUM(len(text)) AS BIGINT) AS n_chars,
       ROUND(AVG(len(string_split(text, ' '))), 5) AS avg_tokens
FROM documents GROUP BY source, lang"""


def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus boilerplate-span removal (C4-style): disjoint 5-token
    blocks occurring in ≥ 3 distinct docs are dropped; text reassembled
    in order."""
    from linkgraph.pipeline.dedup import remove_boilerplate_spans

    return remove_boilerplate_spans(load_documents(spark, sf_dir), n=5, min_df=3)


def sql_boilerplate(n: int = 5, min_df: int = 3) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents),
blocks AS (
  SELECT doc_id, j,
         array_to_string(t[(j-1)*{n}+1 : least(j*{n}, len(t))], ' ') AS b
  FROM (SELECT doc_id, t,
               unnest(range(1, CAST(ceil(len(t) / {n}.0) AS INT) + 1)) AS j
        FROM toks)),
bdf AS (SELECT b, COUNT(DISTINCT doc_id) AS bdf FROM blocks GROUP BY b),
tagged AS (
  SELECT doc_id, j, blocks.b, bdf.bdf >= {min_df} AS boiler
  FROM blocks JOIN bdf USING (b)),
rebuilt AS (
  SELECT doc_id,
         string_agg(CASE WHEN NOT boiler THEN b END, ' ' ORDER BY j) AS clean_text,
         COUNT(*) AS n_blocks,
         SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS n_removed
  FROM tagged GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(clean_text, '') AS clean_text,
       CAST(COALESCE(n_blocks, 0) AS BIGINT) AS n_blocks,
       CAST(COALESCE(n_removed, 0) AS BIGINT) AS n_removed
FROM (SELECT doc_id FROM documents) d LEFT JOIN rebuilt USING (doc_id)"""


def q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (k=4 token grams, window 5, md5-hex
    minima) — row-local higher-order ops + one explode."""
    from linkgraph.pipeline.text import winnow_fingerprints

    return winnow_fingerprints(load_documents(spark, sf_dir), k=4, w=5)


def sql_winnow(k: int = 4, w: int = 5) -> str:
    return f"""
WITH grams AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {k}
              THEN list_transform(range(1, len(t) - {k} + 2),
                                  i -> md5(array_to_string(t[i:i+{k}-1], ' ')))
              ELSE [] END AS g
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)),
fps AS (
  SELECT doc_id,
         CASE WHEN len(g) >= {w}
              THEN list_transform(range(1, len(g) - {w} + 2),
                                  j -> list_aggregate(g[j:j+{w}-1], 'min'))
              WHEN len(g) > 0 THEN [list_aggregate(g, 'min')]
              ELSE [] END AS f
  FROM grams)
SELECT doc_id, unnest(list_distinct(f)) AS fp FROM fps"""


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL random projection 64 → 8 dims, wide shape — seed-deterministic
    literal matrix folded into the plan, one zip_with/aggregate dot per
    output dim, zero shuffle."""
    from linkgraph.pipeline.embed import random_projection_wide

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return random_projection_wide(emb, out_dim=8, seed=42)


def sql_random_projection(out_dim: int = 8, seed: int = 42, in_dim: int = 64) -> str:
    from linkgraph.pipeline.embed import _projection_matrix

    mat = _projection_matrix(in_dim, out_dim, seed)
    cols = ",\n       ".join(
        "ROUND(list_dot_product(e, ["
        + ", ".join(repr(float(c)) for c in row)
        + f"]), 4) AS d{j}"
        for j, row in enumerate(mat)
    )
    return (
        _EMB_V
        + f"""
SELECT vec_id,
       {cols}
FROM v"""
    )


def q_emb_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA 64 → 8: covariance from per-partition Arrow partial
    sums, driver d×d eigendecomposition, JVM-literal projection. No SQL
    oracle (eigendecomposition); numpy parity golden in
    tests/test_pipeline.py."""
    from linkgraph.pipeline.embed import pca_project

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pca_project(emb, n_components=8)


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event sessionization (30-min inactivity gap) via the native
    session_window aggregate — one shuffle on user_id, batch/stream-
    identical semantics. Oracle: gaps-and-islands window SQL."""
    from linkgraph.pipeline.sessions import sessionize

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return sessionize(events, gap="30 minutes").select(
        F.col("user_id").cast("long").alias("user_id"),
        "start_s",
        "end_s",
        "n_events",
        "total_value",
    )


def sql_sessionize(gap_seconds: int = 1800) -> str:
    # `>` matches Spark session_window's boundary semantics, verified
    # empirically (tests/test_advice_r4.py): an event exactly gap seconds
    # after its predecessor MERGES into the session (touching windows
    # [t, t+gap) and [t+gap, ...) are merged), so only diff > gap splits
    return f"""
WITH flagged AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > {gap_seconds}
              THEN 1 ELSE 0 END AS nf
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, ts, value,
         SUM(nf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged)
SELECT CAST(user_id AS BIGINT) AS user_id,
       MIN(epoch(ts)) AS start_s,
       MAX(epoch(ts)) AS end_s,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(value), 2) AS total_value
FROM sess GROUP BY user_id, sid"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing layout (seq_len=512) via a
    distributed prefix sum (deterministic id-range buckets + per-bucket
    window + driver prefix over bucket totals). Oracle: one global
    cumulative-sum window (fine in DuckDB at oracle scale; the Spark plan
    is the one that must never do that)."""
    from linkgraph.pipeline.sessions import pack_sequences

    return pack_sequences(load_documents(spark, sf_dir), seq_len=512)


def sql_pack_sequences(seq_len: int = 512) -> str:
    return f"""
WITH t AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_offset
  FROM t)
SELECT doc_id, n_tokens, start_offset,
       CAST(start_offset // {seq_len} AS BIGINT) AS first_seq,
       CAST((start_offset + n_tokens - 1) // {seq_len} AS BIGINT) AS last_seq
FROM c"""


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM fluency score per document (add-0.5
    smoothing) — the CCNet/KenLM-style quality signal. Train + score in
    one declarative plan."""
    from linkgraph.pipeline.text import lm_score

    return lm_score(load_documents(spark, sf_dir))


def sql_lm_score(k: float = 0.5) -> str:
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
idx AS (
  SELECT doc_id, UNNEST(range(1, len(tk))) AS i, tk
  FROM t WHERE len(tk) >= 2),
bg AS (SELECT doc_id, tk[i] AS prev, tk[i + 1] AS w FROM idx),
big AS (SELECT prev, w, COUNT(*) AS c2 FROM bg GROUP BY prev, w),
uni AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
unic AS (SELECT tok, COUNT(*) AS c1 FROM uni GROUP BY tok),
v AS (SELECT COUNT(DISTINCT tok) AS nv FROM uni)
SELECT CAST(bg.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       ROUND(AVG(ln((c2 + {k}) / (c1 + {k} * v.nv))), 4) AS avg_logprob
FROM bg JOIN big USING (prev, w) JOIN unic ON bg.prev = unic.tok, v
GROUP BY bg.doc_id"""


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 Okapi BM25 terms per doc (Lucene idf variant)."""
    from linkgraph.pipeline.text import bm25_topk

    return bm25_topk(load_documents(spark, sf_dir), k=5)


def sql_bm25_topk(k: int = 5, k1: float = 1.2, b: float = 0.75) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
tf AS (SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY 1),
df AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM toks GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
ad AS (SELECT AVG(dl) AS avgdl FROM dl),
scored AS (
  SELECT tf.doc_id, tf.token,
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * ({k1} + 1.0))
           / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl)) AS s
  FROM tf JOIN df USING (token) JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN n CROSS JOIN ad)
SELECT doc_id, token, ROUND(s, 4) AS bm25, rk FROM (
  SELECT doc_id, token, s,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY s DESC, token ASC) AS INT) AS rk
  FROM scored)
WHERE rk <= {k}"""


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail fluency buckets by exact avg-logprob
    quantiles of the corpus bigram LM score."""
    from linkgraph.pipeline.text import perplexity_buckets

    return perplexity_buckets(load_documents(spark, sf_dir))


def sql_perplexity_buckets(k: float = 0.5) -> str:
    lo, hi = 1.0 / 3.0, 2.0 / 3.0
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
idx AS (
  SELECT doc_id, UNNEST(range(1, len(tk))) AS i, tk
  FROM t WHERE len(tk) >= 2),
bg AS (SELECT doc_id, tk[i] AS prev, tk[i + 1] AS w FROM idx),
big AS (SELECT prev, w, COUNT(*) AS c2 FROM bg GROUP BY prev, w),
uni AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
unic AS (SELECT tok, COUNT(*) AS c1 FROM uni GROUP BY tok),
v AS (SELECT COUNT(DISTINCT tok) AS nv FROM uni),
scored AS (
  SELECT CAST(bg.doc_id AS BIGINT) AS doc_id,
         ROUND(AVG(ln((c2 + {k}) / (c1 + {k} * v.nv))), 4) AS avg_logprob
  FROM bg JOIN big USING (prev, w) JOIN unic ON bg.prev = unic.tok, v
  GROUP BY bg.doc_id),
cuts AS (SELECT quantile_cont(avg_logprob, {lo}) AS c_lo,
                quantile_cont(avg_logprob, {hi}) AS c_hi FROM scored)
SELECT doc_id, avg_logprob,
       CASE WHEN avg_logprob >= c_hi THEN 'head'
            WHEN avg_logprob >= c_lo THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored, cuts"""


def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based training-mixture sampling weights per source
    (weight ∝ n^0.7, normalized — the standard multi-source rebalancing
    rule)."""
    from linkgraph.pipeline.text import mixture_weights

    return mixture_weights(load_documents(spark, sf_dir), "source", alpha=0.7)


def sql_mixture_weights(alpha: float = 0.7) -> str:
    return f"""
WITH g AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
  GROUP BY source),
s AS (SELECT SUM(POWER(n_docs, {alpha})) AS z FROM g)
SELECT g.source, g.n_docs,
       ROUND(POWER(g.n_docs, {alpha}) / s.z, 6) AS weight
FROM g, s"""


def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phi-heavy tokens via Misra-Gries candidates + exact verify —
    only candidate tokens ever shuffle."""
    from linkgraph.pipeline.sketch import heavy_hitters

    return heavy_hitters(load_documents(spark, sf_dir), phi=0.02)


def sql_token_heavy_hitters(phi: float = 0.02) -> str:
    return f"""
WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
tot AS (SELECT COUNT(*) AS n_total FROM toks)
SELECT token, CAST(COUNT(*) AS BIGINT) AS count
FROM toks, tot
GROUP BY token, tot.n_total
HAVING COUNT(*) >= {phi} * tot.n_total"""


def q_doc_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.graphstats import reciprocity

    return reciprocity(doc_edges(spark, sf_dir))


def sql_doc_reciprocity() -> str:
    return (
        _PROLOG
        + """
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT)
        FROM edges e JOIN edges r ON e.src = r.dst AND e.dst = r.src) AS n_reciprocal,
       ROUND((SELECT CAST(COUNT(*) AS DOUBLE)
              FROM edges e JOIN edges r ON e.src = r.dst AND e.dst = r.src)
             / (SELECT COUNT(*) FROM edges), 6) AS reciprocity"""
    )


def q_doc_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.graphstats import degree_assortativity

    return degree_assortativity(doc_edges(spark, sf_dir))


def sql_doc_assortativity() -> str:
    return (
        _PROLOG
        + """
, od AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
idg AS (SELECT dst, COUNT(*) AS idg FROM edges GROUP BY dst)
SELECT ROUND(CORR(CAST(od.od AS DOUBLE), CAST(idg.idg AS DOUBLE)), 6) AS assortativity
FROM edges e JOIN od ON e.src = od.src JOIN idg ON e.dst = idg.dst"""
    )


HITS_ITERS = 8


def q_doc_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.hits import hits

    out = hits(doc_graph(spark, sf_dir), max_iterations=HITS_ITERS)
    return out.select(
        "id", F.round("hub", 5).alias("hub"), F.round("authority", 5).alias("authority")
    )


def sql_doc_hits() -> str:
    """Unrolled Kleinberg iteration: per round, authority = L1-normalized
    in-sum of hubs, hub = L1-normalized out-sum of the new authorities
    (both scaled to sum = n, matching hits()'s convention)."""
    parts = [_PROLOG]
    parts.append(", h0 AS MATERIALIZED (SELECT id, CAST(1.0 AS DOUBLE) AS hub FROM nodes)")
    for k in range(1, HITS_ITERS + 1):
        parts.append(
            f""", a{k}n AS MATERIALIZED (
  SELECT n.id, COALESCE(r.s, CAST(0.0 AS DOUBLE)) AS raw
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id, SUM(h.hub) AS s
    FROM edges e JOIN h{k - 1} h ON e.src = h.id GROUP BY e.dst
  ) r ON n.id = r.id)
, a{k} AS MATERIALIZED (
  SELECT id, CASE WHEN t.t > 0
    THEN raw * CAST((SELECT n FROM nn) AS DOUBLE) / t.t
    ELSE CAST(0.0 AS DOUBLE) END AS authority
  FROM a{k}n, (SELECT SUM(raw) AS t FROM a{k}n) t)
, h{k}n AS MATERIALIZED (
  SELECT n.id, COALESCE(r.s, CAST(0.0 AS DOUBLE)) AS raw
  FROM nodes n LEFT JOIN (
    SELECT e.src AS id, SUM(a.authority) AS s
    FROM edges e JOIN a{k} a ON e.dst = a.id GROUP BY e.src
  ) r ON n.id = r.id)
, h{k} AS MATERIALIZED (
  SELECT id, CASE WHEN t.t > 0
    THEN raw * CAST((SELECT n FROM nn) AS DOUBLE) / t.t
    ELSE CAST(0.0 AS DOUBLE) END AS hub
  FROM h{k}n, (SELECT SUM(raw) AS t FROM h{k}n) t)"""
        )
    parts.append(
        f"""SELECT h.id, ROUND(h.hub, 5) AS hub, ROUND(a.authority, 5) AS authority
FROM h{HITS_ITERS} h JOIN a{HITS_ITERS} a ON h.id = a.id"""
    )
    return "\n".join(parts)


# k=3 (every edge in ≥1 triangle, closed) — k=4 is vacuous on the sparse
# synthetic doc graph (avg degree ~8 pseudo-random edges: no edge closes
# two triangles after peeling), and a 0-row oracle proves nothing
TRUSS_K = 3
TRUSS_ROUNDS = 8


def q_doc_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.ktruss import k_truss

    return k_truss(doc_graph(spark, sf_dir), k=TRUSS_K, max_rounds=TRUSS_ROUNDS)


def sql_doc_ktruss() -> str:
    """Synchronous truss peel, unrolled: each round enumerates triangles
    over the surviving canonical edges, counts per-edge support, deletes
    edges below k−2. Deletions are monotone and both engines run the same
    fixed round count, so the edge sets agree round-for-round at any
    scale (same design as the k-core oracle)."""
    k2 = TRUSS_K - 2

    def tri_sup(src: str, r: str) -> str:
        return f""", t{r} AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM {src} e1 JOIN {src} e2 ON e1.a = e2.a AND e1.b < e2.b
  JOIN {src} e3 ON e3.a = e1.b AND e3.b = e2.b)
, s{r} AS MATERIALIZED (
  SELECT a, b, COUNT(*) AS sup FROM (
    SELECT x AS a, y AS b FROM t{r}
    UNION ALL SELECT x AS a, z AS b FROM t{r}
    UNION ALL SELECT y AS a, z AS b FROM t{r}) u GROUP BY a, b)"""

    parts = [_PROLOG, ", e0 AS MATERIALIZED (SELECT a, b FROM ce)"]
    for r in range(1, TRUSS_ROUNDS + 1):
        parts.append(tri_sup(f"e{r - 1}", str(r)))
        parts.append(
            f""", e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM e{r - 1} e JOIN s{r} s ON e.a = s.a AND e.b = s.b
  WHERE s.sup >= {k2})"""
        )
    parts.append(tri_sup(f"e{TRUSS_ROUNDS}", "f"))
    parts.append(
        f"""SELECT e.a AS src, e.b AS dst,
       CAST(COALESCE(s.sup, 0) AS BIGINT) AS support
FROM e{TRUSS_ROUNDS} e LEFT JOIN sf s ON e.a = s.a AND e.b = s.b"""
    )
    return "\n".join(parts)


def q_doc_source_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.coarsen import contract_edges

    docs = load_documents(spark, sf_dir)
    mapping = docs.select(F.col("doc_id").cast("long").alias("id"), F.col("source"))
    return contract_edges(
        doc_edges(spark, sf_dir), mapping, id_col="id", group_col="source"
    ).select("src_group", "dst_group", "n_edges", F.round("weight", 6).alias("weight"))


def sql_doc_source_graph() -> str:
    return (
        _PROLOG
        + """
SELECT d1.source AS src_group, d2.source AS dst_group,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       ROUND(CAST(COUNT(*) AS DOUBLE), 6) AS weight
FROM edges e
JOIN documents d1 ON e.src = d1.doc_id
JOIN documents d2 ON e.dst = d2.doc_id
WHERE d1.source <> d2.source
GROUP BY 1, 2"""
    )


SRC_PR_ITERS = 10


def q_source_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite: contract the doc graph to source level, then WEIGHTED
    PageRank over the contracted multigraph (weight = collapsed edge
    count) — the page→host→host-rank ladder of web link analysis."""
    from linkgraph.algorithms.coarsen import contract_edges
    from linkgraph.algorithms.pagerank import PageRank

    from linkgraph.graph import Graph

    docs = load_documents(spark, sf_dir)
    mapping = docs.select(
        F.col("doc_id").cast("long").alias("id"),
        F.regexp_extract("source", r"(\d+)", 1).cast("long").alias("sid"),
    )
    ce = contract_edges(
        doc_edges(spark, sf_dir), mapping, id_col="id", group_col="sid"
    ).select(
        F.col("src_group").alias("src"),
        F.col("dst_group").alias("dst"),
        F.col("weight"),
    )
    nodes = mapping.select(F.col("sid").alias("id")).distinct()
    g = Graph.from_edges(ce, nodes=nodes)
    ranks = PageRank(
        damping=DAMPING, max_iterations=SRC_PR_ITERS, weighted=True, strategy="csr"
    ).run(g)
    return ranks.select(
        F.col("id").alias("source_id"), F.round("rank", 5).alias("rank")
    )


def sql_source_pagerank() -> str:
    parts = [_PROLOG]
    parts.append(
        """, smap AS MATERIALIZED (
  SELECT doc_id, CAST(regexp_extract(source, '(\\d+)', 1) AS BIGINT) AS sid
  FROM documents)
, sedges AS MATERIALIZED (
  SELECT m1.sid AS src, m2.sid AS dst, CAST(COUNT(*) AS DOUBLE) AS w
  FROM edges e JOIN smap m1 ON e.src = m1.doc_id
               JOIN smap m2 ON e.dst = m2.doc_id
  WHERE m1.sid <> m2.sid GROUP BY 1, 2)
, snodes AS (SELECT DISTINCT sid AS id FROM smap)
, swsum AS MATERIALIZED (SELECT src, SUM(w) AS wsum FROM sedges GROUP BY src)
, sr0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM snodes)"""
    )
    for k in range(1, SRC_PR_ITERS + 1):
        parts.append(
            f""", sr{k} AS MATERIALIZED (
  SELECT n.id, {_ONE_MINUS_D} + {_D} * COALESCE(c.s, CAST(0.0 AS DOUBLE)) AS rank
  FROM snodes n LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank * e.w / o.wsum) AS s
    FROM sedges e JOIN sr{k - 1} r ON e.src = r.id JOIN swsum o ON e.src = o.src
    GROUP BY e.dst
  ) c ON n.id = c.id)"""
        )
    parts.append(
        f"SELECT id AS source_id, ROUND(rank, 5) AS rank FROM sr{SRC_PR_ITERS}"
    )
    return "\n".join(parts)


def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.graphstats import degree_histogram

    return degree_histogram(doc_edges(spark, sf_dir))


def sql_degree_histogram() -> str:
    return (
        _PROLOG
        + """
, od AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)
SELECT CAST(LENGTH(BIN(d)) - 1 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(MIN(d) AS BIGINT) AS min_degree,
       CAST(MAX(d) AS BIGINT) AS max_degree
FROM od GROUP BY 1"""
    )


PMI_K = 100
PMI_MIN_DF = 5


def q_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline.cooccur import pmi_topk

    return pmi_topk(load_documents(spark, sf_dir), k=PMI_K, min_df=PMI_MIN_DF)


def sql_pmi_topk() -> str:
    return f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
dtok AS MATERIALIZED (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) u
  WHERE tok <> ''),
band AS MATERIALIZED (
  SELECT tok, COUNT(*) AS df FROM dtok GROUP BY tok HAVING COUNT(*) >= {PMI_MIN_DF}),
dt AS MATERIALIZED (
  SELECT d.doc_id, d.tok, b.df FROM dtok d JOIN band b ON d.tok = b.tok),
pairs AS (
  SELECT x.tok AS tok_a, y.tok AS tok_b, x.df AS n_a, y.df AS n_b,
         COUNT(*) AS n_ab
  FROM dt x JOIN dt y ON x.doc_id = y.doc_id AND x.tok < y.tok
  GROUP BY 1, 2, 3, 4)
SELECT tok_a, tok_b,
       CAST(n_ab AS BIGINT) AS n_ab,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       ROUND(LN(CAST(n_ab AS DOUBLE) * (SELECT n FROM nn)
                / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 5) AS pmi
FROM pairs
ORDER BY pmi DESC, tok_a, tok_b
LIMIT {PMI_K}"""


def q_session_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-session item graph: unordered event-type pairs counted by the
    number of 30-minute sessions containing both — the behavior-log edge
    miner. Row-local pair expansion over each session's sorted distinct
    item set; no joins."""
    from linkgraph.pipeline.sessions import session_cooccurrence

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return session_cooccurrence(events, gap="30 minutes", k=100)


def sql_session_cooccurrence(gap_seconds: int = 1800) -> str:
    # `>` = session_window's touching-windows-merge rule (see sql_sessionize)
    return f"""
WITH flagged AS (
  SELECT user_id, ts, event_type, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > {gap_seconds}
              THEN 1 ELSE 0 END AS nf
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, event_type,
         SUM(nf) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged),
st AS MATERIALIZED (SELECT DISTINCT user_id, sid, event_type FROM sess),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM st a JOIN st b
    ON a.user_id = b.user_id AND a.sid = b.sid AND a.event_type < b.event_type)
SELECT type_a, type_b, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM pairs GROUP BY 1, 2
ORDER BY n_sessions DESC, type_a, type_b
LIMIT 100"""


CHUNK_TOKENS = 8
CHUNK_STRIDE = 6


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-window document chunking with overlap (chunk=8 tokens,
    stride=6 — the RAG/pretraining chunker). Pure row-local codegen:
    split once, sequence of starts, slice per window, one explode."""
    from linkgraph.pipeline.sessions import chunk_documents

    return chunk_documents(
        load_documents(spark, sf_dir),
        chunk_tokens=CHUNK_TOKENS,
        stride=CHUNK_STRIDE,
    )


def sql_chunk_documents() -> str:
    c, s = CHUNK_TOKENS, CHUNK_STRIDE
    return f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '') AS l
  FROM documents),
st AS (
  SELECT doc_id, l, unnest(range(0, CAST(len(l) AS BIGINT), {s})) AS s FROM t)
SELECT doc_id, CAST(s // {s} AS INTEGER) AS chunk_idx,
       CAST(len(list_slice(l, CAST(s+1 AS BIGINT), CAST(s+{c} AS BIGINT))) AS BIGINT) AS n_chunk_tokens,
       array_to_string(list_slice(l, CAST(s+1 AS BIGINT), CAST(s+{c} AS BIGINT)), ' ') AS chunk_text
FROM st
WHERE len(list_slice(l, CAST(s+1 AS BIGINT), CAST(s+{c} AS BIGINT))) >= 1"""


KNNC_N = 300
KNNC_K = 3
KNNC_ROUNDS = 14


def q_emb_knn_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end embedding clustering: brute-force cosine kNN graph
    (k=3 over the first 300 vectors) -> symmetrize -> distributed WCC.
    The full composition is SQL-replayable (ROW_NUMBER kNN + unrolled
    hash-min pointer jumping), so the ORACLE checks the pipeline end to
    end — the 100 TB variant swaps the brute-force front for IVF/LSH
    candidates, identical tail."""
    from linkgraph.algorithms.wcc import wcc
    from linkgraph.graph import Graph
    from linkgraph.pipeline.ann import cosine_topk_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < KNNC_N
    )
    knn = cosine_topk_bruteforce(emb, emb, k=KNNC_K)
    edges = (
        knn.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(knn.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    nodes = emb.select(F.col("vec_id").alias("id"))
    return wcc(Graph.from_edges(edges, nodes=nodes)).select("id", "component")


def sql_emb_knn_components() -> str:
    parts = [
        f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings WHERE vec_id < {KNNC_N}),
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         ROUND(list_dot_product(a.e, b.e) /
               (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 4) AS cosine
  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
knn AS MATERIALIZED (
  SELECT a, b FROM (
    SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a ORDER BY cosine DESC, b ASC) AS rn
    FROM pairs) WHERE rn <= {KNNC_K}),
ke AS MATERIALIZED (SELECT a AS src, b AS dst FROM knn UNION SELECT b, a FROM knn),
l0 AS (SELECT vec_id AS id, vec_id AS comp FROM v)"""
    ]
    for k in range(1, KNNC_ROUNDS + 1):
        parts.append(
            f""", m{k} AS MATERIALIZED (
  SELECT l.id, LEAST(l.comp, COALESCE(nm.nmin, l.comp)) AS comp
  FROM l{k - 1} l LEFT JOIN (
    SELECT u.dst AS id, MIN(p.comp) AS nmin FROM ke u JOIN l{k - 1} p ON u.src = p.id GROUP BY u.dst
  ) nm ON l.id = nm.id)
, l{k} AS MATERIALIZED (
  SELECT m.id, COALESCE(p2.comp, m.comp) AS comp
  FROM m{k} m LEFT JOIN m{k} p2 ON m.comp = p2.id)"""
        )
    parts.append(f"SELECT id, comp AS component FROM l{KNNC_ROUNDS}")
    return "\n".join(parts)


def q_emb_knn_components_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB tail of emb_knn_components, actually wired: IVF-bucketed
    kNN front (train on a bounded sample, nprobe=4 multi-probe — per-query
    scan cost is nprobe/num_cells of the corpus instead of all of it) ->
    symmetrize -> distributed WCC. Rows-only contract entry (k-means
    training is not SQL-expressible); component agreement vs the brute
    front is golden-tested on planted clusters
    (tests/test_pipeline.py::test_knn_components_ivf_agreement)."""
    from linkgraph.algorithms.wcc import wcc
    from linkgraph.graph import Graph
    from linkgraph.pipeline.ann import cosine_topk_ivf, train_ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < KNNC_N
    )
    cents = train_ivf_centroids(emb, num_cells=8, seed=42)
    knn = cosine_topk_ivf(emb, emb, cents, k=KNNC_K, nprobe=4)
    edges = (
        knn.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(knn.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    nodes = emb.select(F.col("vec_id").alias("id"))
    return wcc(Graph.from_edges(edges, nodes=nodes)).select("id", "component")


def q_doc_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral node embedding (orthogonal iteration on the normalized
    adjacency, k=2) — the Ng-Jordan-Weiss clustering basis. Rows-only
    (eigendecomposition is not SQL-expressible); numpy subspace-parity
    goldens in tests/test_spectral.py."""
    from linkgraph.algorithms.spectral import spectral_embedding

    g = doc_graph(spark, sf_dir)
    emb = spectral_embedding(g, k=2, max_iterations=40)
    return emb.select(
        "id", F.transform("vec", lambda x: F.round(x, 6)).alias("vec")
    )


CM_DEPTH = 4
CM_WIDTH = 64  # deliberately small at test scale so collisions exercise the min
CM_K = 50


def q_cm_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch token-count estimates (Cormode-Muthukrishnan):
    bounded d x w counter state regardless of vocabulary, cell-wise
    mergeable, never undercounts. Cross-engine md5 cell hash, so the
    oracle replays sketch build + point queries exactly."""
    from linkgraph.pipeline.sketch import count_min_token_counts

    return count_min_token_counts(
        load_documents(spark, sf_dir), depth=CM_DEPTH, width=CM_WIDTH, k=CM_K
    )


def sql_cm_token_counts() -> str:
    rows = ", ".join(str(r) for r in range(CM_DEPTH))
    return f"""
WITH toks AS MATERIALIZED (
  SELECT tok FROM (
    SELECT unnest(string_split(text, ' ')) AS tok FROM documents) u
  WHERE tok <> ''),
cells AS MATERIALIZED (
  SELECT r,
         CAST(concat('0x', substr(md5(tok || ':' || CAST(r AS VARCHAR)), 1, 15)) AS BIGINT)
           % {CM_WIDTH} AS c
  FROM toks, unnest([{rows}]) AS t(r)),
sketch AS MATERIALIZED (
  SELECT r, c, CAST(COUNT(*) AS BIGINT) AS n FROM cells GROUP BY r, c),
qcells AS (
  SELECT tok, r,
         CAST(concat('0x', substr(md5(tok || ':' || CAST(r AS VARCHAR)), 1, 15)) AS BIGINT)
           % {CM_WIDTH} AS c
  FROM (SELECT DISTINCT tok FROM toks) q, unnest([{rows}]) AS t(r)),
est AS (
  SELECT q.tok, MIN(s.n) AS est_count
  FROM qcells q JOIN sketch s ON q.r = s.r AND q.c = s.c
  GROUP BY q.tok)
SELECT tok AS token, est_count FROM est
ORDER BY est_count DESC, token
LIMIT {CM_K}"""


DIMSUM_GAMMA = 16.0
DIMSUM_K = 100


def q_dimsum_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIMSUM sampled all-pairs TOKEN-TOKEN cosine (Zadeh-Carlson 2013 /
    RowMatrix.columnSimilarities) over (row=doc, col=token) incidence
    triplets — the synonym/collocation miner. This is the orientation the
    estimator's theorem actually covers: column norms √df GROW with the
    corpus, so stopword columns are sampled hardest (keep prob √γ/√df)
    and expected per-document fan-out is bounded by γ-scaled mass —
    total cost Θ(γ·nnz), independent of the heaviest token. Coins are
    deterministic md5 uniforms, so the ORACLE replays sampling +
    estimation end-to-end in SQL."""
    from linkgraph.pipeline.dimsum import dimsum_cosine, token_incidence_triplets

    trips = token_incidence_triplets(load_documents(spark, sf_dir))
    return dimsum_cosine(trips, gamma=DIMSUM_GAMMA, k=DIMSUM_K)


def sql_dimsum_cosine() -> str:
    sg = DIMSUM_GAMMA ** 0.5
    return f"""
WITH trip AS MATERIALIZED (
  SELECT DISTINCT doc_id AS row, tok AS col FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) u
  WHERE tok <> ''),
norms AS MATERIALIZED (
  SELECT col, SQRT(CAST(COUNT(*) AS DOUBLE)) AS norm FROM trip GROUP BY col),
kept AS MATERIALIZED (
  SELECT t.row, t.col, 1.0 / LEAST({sg!r}, n.norm) AS s
  FROM trip t JOIN norms n ON t.col = n.col
  WHERE (CAST(concat('0x', substr(md5(CAST(t.row AS VARCHAR) || ':' || t.col), 1, 15)) AS BIGINT)
         + 0.5) / 1152921504606846976.0 < {sg!r} / n.norm),
est AS (
  SELECT a.col AS col_a, b.col AS col_b, ROUND(SUM(a.s * b.s), 5) AS cos_est
  FROM kept a JOIN kept b ON a.row = b.row AND a.col < b.col
  GROUP BY 1, 2)
SELECT col_a, col_b, cos_est FROM est
ORDER BY cos_est DESC, col_a, col_b
LIMIT {DIMSUM_K}"""


SND_THRESHOLD = 0.8


def q_stream_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming LSH near-dup filter: the upper half of documents replayed
    as a file stream, checked against the lower half as the static corpus.
    num_hashes=64 / bands=32 puts the s-curve midpoint far below the 0.8
    verify threshold, so candidate recall at J>=0.8 is 1 - (1-0.8^2)^32
    ~= 1 - 1e-14 — the exact-verified output equals the full cross-pair
    Jaccard filter the SQL oracle computes (MinHash is deterministic, so
    this equality is stable, not probabilistic per run)."""
    import tempfile

    from linkgraph.streaming import StaticNearDupIndex, stream_near_dup

    docs = load_documents(spark, sf_dir).select("doc_id", "text")
    n = docs.count()
    static_docs = docs.where(F.col("doc_id") < n // 2)
    tmp = tempfile.mkdtemp(prefix="linkgraph_snd_")
    docs.where(F.col("doc_id") >= n // 2).write.mode("overwrite").parquet(tmp)
    stream = spark.readStream.schema("doc_id long, text string").parquet(tmp)

    out: list = []

    def sink(df: DataFrame, epoch_id: int) -> None:
        # driver-list sink is CONTRACT-SCALE ONLY (the gate compares one
        # small DataFrame); the at-scale form of this foreachBatch writes
        # each epoch's matches to a table, e.g.
        # df.write.mode("append").parquet(out_path) — nothing else changes
        out.extend(
            (r["doc_id"], r["static_id"], r["jaccard"]) for r in df.collect()
        )

    index = StaticNearDupIndex(static_docs, num_hashes=64, bands=32)
    try:
        q = (
            stream_near_dup(stream, index, sink, threshold=SND_THRESHOLD)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        index.unpersist()
    return spark.createDataFrame(
        sorted(out), "doc_id long, static_id long, jaccard double"
    )


def sql_stream_near_dup() -> str:
    return f"""
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
toks AS MATERIALIZED (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents),
sizes AS MATERIALIZED (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_id, b.doc_id AS static_id, COUNT(*) AS i
  FROM toks a JOIN toks b ON a.tok = b.tok
  WHERE a.doc_id >= (SELECT n // 2 FROM nn) AND b.doc_id < (SELECT n // 2 FROM nn)
  GROUP BY 1, 2)
SELECT x.doc_id, x.static_id,
       ROUND(CAST(x.i AS DOUBLE) / (sa.sz + sb.sz - x.i), 5) AS jaccard
FROM inter x
JOIN sizes sa ON sa.doc_id = x.doc_id
JOIN sizes sb ON sb.doc_id = x.static_id
WHERE ROUND(CAST(x.i AS DOUBLE) / (sa.sz + sb.sz - x.i), 5) >= {SND_THRESHOLD}"""


KATZ_ITERS = 15
KATZ_ALPHA = 0.1


def q_doc_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality (alpha=0.1, beta=1), 15 fixed iterations on the
    zero-shuffle CSC-block pull engine; oracle unrolls the same power
    iteration in SQL."""
    from linkgraph.algorithms.pagerank import katz_centrality

    g = doc_graph(spark, sf_dir)
    ranks = katz_centrality(g, alpha=KATZ_ALPHA, beta=1.0, max_iterations=KATZ_ITERS)
    return ranks.select("id", F.round("rank", 5).alias("rank"))


def sql_doc_katz() -> str:
    parts = [_PROLOG]
    parts.append(", k0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM nodes)")
    for k in range(1, KATZ_ITERS + 1):
        parts.append(
            f""", k{k} AS MATERIALIZED (
  SELECT n.id, 1.0 + {KATZ_ALPHA} * COALESCE(c.s, CAST(0.0 AS DOUBLE)) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank) AS s
    FROM edges e JOIN k{k - 1} r ON e.src = r.id
    GROUP BY e.dst
  ) c ON n.id = c.id)"""
        )
    parts.append(f"SELECT id, ROUND(rank, 5) AS rank FROM k{KATZ_ITERS}")
    return "\n".join(parts)


WSAMPLE_N = 50


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis A-Res weight-proportional sample (n=50,
    weight = n_chars): deterministic md5-derived uniforms, global top-n
    by u^(1/w) — zero-shuffle keys + TakeOrderedAndProject."""
    from linkgraph.pipeline.text import weighted_sample

    docs = load_documents(spark, sf_dir)
    return weighted_sample(docs, F.col("n_chars").cast("double"), n=WSAMPLE_N)


def sql_weighted_sample() -> str:
    return f"""
WITH k AS (
  SELECT doc_id,
         POW((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
              + 0.5) / 1152921504606846976.0,
             1.0 / CAST(n_chars AS DOUBLE)) AS key
  FROM documents)
SELECT doc_id, ROUND(key, 5) AS sample_key
FROM k ORDER BY key DESC, doc_id LIMIT {WSAMPLE_N}"""


BPE_MERGES = 10


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE merge learning (Sennrich ACL'16): first 10 merges
    over the corpus word-frequency table. Iterative argmax — not
    SQL-expressible; parity vs a pure-Python reference in
    tests/test_bpe.py."""
    from linkgraph.pipeline.bpe import learn_bpe_merges

    merges = learn_bpe_merges(load_documents(spark, sf_dir), BPE_MERGES)
    return spark.createDataFrame(
        [(i + 1, a, b, n) for i, (a, b, n) in enumerate(merges)],
        "merge_rank int, sym_a string, sym_b string, pair_count long",
    )


SKIPGRAM_W = 3
SKIPGRAM_K = 100


def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec skip-gram pair mining: corpus-wide (w_left, w_right)
    counts at positional distance <= 3, top-100. Pair generation is a
    zero-shuffle nested-transform array expansion (no positional
    self-join)."""
    from linkgraph.pipeline.cooccur import skipgram_pairs

    return skipgram_pairs(
        load_documents(spark, sf_dir), window=SKIPGRAM_W, k=SKIPGRAM_K
    )


def sql_skipgram_pairs() -> str:
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
pos AS MATERIALIZED (
  SELECT doc_id, unnest(l) AS tok, unnest(range(1, len(l)+1)) AS pos
  FROM t),
pairs AS (
  SELECT a.tok AS w_left, b.tok AS w_right
  FROM pos a JOIN pos b
    ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + {SKIPGRAM_W}
  WHERE a.tok <> '' AND b.tok <> '')
SELECT w_left, w_right, CAST(COUNT(*) AS BIGINT) AS cnt
FROM pairs GROUP BY 1, 2
ORDER BY cnt DESC, w_left, w_right
LIMIT {SKIPGRAM_K}"""


KHOP_FANOUTS = (3, 2)


def q_doc_khop_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style 2-hop neighbor sampling over the undirected doc
    graph: seeds = doc_id % 17 == 0, fanouts (3, 2). Deterministic
    hash-ranked selection via a salted two-stage top-f (no per-node
    window straggler)."""
    from linkgraph.algorithms.sampling import k_hop_sample

    e = doc_edges(spark, sf_dir)
    ue = e.select("src", "dst").union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    docs = load_documents(spark, sf_dir)
    seeds = docs.select("doc_id").where(F.col("doc_id") % 17 == 0)
    return k_hop_sample(ue, seeds, KHOP_FANOUTS)


def sql_doc_khop_sample() -> str:
    f1, f2 = KHOP_FANOUTS
    return (
        _PROLOG
        + f""",
seeds AS (SELECT id AS src FROM nodes WHERE id % 17 = 0),
c1 AS (
  SELECT u.src, u.dst, (1103515245*u.dst + 12345*u.src) % 2147483648 AS h
  FROM ue u JOIN seeds s ON u.src = s.src),
r1 AS (
  SELECT src, dst FROM (
    SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY h, dst) AS rn
    FROM c1) WHERE rn <= {f1}),
f2 AS (SELECT DISTINCT dst AS src FROM r1),
c2 AS (
  SELECT u.src, u.dst, (1103515245*u.dst + 12345*u.src) % 2147483648 AS h
  FROM ue u JOIN f2 s ON u.src = s.src),
r2 AS (
  SELECT src, dst FROM (
    SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src ORDER BY h, dst) AS rn
    FROM c2) WHERE rn <= {f2})
SELECT CAST(1 AS INTEGER) AS hop, src, dst FROM r1
UNION ALL
SELECT CAST(2 AS INTEGER) AS hop, src, dst FROM r2"""
    )


def q_emb_sq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar-quantized top-k (FAISS QT_8bit recipe): asymmetric
    cosine of float queries against byte-decoded corpus vectors — 4x
    memory/shuffle reduction on the corpus side, with the ENTIRE path
    (quantize → decode → score) replayed in the SQL oracle (unlike PQ)."""
    from linkgraph.pipeline.ann import sq8_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return sq8_topk(emb.filter(F.col("vec_id") < 100), emb, k=5)


def sql_emb_sq_topk() -> str:
    return """
WITH v AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
b AS (
  SELECT i, MIN(x) AS lo, MAX(x) AS hi
  FROM (SELECT unnest(e) AS x, generate_subscripts(e, 1) AS i FROM v)
  GROUP BY i),
lohi AS (SELECT list(lo ORDER BY i) AS lo, list(hi ORDER BY i) AS hi FROM b),
dec AS MATERIALIZED (
  SELECT vec_id,
         list_transform(range(1, len(e) + 1),
           i -> lo[i] + (CASE WHEN (hi[i] - lo[i]) > 0
                 THEN LEAST(255, GREATEST(0,
                      CAST(FLOOR((e[i] - lo[i]) / (hi[i] - lo[i]) * 255 + 0.5) AS INTEGER)))
                 ELSE 0 END) / 255.0 * (hi[i] - lo[i])) AS d
  FROM v, lohi),
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         ROUND(list_dot_product(a.e, b.d) /
               (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.d, b.d))), 4) AS qcos
  FROM v a JOIN dec b ON a.vec_id < 100 AND a.vec_id <> b.vec_id),
ranked AS (
  SELECT a, b, qcos,
         ROW_NUMBER() OVER (PARTITION BY a ORDER BY qcos DESC, b ASC) AS rn
  FROM pairs)
SELECT a, b, qcos FROM ranked WHERE rn <= 5"""


def q_doc_anf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANF/HyperANF neighborhood function of the doc graph — FM bitmask
    sketches, one bit_or shuffle per hop (rows-only: iterative sketch union
    is not SQL-expressible; exactness goldens live in tests/test_anf.py)."""
    from linkgraph.algorithms.anf import neighborhood_function

    return neighborhood_function(doc_graph(spark, sf_dir), max_h=16, num_trials=16)


SPAN_W = 8
SPAN_K = 100


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top duplicated 8-token spans across documents (Lee et al. 2022
    substring dedup, window-hash formulation) — linear token scan, one
    shuffle on 8-byte keys, TakeOrderedAndProject top-k."""
    from linkgraph.pipeline.spans import duplicated_spans_topk

    return duplicated_spans_topk(load_documents(spark, sf_dir), width=SPAN_W, k=SPAN_K)


def sql_span_dedup() -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
wins AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= {SPAN_W}
                THEN list_transform(range(1, len(t) - {SPAN_W} + 2),
                                    i -> array_to_string(t[i:i+{SPAN_W}-1], ' '))
                ELSE [] END) AS span
  FROM toks)
SELECT span,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM wins GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, span LIMIT {SPAN_K}"""


def q_span_dup_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-span share — the Lee-et-al. quality-gate
    signal; two linear passes, hashes (not span text) through the shuffle."""
    from linkgraph.pipeline.spans import span_dup_fraction

    return span_dup_fraction(load_documents(spark, sf_dir), width=SPAN_W)


def sql_span_dup_fraction() -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
wins AS (
  SELECT doc_id,
         unnest(CASE WHEN len(t) >= {SPAN_W}
                THEN list_transform(range(1, len(t) - {SPAN_W} + 2),
                                    i -> array_to_string(t[i:i+{SPAN_W}-1], ' '))
                ELSE [] END) AS span
  FROM toks),
dup AS (SELECT span FROM wins GROUP BY span HAVING COUNT(DISTINCT doc_id) >= 2),
per AS (
  SELECT w.doc_id, COUNT(*) AS n_windows,
         SUM(CASE WHEN d.span IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
  FROM wins w LEFT JOIN dup d USING (span) GROUP BY w.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(p.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(p.n_dup, 0) AS BIGINT) AS n_dup_windows,
       ROUND(CASE WHEN COALESCE(p.n_windows, 0) > 0
                  THEN CAST(COALESCE(p.n_dup, 0) AS DOUBLE) / p.n_windows
                  ELSE 0.0 END, 5) AS dup_fraction
FROM documents d LEFT JOIN per p ON d.doc_id = p.doc_id"""


ZIPF_TOP = 1000


def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus vocabulary health report incl. closed-form Zipf
    slope over the top-1000 types."""
    from linkgraph.pipeline.vocab import vocab_stats

    return vocab_stats(load_documents(spark, sf_dir), zipf_top=ZIPF_TOP)


def sql_vocab_stats() -> str:
    return f"""
WITH tk AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
freqs AS (
  SELECT tok, COUNT(*) AS freq FROM tk WHERE tok <> '' GROUP BY tok),
totals AS (
  SELECT SUM(freq) AS n_tokens, COUNT(*) AS n_types,
         SUM(CASE WHEN freq = 1 THEN 1 ELSE 0 END) AS n_hapax
  FROM freqs),
top AS (
  SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, tok) AS r
  FROM freqs QUALIFY r <= {ZIPF_TOP}),
slope AS (
  SELECT COVAR_SAMP(LN(r), LN(freq)) / VAR_SAMP(LN(r)) AS zipf_slope FROM top)
SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_types AS BIGINT) AS n_types,
       ROUND(CAST(n_types AS DOUBLE) / n_tokens, 5) AS type_token_ratio,
       CAST(n_hapax AS BIGINT) AS n_hapax,
       ROUND(CAST(n_hapax AS DOUBLE) / n_types, 5) AS hapax_share,
       ROUND(zipf_slope, 5) AS zipf_slope
FROM totals, slope"""


ML_SOURCE = "src0"
ML_K = 200
ML_ALPHA = 0.5


def q_moore_lewis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moore-Lewis cross-entropy-difference data selection: rank pool docs
    by in-domain-ness vs the 'src0' seed slice — broadcast LM join over a
    linear token scan."""
    from linkgraph.pipeline.vocab import moore_lewis_scores

    return moore_lewis_scores(
        load_documents(spark, sf_dir), ML_SOURCE, k=ML_K, alpha=ML_ALPHA
    )


def sql_moore_lewis() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''),
in_ids AS (SELECT doc_id FROM documents WHERE source = '{ML_SOURCE}'),
pool AS (SELECT tok, COUNT(*) AS pf FROM toks GROUP BY tok),
ind AS (
  SELECT tok, COUNT(*) AS inf_ FROM toks JOIN in_ids USING (doc_id)
  GROUP BY tok),
vocab AS (
  SELECT p.tok, p.pf, COALESCE(i.inf_, 0) AS inf_
  FROM pool p LEFT JOIN ind i USING (tok)),
sizes AS (SELECT SUM(pf) AS pn, SUM(inf_) AS inn, COUNT(*) AS v FROM vocab),
lm AS (
  SELECT tok,
         LN((inf_ + {ML_ALPHA}) / (inn + {ML_ALPHA} * v))
       - LN((pf + {ML_ALPHA}) / (pn + {ML_ALPHA} * v)) AS llr
  FROM vocab, sizes),
sc AS (
  SELECT t.doc_id, COUNT(*) AS n_toks, ROUND(AVG(llr), 5) AS score
  FROM toks t JOIN lm USING (tok)
  WHERE t.doc_id NOT IN (SELECT doc_id FROM in_ids)
  GROUP BY t.doc_id)
SELECT doc_id, CAST(n_toks AS BIGINT) AS n_toks, score
FROM sc ORDER BY score DESC, doc_id LIMIT {ML_K}"""


DSIR_SOURCE = "src0"
DSIR_N = 100
DSIR_BUCKETS = 256
DSIR_ADDK = 0.5


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): hashed n-gram bucket
    models (target = 'src0' docs vs the raw pool), per-doc log importance
    weights, Gumbel top-k sampled selection — the md5 hash, the smoothing,
    the noise, and the cut all replay bit-identically in the SQL oracle."""
    from linkgraph.pipeline.dsir import dsir_select

    return dsir_select(
        load_documents(spark, sf_dir),
        DSIR_SOURCE,
        n=DSIR_N,
        n_buckets=DSIR_BUCKETS,
        add_k=DSIR_ADDK,
    )


def sql_dsir_select() -> str:
    u = (
        "(CAST(concat('0x', substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 15)) "
        "AS BIGINT) + 0.5) / 1152921504606846976.0"
    )
    return f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, source,
         unnest(list_concat(t, list_transform(range(1, len(t)),
                                              i -> t[i] || ' ' || t[i+1]))) AS gram
  FROM toks),
b AS MATERIALIZED (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) % {DSIR_BUCKETS} AS bucket,
         COUNT(*) AS cnt
  FROM grams GROUP BY 1, 2, 3),
pb AS (
  SELECT bucket,
         SUM(CASE WHEN source = '{DSIR_SOURCE}' THEN cnt ELSE 0 END) AS tc,
         SUM(CASE WHEN source <> '{DSIR_SOURCE}' THEN cnt ELSE 0 END) AS rc
  FROM b GROUP BY bucket),
tot AS (SELECT SUM(tc) AS tt, SUM(rc) AS rt FROM pb),
lr AS (
  SELECT bucket,
         LN((tc + {DSIR_ADDK}) / (tt + {DSIR_ADDK} * {DSIR_BUCKETS}))
       - LN((rc + {DSIR_ADDK}) / (rt + {DSIR_ADDK} * {DSIR_BUCKETS})) AS llr
  FROM pb, tot),
lw AS (
  SELECT doc_id, ROUND(SUM(cnt * llr), 5) AS log_weight
  FROM b JOIN lr USING (bucket) WHERE source <> '{DSIR_SOURCE}' GROUP BY doc_id),
keyed AS (
  SELECT doc_id, log_weight,
         ROUND(log_weight - LN(-LN({u})), 5) AS sample_key
  FROM lw)
SELECT doc_id, log_weight, sample_key FROM keyed
ORDER BY sample_key DESC, doc_id LIMIT {DSIR_N}"""


QC_SOURCE = "src0"
QC_BUCKETS = 256
QC_ITERS = 4
QC_LR = 10.0


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fasttext-shaped hashed-n-gram logistic quality scorer (CCNet /
    LLaMA 'looks like the target domain' filter): train full-batch GD
    in-engine (model = 257 doubles, two map-side-combining shuffles per
    iteration), score every doc. The oracle RE-TRAINS the model from
    scratch in DuckDB — the gradient loop unrolled into a CTE chain."""
    from linkgraph.pipeline.classify import quality_classifier_scores

    return quality_classifier_scores(
        load_documents(spark, sf_dir),
        QC_SOURCE,
        n_buckets=QC_BUCKETS,
        iters=QC_ITERS,
        lr=QC_LR,
    )


def sql_quality_classifier(iters: int = QC_ITERS) -> str:
    """Unrolled full-batch GD: iteration t = margins m{t} (docs ⋈ w{t})
    → residuals r{t} → bucket gradient gw{t} → w{t+1}/b{t+1}. w1 covers
    every bucket of x (gw0 groups the full feature table), so later
    iterations LEFT JOIN safely."""
    lr, b, src = QC_LR, QC_BUCKETS, QC_SOURCE
    ctes = [
        "toks AS (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents)",
        """grams AS (
  SELECT doc_id, unnest(list_concat(t, list_transform(range(1, len(t)),
                                    i -> t[i] || ' ' || t[i+1]))) AS gram
  FROM toks)""",
        f"""bf AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(gram), 1, 15)) AS BIGINT) % {b} AS bucket,
         COUNT(*) AS cnt
  FROM grams GROUP BY 1, 2)""",
        "nd AS (SELECT doc_id, 2 * len(t) - 1 AS tot FROM toks)",
        """x AS MATERIALIZED (
  SELECT bf.doc_id, bf.bucket, CAST(bf.cnt AS DOUBLE) / nd.tot AS x
  FROM bf JOIN nd USING (doc_id))""",
        f"""ys AS (
  SELECT doc_id, CASE WHEN source = '{src}' THEN 1.0 ELSE 0.0 END AS y
  FROM documents)""",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)",
        "m0 AS (SELECT doc_id, y, 0.0 AS margin FROM ys)",
    ]
    for t in range(iters):
        if t > 0:
            ctes.append(f"""m{t} AS (
  SELECT ys.doc_id, ys.y, (SELECT bb FROM b{t}) + COALESCE(s.sm, 0) AS margin
  FROM ys LEFT JOIN (
    SELECT x.doc_id, SUM(x.x * w.w) AS sm
    FROM x JOIN w{t} w USING (bucket) GROUP BY x.doc_id) s USING (doc_id))""")
        ctes.append(
            f"r{t} AS (SELECT doc_id, 1.0 / (1.0 + EXP(-margin)) - y AS r FROM m{t})"
        )
        ctes.append(f"""gw{t} AS (
  SELECT x.bucket, SUM(x.x * r.r) AS sg
  FROM x JOIN r{t} r USING (doc_id) GROUP BY x.bucket)""")
        if t == 0:
            ctes.append(
                f"w1 AS (SELECT bucket, -({lr}) * sg / (SELECT n FROM nn) AS w FROM gw0)"
            )
            ctes.append(
                f"b1 AS (SELECT -({lr}) * SUM(r) / (SELECT n FROM nn) AS bb FROM r0)"
            )
        else:
            ctes.append(f"""w{t + 1} AS (
  SELECT w.bucket, w.w - {lr} * COALESCE(g.sg, 0) / (SELECT n FROM nn) AS w
  FROM w{t} w LEFT JOIN gw{t} g USING (bucket))""")
            ctes.append(f"""b{t + 1} AS (
  SELECT (SELECT bb FROM b{t}) - {lr} * SUM(r) / (SELECT n FROM nn) AS bb
  FROM r{t})""")
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT ys.doc_id,
       ROUND(1.0 / (1.0 + EXP(-((SELECT bb FROM b{iters}) + COALESCE(s.sm, 0)))), 5)
         AS score
FROM ys LEFT JOIN (
  SELECT x.doc_id, SUM(x.x * w.w) AS sm
  FROM x JOIN w{iters} w USING (bucket) GROUP BY x.doc_id) s USING (doc_id)"""


SEMD_N = 200
SEMD_TAU = 0.95


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means cells → within-cell cosine
    pairs → WCC clusters → keep the member FARTHEST from its centroid.
    Rows-only (k-means training is not SQL-expressible); dup detection is
    non-vacuous via the same planted-copy recipe as emb_near_dup (the
    organic sf0.01 corpus has no pair above cosine 0.52), and cluster/
    keep semantics are golden-tested on planted fixtures
    (tests/test_dsir_semdedup.py)."""
    from linkgraph.pipeline.dedup import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
        F.col("vec_id") < SEMD_N
    )
    planted = emb.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
    )
    return semantic_dedup(
        emb.unionByName(planted), num_cells=8, threshold=SEMD_TAU
    )


def q_near_dup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline.dedup import token_jaccard_pairs

    return token_jaccard_pairs(load_documents(spark, sf_dir), threshold=0.8)


_JACCARD_PAIRS_CTE = """
WITH dtok AS MATERIALIZED (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents) u),
dcnt AS MATERIALIZED (SELECT doc_id, COUNT(*) AS c FROM dtok GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS i
  FROM dtok x JOIN dtok y ON x.tok = y.tok AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id),
sim AS (
  SELECT i.a, i.b, ROUND(CAST(i.i AS DOUBLE) / (ca.c + cb.c - i.i), 5) AS jaccard
  FROM inter i JOIN dcnt ca ON ca.doc_id = i.a JOIN dcnt cb ON cb.doc_id = i.b)"""


def sql_near_dup_jaccard() -> str:
    return _JACCARD_PAIRS_CTE + """
SELECT a, b, jaccard FROM sim WHERE jaccard >= 0.8"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → WCC → per-cluster representative, oracle-checked
    against an unrolled min-propagation closure over the SQL pair graph."""
    from linkgraph.pipeline.dedup import near_duplicate_clusters

    return near_duplicate_clusters(load_documents(spark, sf_dir), threshold=0.8)


def sql_dedup_clusters(
    rounds: int = 12,
    final: str = (
        "\nSELECT id AS doc_id, comp AS cluster, id = comp AS is_representative"
        "\nFROM c{last}"
    ),
) -> str:
    """Min-propagation + pointer-jumping closure over the SQL pair graph.
    12 unrolled rounds (each ~doubles the covered distance) handle chain
    diameters far beyond contract-scale clusters — 6 rounds provably
    mislabeled a 200-doc sliding-window chain. ``final`` formats against
    ``last`` (the converged closure CTE) so compositions (keep-best
    selection) reuse the identical cluster build."""
    parts = [_JACCARD_PAIRS_CTE + """,
pe AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM sim WHERE jaccard >= 0.8
  UNION ALL SELECT b, a FROM sim WHERE jaccard >= 0.8),
c0 AS (SELECT doc_id AS id, doc_id AS comp FROM documents)"""]
    for k in range(1, rounds + 1):
        parts.append(f""", n{k} AS MATERIALIZED (
  SELECT l.id, LEAST(l.comp, COALESCE(nm.nmin, l.comp)) AS comp
  FROM c{k - 1} l LEFT JOIN (
    SELECT u.dst AS id, MIN(p.comp) AS nmin FROM pe u JOIN c{k - 1} p ON u.src = p.id GROUP BY u.dst
  ) nm ON l.id = nm.id)
, c{k} AS MATERIALIZED (
  SELECT m.id, COALESCE(p2.comp, m.comp) AS comp
  FROM n{k} m LEFT JOIN n{k} p2 ON m.comp = p2.id)""")
    parts.append(final.format(last=rounds))
    return "\n".join(parts)


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup: one survivor per near-dup cluster — the
    LONGEST member (token count), ties to min doc_id. Selection is one
    partial-aggregatable max_by, never a per-cluster window."""
    from linkgraph.pipeline.dedup import dedup_keep_best

    return dedup_keep_best(load_documents(spark, sf_dir), threshold=0.8)


def sql_dedup_keep_best() -> str:
    return sql_dedup_clusters(
        final="""
, tokc AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_tokens
  FROM documents)
, ranked AS (
  SELECT c.comp AS cluster, c.id AS doc_id, t.n_tokens,
         ROW_NUMBER() OVER (PARTITION BY c.comp
                            ORDER BY t.n_tokens DESC, c.id ASC) AS rn
  FROM c{last} c JOIN tokc t ON t.doc_id = c.id)
SELECT cluster, doc_id, n_tokens FROM ranked WHERE rn = 1"""
    )


KCORE_ROUNDS = 24


def q_doc_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core membership over the doc graph, oracle-checked against an
    unrolled SQL peel. BOTH sides run the same FIXED round budget
    (KCORE_ROUNDS): the peel sequence is deterministic and post-fixpoint
    rounds are no-ops, so Spark ≡ SQL at EVERY scale factor — whether or
    not the fixpoint falls inside the budget (a fixed unroll alone was
    verified wrong once the peel depth outgrew it)."""
    from linkgraph.algorithms.kcore import k_core

    return k_core(doc_graph(spark, sf_dir), k=3, max_rounds=KCORE_ROUNDS)


def sql_doc_kcore(k: int = 3, rounds: int = KCORE_ROUNDS) -> str:
    parts = [_PROLOG]
    parts.append(", a0 AS (SELECT doc_id AS id FROM documents)")
    for r in range(1, rounds + 1):
        parts.append(f""", a{r} AS MATERIALIZED (
  SELECT d.id FROM (
    SELECT u.src AS id, COUNT(*) AS deg FROM ue u
    JOIN a{r - 1} s ON u.src = s.id JOIN a{r - 1} t ON u.dst = t.id
    GROUP BY u.src) d
  WHERE d.deg >= {k})""")
    parts.append(f"""
SELECT d.doc_id AS id, (c.id IS NOT NULL) AS in_core
FROM documents d LEFT JOIN a{rounds} c ON d.doc_id = c.id""")
    return "\n".join(parts)


CORE_NUM_ROUNDS = 24


def q_doc_core_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coreness per node via the iterated h-index; BOTH sides run the same
    FIXED round budget (CORE_NUM_ROUNDS) so the deterministic monotone
    sequences agree at every scale factor (the sf0.1 fixpoint needs 21-24
    rounds — a 16-round oracle disagreed on 2079/5000 nodes there). The
    run-to-fixpoint semantics are covered by the python-peel pytest
    goldens."""
    from linkgraph.algorithms.kcore import core_numbers

    return core_numbers(doc_graph(spark, sf_dir), max_rounds=CORE_NUM_ROUNDS)


def sql_doc_core_numbers(rounds: int = CORE_NUM_ROUNDS) -> str:
    parts = [_PROLOG]
    parts.append(""", e0 AS MATERIALIZED (
  SELECT src AS id, COUNT(*) AS est FROM ue GROUP BY src)""")
    for r in range(1, rounds + 1):
        parts.append(f""", h{r} AS MATERIALIZED (
  SELECT id, MAX(LEAST(nbr_est, rn)) AS h FROM (
    SELECT u.src AS id, p.est AS nbr_est,
           ROW_NUMBER() OVER (PARTITION BY u.src ORDER BY p.est DESC, u.dst ASC) AS rn
    FROM ue u JOIN e{r - 1} p ON u.dst = p.id) x
  GROUP BY id)
, e{r} AS MATERIALIZED (
  SELECT e.id, LEAST(e.est, COALESCE(h.h, 0)) AS est
  FROM e{r - 1} e LEFT JOIN h{r} h ON e.id = h.id)""")
    parts.append(f"""
SELECT d.doc_id AS id, CAST(COALESCE(e.est, 0) AS BIGINT) AS core
FROM documents d LEFT JOIN e{rounds} e ON d.doc_id = e.id""")
    return "\n".join(parts)


def q_emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline.ann import cosine_topk_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return cosine_topk_bruteforce(
        emb.filter(F.col("vec_id") < 100), emb, k=5
    )


def sql_emb_cosine_topk() -> str:
    return """
WITH v AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         ROUND(list_dot_product(a.e, b.e) /
               (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 4) AS cosine
  FROM v a JOIN v b ON a.vec_id < 100 AND a.vec_id <> b.vec_id),
ranked AS (
  SELECT a, b, cosine,
         ROW_NUMBER() OVER (PARTITION BY a ORDER BY cosine DESC, b ASC) AS rn
  FROM pairs)
SELECT a, b, cosine FROM ranked WHERE rn <= 5"""


# ------------------------------------------------------------ rows-only ops
# (no SQL-expressible oracle: iterative internals, sampling, hashing, or
# driver-side exact algorithms — the driver records a rows-only check)
def q_doc_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.msbfs import closeness_centrality

    g = doc_graph(spark, sf_dir)
    out = closeness_centrality(g, direction="BOTH")
    return out.select("id", F.round("centrality", 5).alias("centrality"))


def q_doc_harmonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.msbfs import harmonic_centrality

    g = doc_graph(spark, sf_dir)
    out = harmonic_centrality(g, direction="BOTH")
    return out.select("id", F.round("centrality", 5).alias("centrality"))


def q_doc_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.betweenness import betweenness_centrality

    g = doc_graph(spark, sf_dir)
    out = betweenness_centrality(g, direction="BOTH")
    return out.select("id", F.round("centrality", 5).alias("centrality"))


BETW_SUBSET = 60  # oracle checks betweenness for ids < this bound


def q_doc_betweenness_sub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Brandes betweenness, oracle-checked for a node subset.

    The DuckDB oracle counts shortest paths (σ) layer by layer from the
    pair-BFS distance table and evaluates Brandes' pair-dependency sum
    directly: B(v) = ½ Σ_{s≠v≠t} [d(s,v)+d(v,t)=d(s,t)] σ_sv·σ_vt/σ_st.
    Restricting v to a subset keeps the oracle's triple join bounded."""
    from linkgraph.algorithms.betweenness import betweenness_centrality

    g = doc_graph(spark, sf_dir)
    out = betweenness_centrality(g, direction="BOTH")
    return out.filter(F.col("id") < BETW_SUBSET).select(
        "id", F.round("centrality", 4).alias("centrality")
    )


def sql_doc_betweenness_sub() -> str:
    parts = [_PROLOG, _apsp_ctes()]
    parts.append(
        ", dall AS MATERIALIZED "
        f"(SELECT source, node, d FROM p{APSP_ROUNDS})"
    )
    parts.append(
        ", s0 AS MATERIALIZED (SELECT id AS source, id AS node, 0 AS d, "
        "CAST(1 AS DOUBLE) AS sig FROM nodes)"
    )
    for k in range(1, APSP_ROUNDS + 1):
        parts.append(
            f""", s{k} AS MATERIALIZED (
  SELECT p.source, u.dst AS node, {k} AS d, SUM(p.sig) AS sig
  FROM s{k - 1} p JOIN ue u ON p.node = u.src
  JOIN dall dv ON dv.source = p.source AND dv.node = u.dst AND dv.d = {k}
  GROUP BY p.source, u.dst)"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT source, node, d, sig FROM s{k}" for k in range(APSP_ROUNDS + 1)
    )
    parts.append(f", sigall AS MATERIALIZED ({union})")
    parts.append(
        f""", sv AS MATERIALIZED (
  SELECT source AS s, node AS v, d AS dsv, sig AS ssv FROM sigall
  WHERE node < {BETW_SUBSET} AND d > 0)
, vt AS MATERIALIZED (
  SELECT source AS v, node AS t, d AS dvt, sig AS svt FROM sigall
  WHERE source < {BETW_SUBSET} AND d > 0)
, bsum AS (
  SELECT sv.v AS id, SUM(sv.ssv * vt.svt / st.sig) AS bc
  FROM sv JOIN vt ON sv.v = vt.v AND sv.s <> vt.t
  JOIN sigall st
    ON st.source = sv.s AND st.node = vt.t AND st.d = sv.dsv + vt.dvt
  GROUP BY sv.v)
SELECT n.id, ROUND(COALESCE(b.bc, 0.0) / 2, 4) AS centrality
FROM (SELECT id FROM nodes WHERE id < {BETW_SUBSET}) n
LEFT JOIN bsum b ON n.id = b.id"""
    )
    return "\n".join(parts)


def q_doc_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.louvain import louvain

    g = doc_graph(spark, sf_dir)
    return louvain(g, max_levels=2, move_rounds=6).select("id", "community")


def q_doc_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-backward-coloring SCC (NOT the driver Tarjan): the
    distributed Fleischer/ColorSCC loop, with the same coloring algorithm
    vectorized driver-side below DRIVER_EDGE_THRESHOLD (r6 hybrid
    crossover; force-distributed parity test in tests/test_r6_paths.py)."""
    from linkgraph.algorithms.scc import scc

    return scc(doc_graph(spark, sf_dir))


SCC_DOUBLINGS = 6  # reach closure covers directed paths ≤ 2^6 = 64 hops


def sql_doc_scc() -> str:
    """SCC oracle: iterative-doubling directed transitive closure, then
    component(v) = min{u : v⇝u ∧ u⇝v}."""
    parts = [_PROLOG]
    parts.append(
        ", r0 AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges "
        "UNION SELECT id, id FROM nodes)"
    )
    for k in range(1, SCC_DOUBLINGS + 1):
        parts.append(
            f""", r{k} AS MATERIALIZED (
  SELECT DISTINCT a, b FROM (
    SELECT a, b FROM r{k - 1}
    UNION ALL
    SELECT x.a, y.b FROM r{k - 1} x JOIN r{k - 1} y ON x.b = y.a) t)"""
        )
    parts.append(
        f"""SELECT m.a AS id, MIN(m.b) AS component
FROM r{SCC_DOUBLINGS} m JOIN r{SCC_DOUBLINGS} rr ON m.a = rr.b AND m.b = rr.a
GROUP BY m.a"""
    )
    return "\n".join(parts)


def q_doc_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.randomwalk import random_walks

    g = doc_graph(spark, sf_dir)
    return random_walks(g, steps=8, walks_per_node=2, seed=42)


def q_walk_skipgram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DeepWalk corpus export: node2vec-style walks → forward-window
    (center, context) node pairs, top-100. Rows-only (walk RNG is the
    engine's counter-based stream, not SQL-replayable); pair extraction
    has a hand-computed golden in tests."""
    from linkgraph.algorithms.randomwalk import random_walks
    from linkgraph.pipeline.cooccur import walk_skipgram_pairs

    g = doc_graph(spark, sf_dir)
    walks = random_walks(g, steps=8, walks_per_node=2, seed=42)
    return walk_skipgram_pairs(walks, window=2, k=100)


def q_doc_mst(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.paths import minimum_spanning_forest

    e = doc_edges(spark, sf_dir).withColumn(
        "weight", (1 + (F.col("src") + F.col("dst")) % 3).cast("double")
    )
    g = Graph.from_edges(e)
    return minimum_spanning_forest(g)


def q_doc_balanced_triads(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.triangles import balanced_triads

    e = doc_edges(spark, sf_dir).withColumn(
        "weight", F.when((F.col("src") + F.col("dst")) % 2 == 0, 1.0).otherwise(-1.0)
    )
    docs = load_documents(spark, sf_dir)
    g = Graph.from_edges(e, nodes=docs.select(F.col("doc_id").alias("id")))
    return balanced_triads(g)


def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding at the near-dup DEDUP operating point: 64 hashes in 4
    bands of 16 rows → collision threshold s* = (1/4)^(1/16) ≈ 0.92. The
    synthetic corpus is heavily templated — looser banding (r=4) collides
    ~77% of ALL pairs, which is correct LSH behavior but useless for dedup."""
    from linkgraph.pipeline.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(load_documents(spark, sf_dir), bands=4)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline.dedup import simhash64

    return simhash64(load_documents(spark, sf_dir))


def q_emb_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cosine top-k with query-side multi-probing (nprobe=2): queries
    near Voronoi boundaries also search the adjacent cell."""
    from linkgraph.pipeline.ann import cosine_topk_ivf, train_ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = train_ivf_centroids(emb, num_cells=8)
    return cosine_topk_ivf(emb.filter(F.col("vec_id") < 100), emb, cent, k=5, nprobe=2)


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline.multimodal import extract_features, synthesize_media

    return extract_features(synthesize_media(spark, n=64))


# ------------------------------------------------- APSP-oracle-backed queries
APSP_ROUNDS = 16


def _apsp_ctes() -> str:
    """Pair-BFS over `ue` unrolled to fixpoint → `apsp(source, node, d)`
    with d ≥ 1 for every reached non-self pair (undirected distances)."""
    parts = [", p0 AS MATERIALIZED (SELECT id AS source, id AS node, 0 AS d FROM nodes)"]
    for k in range(1, APSP_ROUNDS + 1):
        parts.append(
            f""", p{k} AS MATERIALIZED (
  SELECT source, node, MIN(d) AS d FROM (
    SELECT source, node, d FROM p{k - 1}
    UNION ALL
    SELECT p.source, u.dst AS node, p.d + 1 AS d
    FROM p{k - 1} p JOIN ue u ON p.node = u.src
  ) t GROUP BY source, node)"""
        )
    parts.append(
        f", apsp AS MATERIALIZED (SELECT source, node, d FROM p{APSP_ROUNDS} WHERE d > 0)"
    )
    return "\n".join(parts)


def sql_doc_closeness() -> str:
    return (
        _PROLOG
        + _apsp_ctes()
        + """
, sums AS (SELECT source AS id, SUM(d) AS ds FROM apsp GROUP BY source)
SELECT n.id,
       ROUND(CASE WHEN COALESCE(s.ds, 0) > 0
             THEN ((SELECT COUNT(*) FROM nodes) - 1.0) / s.ds
             ELSE 0.0 END, 5) AS centrality
FROM nodes n LEFT JOIN sums s ON n.id = s.id"""
    )


def q_doc_closeness_wf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wasserman–Faust 'improved' closeness: (r/(n−1))·(r/Σd)."""
    from linkgraph.algorithms.msbfs import closeness_centrality

    g = doc_graph(spark, sf_dir)
    out = closeness_centrality(g, improved=True, direction="BOTH")
    return out.select("id", F.round("centrality", 5).alias("centrality"))


def sql_doc_closeness_wf() -> str:
    return (
        _PROLOG
        + _apsp_ctes()
        + """
, sums AS (SELECT source AS id, COUNT(*) AS r, SUM(d) AS ds FROM apsp GROUP BY source)
SELECT n.id,
       ROUND(CASE WHEN COALESCE(s.ds, 0) > 0
             THEN (s.r / ((SELECT COUNT(*) FROM nodes) - 1.0)) * (s.r / CAST(s.ds AS DOUBLE))
             ELSE 0.0 END, 5) AS centrality
FROM nodes n LEFT JOIN sums s ON n.id = s.id"""
    )


def sql_doc_harmonic() -> str:
    return (
        _PROLOG
        + _apsp_ctes()
        + """
, sums AS (SELECT source AS id, SUM(1.0 / d) AS hs FROM apsp GROUP BY source)
SELECT n.id,
       ROUND(COALESCE(s.hs, 0.0) / ((SELECT COUNT(*) FROM nodes) - 1.0), 5) AS centrality
FROM nodes n LEFT JOIN sums s ON n.id = s.id"""
    )


def q_doc_dangalchev(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.msbfs import dangalchev_closeness

    g = doc_graph(spark, sf_dir)
    out = dangalchev_closeness(g, direction="BOTH")
    return out.select("id", F.round("centrality", 5).alias("centrality"))


def sql_doc_dangalchev() -> str:
    return (
        _PROLOG
        + _apsp_ctes()
        + """
, sums AS (SELECT source AS id, SUM(POWER(2.0, -d)) AS dc FROM apsp GROUP BY source)
SELECT n.id, ROUND(COALESCE(s.dc, 0.0), 5) AS centrality
FROM nodes n LEFT JOIN sums s ON n.id = s.id"""
    )


def q_doc_allsp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """allShortestPaths.stream (unweighted, BOTH) — every reached pair."""
    from linkgraph.algorithms.msbfs import all_shortest_paths_stream

    g = doc_graph(spark, sf_dir)
    return all_shortest_paths_stream(g, direction="BOTH")


def sql_doc_allsp() -> str:
    return (
        _PROLOG
        + _apsp_ctes()
        + "\nSELECT source, node AS target, CAST(d AS BIGINT) AS distance FROM apsp"
    )


# --------------------------------------------------- weighted path procedures
DIJKSTRA_TARGET = 137
ASTAR_TARGET = 271


def _weighted_doc_graph(spark: SparkSession, sf_dir: str) -> Graph:
    e = doc_edges(spark, sf_dir).withColumn(
        "weight", (1 + (F.col("src") + F.col("dst")) % 3).cast("double")
    )
    docs = load_documents(spark, sf_dir)
    return Graph.from_edges(e, nodes=docs.select(F.col("doc_id").alias("id")))


def q_doc_dijkstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shortestPath (Dijkstra pair 0 → target) — final cost row."""
    from linkgraph.algorithms.paths import shortest_path

    g = _weighted_doc_graph(spark, sf_dir)
    out = shortest_path(g, 0, DIJKSTRA_TARGET)
    return out.filter(F.col("node_id") == DIJKSTRA_TARGET).select(
        F.lit(0).cast("long").alias("source"),
        F.col("node_id").alias("target"),
        F.round("cost", 5).alias("cost"),
    )


def sql_doc_dijkstra() -> str:
    return sql_doc_sssp(
        f"SELECT CAST(0 AS BIGINT) AS source, id AS target, ROUND(dist, 5) AS cost "
        f"FROM d{{last}} WHERE id = {DIJKSTRA_TARGET} AND dist IS NOT NULL"
    )


def q_doc_astar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A* with a zero (all-equal-coordinate) heuristic ≡ Dijkstra cost."""
    from linkgraph.algorithms.paths import astar

    g = _weighted_doc_graph(spark, sf_dir)
    n = load_documents(spark, sf_dir).count()
    zeros = {i: 0.0 for i in range(int(n))}
    out = astar(g, 0, ASTAR_TARGET, lat=zeros, lon=zeros)
    return out.filter(F.col("node_id") == ASTAR_TARGET).select(
        F.lit(0).cast("long").alias("source"),
        F.col("node_id").alias("target"),
        F.round("cost", 5).alias("cost"),
    )


def sql_doc_astar() -> str:
    return sql_doc_sssp(
        f"SELECT CAST(0 AS BIGINT) AS source, id AS target, ROUND(dist, 5) AS cost "
        f"FROM d{{last}} WHERE id = {ASTAR_TARGET} AND dist IS NOT NULL"
    )


def q_doc_sssp_dijkstra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shortestPaths.stream (driver Dijkstra SSSP) — same oracle as delta."""
    from linkgraph.algorithms.paths import shortest_paths

    g = _weighted_doc_graph(spark, sf_dir)
    out = shortest_paths(g, 0)
    return out.select("node_id", F.round("distance", 5).alias("distance"))


# ------------------------------------------------------------- WCC threshold
def q_doc_wcc_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.wcc import wcc

    g = _weighted_doc_graph(spark, sf_dir)
    return wcc(g, threshold=1.5).select("id", "component")


def sql_doc_wcc_threshold() -> str:
    parts = [_PROLOG]
    parts.append(
        ", wet AS MATERIALIZED (SELECT src, dst FROM edges "
        "WHERE CAST(1 + (src + dst) % 3 AS DOUBLE) > 1.5)"
    )
    parts.append(
        ", uet AS MATERIALIZED (SELECT src, dst FROM wet UNION SELECT dst, src FROM wet)"
    )
    parts.append(", t0 AS (SELECT doc_id AS id, doc_id AS comp FROM documents)")
    for k in range(1, WCC_ROUNDS + 1):
        parts.append(
            f""", s{k} AS MATERIALIZED (
  SELECT l.id, LEAST(l.comp, COALESCE(nm.nmin, l.comp)) AS comp
  FROM t{k - 1} l LEFT JOIN (
    SELECT u.dst AS id, MIN(p.comp) AS nmin FROM uet u JOIN t{k - 1} p ON u.src = p.id GROUP BY u.dst
  ) nm ON l.id = nm.id)
, t{k} AS MATERIALIZED (
  SELECT m.id, COALESCE(p2.comp, m.comp) AS comp
  FROM s{k} m LEFT JOIN s{k} p2 ON m.comp = p2.id)"""
        )
    parts.append(f"SELECT id, comp AS component FROM t{WCC_ROUNDS}")
    return "\n".join(parts)


def q_doc_wcc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.wcc import wcc, wcc_stats

    comp = wcc(doc_graph(spark, sf_dir))
    return wcc_stats(comp).select("communityCount", "maxSetSize", "minSetSize")


def sql_doc_wcc_stats() -> str:
    return sql_doc_wcc(
        """SELECT COUNT(*) AS communityCount, MAX(sz) AS maxSetSize, MIN(sz) AS minSetSize
FROM (SELECT comp, COUNT(*) AS sz FROM l{last} GROUP BY comp) t"""
    )


# -------------------------------------------- similarity cutoffs / global top
def q_user_jaccard_cutoffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jaccard with degreeCutoff + similarityCutoff + topK + global top."""
    from linkgraph.algorithms.similarity import jaccard

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return jaccard(
        events, "user_id", "event_type",
        top_k=5, similarity_cutoff=0.4, degree_cutoff=3, top=50,
    ).select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        "similarity",
    )


def sql_user_jaccard_cutoffs() -> str:
    return """
WITH cats0 AS MATERIALIZED (SELECT DISTINCT user_id, event_type FROM events),
deg AS MATERIALIZED (
  SELECT user_id, COUNT(*) AS d FROM cats0 GROUP BY user_id HAVING COUNT(*) >= 3),
cats AS MATERIALIZED (
  SELECT c.user_id, c.event_type FROM cats0 c JOIN deg USING (user_id)),
inter AS (
  SELECT x.user_id AS a, y.user_id AS b, COUNT(*) AS i
  FROM cats x JOIN cats y ON x.event_type = y.event_type AND x.user_id <> y.user_id
  GROUP BY x.user_id, y.user_id),
scored AS (
  SELECT i.a, i.b, CAST(i.i AS DOUBLE) / (da.d + db.d - i.i) AS sim
  FROM inter i JOIN deg da ON da.user_id = i.a JOIN deg db ON db.user_id = i.b),
cut AS (SELECT a, b, sim FROM scored WHERE sim >= 0.4),
topk AS (
  SELECT a, b, sim,
         ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b ASC) AS rn
  FROM cut),
lim AS (
  SELECT a, b, sim FROM topk WHERE rn <= 5
  ORDER BY sim DESC, a ASC, b ASC LIMIT 50)
SELECT a, b, ROUND(sim, 5) AS similarity FROM lim"""


# ---------------------------------------------------- relationship dedup load
def q_rel_dedup_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphLoader duplicateRelationships=sum over a multi-edge table."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = events.select(
        F.pmod(F.col("user_id"), F.lit(50)).cast("long").alias("src"),
        F.pmod(F.ascii(F.substring("event_type", 1, 1)), F.lit(50)).cast("long").alias("dst"),
        F.col("value").alias("weight"),
    )
    g = Graph.from_edges(raw, duplicate_relationships="sum")
    return g.edges.select("src", "dst", F.round("weight", 5).alias("weight"))


def sql_rel_dedup_sum() -> str:
    return """
SELECT CAST(user_id % 50 AS BIGINT) AS src,
       CAST(ascii(substr(event_type, 1, 1)) % 50 AS BIGINT) AS dst,
       ROUND(SUM(value), 5) AS weight
FROM events GROUP BY 1, 2"""


def q_rel_dedup_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duplicateRelationships=min and =max side by side on one edge table."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = events.select(
        F.pmod(F.col("user_id"), F.lit(50)).cast("long").alias("src"),
        F.pmod(F.ascii(F.substring("event_type", 1, 1)), F.lit(50)).cast("long").alias("dst"),
        F.col("value").alias("weight"),
    )
    gmin = Graph.from_edges(raw, duplicate_relationships="min").edges.select(
        "src", "dst", F.round("weight", 5).alias("w_min")
    )
    gmax = Graph.from_edges(raw, duplicate_relationships="max").edges.select(
        "src", "dst", F.round("weight", 5).alias("w_max")
    )
    return gmin.join(gmax, ["src", "dst"])


def sql_rel_dedup_minmax() -> str:
    return """
SELECT CAST(user_id % 50 AS BIGINT) AS src,
       CAST(ascii(substr(event_type, 1, 1)) % 50 AS BIGINT) AS dst,
       ROUND(MIN(value), 5) AS w_min, ROUND(MAX(value), 5) AS w_max
FROM events GROUP BY 1, 2"""


# ------------------------------------------------------ vector similarity procs
def _emb_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(F.col("vec_id").alias("item"), F.col("embedding").alias("weights"))


_EMB_V = """
WITH v AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings)
"""


def q_emb_cosine_procs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.vector_similarity import cosine as vcos

    return vcos(_emb_items(spark, sf_dir), top_k=3, similarity_cutoff=0.1)


def sql_emb_cosine_procs() -> str:
    return (
        _EMB_V
        + """,
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         list_dot_product(a.e, b.e) /
           GREATEST(sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)), 1e-300) AS sim
  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
cut AS (SELECT a, b, sim FROM pairs WHERE sim >= 0.1),
ranked AS (
  SELECT a, b, sim, ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b ASC) AS rn
  FROM cut)
SELECT a, b, ROUND(sim, 6) AS similarity FROM ranked WHERE rn <= 3"""
    )


def q_emb_euclidean_procs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.vector_similarity import euclidean as veuc

    return veuc(_emb_items(spark, sf_dir), top_k=3)


def sql_emb_euclidean_procs() -> str:
    return (
        _EMB_V
        + """,
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         sqrt(GREATEST(list_dot_product(a.e, a.e) + list_dot_product(b.e, b.e)
              - 2 * list_dot_product(a.e, b.e), 0.0)) AS dist
  FROM v a JOIN v b ON a.vec_id <> b.vec_id),
ranked AS (
  SELECT a, b, dist, ROW_NUMBER() OVER (PARTITION BY a ORDER BY dist ASC, b ASC) AS rn
  FROM pairs)
SELECT a, b, ROUND(dist, 6) AS similarity FROM ranked WHERE rn <= 3"""
    )


def q_emb_pearson_procs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.vector_similarity import pearson as vpear

    return vpear(_emb_items(spark, sf_dir), top_k=3)


def sql_emb_pearson_procs() -> str:
    return (
        _EMB_V
        + """,
c AS MATERIALIZED (
  SELECT vec_id,
         list_transform(e, x -> x - list_aggregate(e, 'avg')) AS ce
  FROM v),
pairs AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         list_dot_product(a.ce, b.ce) /
           GREATEST(sqrt(list_dot_product(a.ce, a.ce)) * sqrt(list_dot_product(b.ce, b.ce)), 1e-300) AS sim
  FROM c a JOIN c b ON a.vec_id <> b.vec_id),
ranked AS (
  SELECT a, b, sim, ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b ASC) AS rn
  FROM pairs)
SELECT a, b, ROUND(sim, 6) AS similarity FROM ranked WHERE rn <= 3"""
    )


# --------------------------------------------------------- scalar function suite
def q_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per doc exercising the scalar-function surface (§2.7):
    jaccard/overlap/cosine/euclideanDistance/euclideanSimilarity over
    deterministic int lists, oneHotEncoding, isFinite."""
    from linkgraph.functions.similarities import (
        cosine_lists,
        euclidean_distance_lists,
        euclidean_similarity_lists,
        is_finite,
        jaccard_lists,
        one_hot_encoding,
        overlap_lists,
    )

    docs = load_documents(spark, sf_dir)
    # equal-length (4-element) lists: the vector kernels require matching dims
    a = F.sequence(
        F.pmod(F.col("doc_id"), F.lit(7)), F.pmod(F.col("doc_id"), F.lit(7)) + 3
    )
    b = F.sequence(
        F.pmod(F.col("doc_id"), F.lit(5)), F.pmod(F.col("doc_id"), F.lit(5)) + 3
    )
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    x = F.when(F.pmod(F.col("doc_id"), F.lit(10)) == 0, F.lit(None)).otherwise(
        F.lit(1.0) / F.col("doc_id")
    )
    return docs.select(
        "doc_id",
        F.round(jaccard_lists(a, b), 5).alias("jaccard"),
        F.round(overlap_lists(a, b), 5).alias("overlap"),
        F.round(cosine_lists(ad, bd), 5).alias("cosine"),
        F.round(euclidean_distance_lists(ad, bd), 5).alias("euclid_dist"),
        F.round(euclidean_similarity_lists(ad, bd), 5).alias("euclid_sim"),
        F.concat_ws(",", one_hot_encoding(
            F.sequence(F.lit(0), F.lit(4)),
            F.array(F.pmod(F.col("doc_id"), F.lit(5))),
        )).alias("one_hot"),
        is_finite(x).cast("boolean").alias("finite"),
    )


def sql_scalar_functions() -> str:
    return """
WITH t AS (
  SELECT doc_id,
         range(doc_id % 7, doc_id % 7 + 4) AS a,
         range(doc_id % 5, doc_id % 5 + 4) AS b,
         list_transform(range(doc_id % 7, doc_id % 7 + 4), x -> CAST(x AS DOUBLE)) AS ad,
         list_transform(range(doc_id % 5, doc_id % 5 + 4), x -> CAST(x AS DOUBLE)) AS bd,
         CASE WHEN doc_id % 10 = 0 THEN NULL ELSE 1.0 / doc_id END AS x
  FROM documents),
m AS (
  SELECT doc_id, a, b, ad, bd, x,
         len(list_intersect(a, b)) AS inter,
         len(a) + len(b) - len(list_intersect(a, b)) AS uni,
         list_dot_product(ad, bd) AS dot,
         sqrt(list_dot_product(ad, ad)) AS na,
         sqrt(list_dot_product(bd, bd)) AS nb,
         sqrt(GREATEST(list_dot_product(ad, ad) + list_dot_product(bd, bd)
              - 2 * list_dot_product(ad, bd), 0.0)) AS ed
  FROM t)
SELECT doc_id,
       ROUND(CASE WHEN uni > 0 THEN CAST(inter AS DOUBLE) / uni ELSE 0.0 END, 5) AS jaccard,
       ROUND(CASE WHEN LEAST(len(a), len(b)) > 0
             THEN CAST(inter AS DOUBLE) / LEAST(len(a), len(b)) ELSE 0.0 END, 5) AS overlap,
       ROUND(CASE WHEN na > 0 AND nb > 0 THEN dot / (na * nb) ELSE 0.0 END, 5) AS cosine,
       ROUND(ed, 5) AS euclid_dist,
       ROUND(1.0 / (1.0 + ed), 5) AS euclid_sim,
       array_to_string(list_transform(range(0, 5),
           v -> CASE WHEN v = doc_id % 5 THEN 1 ELSE 0 END), ',') AS one_hot,
       CASE WHEN x IS NULL THEN false ELSE isfinite(x) END AS finite
FROM m"""


# ---------------------------------------------------------- sameCommunity
def q_doc_same_community(spark: SparkSession, sf_dir: str) -> DataFrame:
    """linkprediction.sameCommunity over WCC labels of the doc-edge pairs."""
    from linkgraph.algorithms.wcc import wcc
    from linkgraph.functions.linkprediction import same_community

    g = doc_graph(spark, sf_dir)
    comp = wcc(g)
    e = g.edges.select("src", "dst")
    la = comp.select(F.col("id").alias("src"), F.col("component").alias("ca"))
    lb = comp.select(F.col("id").alias("dst"), F.col("component").alias("cb"))
    pairs = e.join(la, "src").join(lb, "dst")
    return same_community(pairs, "ca", "cb").select("src", "dst", "same_community")


def sql_doc_same_community() -> str:
    return sql_doc_wcc(
        """SELECT e.src, e.dst,
       CASE WHEN la.comp = lb.comp THEN 1.0 ELSE 0.0 END AS same_community
FROM edges e JOIN l{last} la ON e.src = la.id JOIN l{last} lb ON e.dst = lb.id"""
    )


# ---------------------------------------------------------- weighted degrees
def q_doc_degree_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _weighted_doc_graph(spark, sf_dir)
    out_w = g.degrees(direction="OUTGOING", weighted=True).select(
        "id", F.round("degree", 5).alias("out_weighted")
    )
    both_w = g.degrees(direction="BOTH", weighted=True).select(
        "id", F.round("degree", 5).alias("both_weighted")
    )
    return out_w.join(both_w, "id")


def sql_doc_degree_weighted() -> str:
    return (
        _PROLOG
        + """, we AS MATERIALIZED (SELECT src, dst,
    CAST(1 + (src + dst) % 3 AS DOUBLE) AS w FROM edges)
, uw AS MATERIALIZED (
  SELECT src, dst, MAX(w) AS w FROM (
    SELECT src, dst, w FROM we UNION ALL SELECT dst, src, w FROM we) t
  GROUP BY src, dst)
SELECT n.id,
       ROUND(COALESCE(o.s, 0.0), 5) AS out_weighted,
       ROUND(COALESCE(bb.s, 0.0), 5) AS both_weighted
FROM nodes n
LEFT JOIN (SELECT src, SUM(w) AS s FROM we GROUP BY src) o ON n.id = o.src
LEFT JOIN (SELECT src, SUM(w) AS s FROM uw GROUP BY src) bb ON n.id = bb.src"""
    )


# ---------------------------------------------------- typed subgraph loader
def q_doc_subgraph_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphLoader withLabel + withRelationshipType: induced subgraph of
    en/de documents over 'cites'-typed edges, BOTH-direction degree.

    Ref: core/GraphLoader.java withLabel/withRelationshipType."""
    from linkgraph.loader import GraphLoader

    docs = load_documents(spark, sf_dir)
    e = doc_edges(spark, sf_dir).withColumn(
        "rel_type",
        F.when((F.col("src") * 7 + F.col("dst")) % 3 == 0, F.lit("cites")).otherwise(
            F.lit("links")
        ),
    )
    g = (
        GraphLoader()
        .with_nodes(docs, id_col="doc_id", label_col="lang")
        .with_relationships(e, type_col="rel_type")
        .with_label("en", "de")
        .with_relationship_type("cites")
        .load()
    )
    return g.degrees(direction="BOTH").select(
        "id", F.col("degree").cast("long").alias("both_degree")
    )


def sql_doc_subgraph_degree() -> str:
    return (
        _PROLOG
        + """, fn AS MATERIALIZED (SELECT doc_id AS id FROM documents WHERE lang IN ('en','de'))
, fe AS MATERIALIZED (
  SELECT e.src, e.dst FROM edges e
  JOIN fn a ON e.src = a.id JOIN fn b ON e.dst = b.id
  WHERE (e.src * 7 + e.dst) % 3 = 0)
, fue AS (SELECT src, dst FROM fe UNION SELECT dst, src FROM fe)
SELECT fn.id, CAST(COALESCE(d.c, 0) AS BIGINT) AS both_degree
FROM fn LEFT JOIN (SELECT src, COUNT(*) AS c FROM fue GROUP BY src) d ON fn.id = d.src"""
    )


# ------------------------------------------------- stateful streaming (ANP)
def q_stream_distinct_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState running-distinct-degree over the doc edges
    replayed as a file stream; final state must equal batch COUNT(DISTINCT).
    """
    import shutil
    import tempfile

    from linkgraph.streaming import stateful_distinct_degree

    tmp = tempfile.mkdtemp(prefix="linkgraph_stream_")
    try:
        src_dir = f"{tmp}/edges"
        e = doc_edges(spark, sf_dir)
        e.write.parquet(src_dir)
        e.write.mode("append").parquet(src_dir)  # replay: state must dedup
        stream = spark.readStream.schema("src long, dst long").parquet(src_dir)
        final: dict = {}

        def collect_batch(df: DataFrame, _bid: int) -> None:
            for r in df.collect():  # update mode: later batches overwrite
                final[r["src"]] = (r["distinct_neighbors"], r["total_edges"])

        q = (
            stateful_distinct_degree(stream)
            .writeStream.foreachBatch(collect_batch)
            .outputMode("update")
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = [(k, v[0], v[1]) for k, v in final.items()]
        return spark.createDataFrame(
            rows, "src long, distinct_neighbors long, total_edges long"
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def sql_stream_distinct_degree() -> str:
    return (
        _PROLOG
        + """
SELECT src, CAST(COUNT(DISTINCT dst) AS BIGINT) AS distinct_neighbors,
       CAST(2 * COUNT(*) AS BIGINT) AS total_edges
FROM edges GROUP BY src"""
    )


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup over the documents replayed TWICE as a file
    stream (the second copy must be fully dropped by state); survivors'
    md5 content hashes must equal batch SELECT DISTINCT md5(text)."""
    import shutil
    import tempfile

    from linkgraph.streaming import run_available_now, stream_exact_dedup

    tmp = tempfile.mkdtemp(prefix="linkgraph_sdedup_")
    try:
        src_dir = f"{tmp}/docs"
        docs = load_documents(spark, sf_dir).select("doc_id", "text")
        docs.write.parquet(src_dir)
        docs.write.mode("append").parquet(src_dir)  # replay: state must dedup
        stream = spark.readStream.schema("doc_id long, text string").parquet(src_dir)
        rows = run_available_now(
            stream_exact_dedup(stream, hash_fn="md5"), "stream_dedup_q"
        )
        return spark.createDataFrame(
            sorted({r["text_hash"] for r in rows}), "string"
        ).toDF("text_hash")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def sql_stream_dedup() -> str:
    return "SELECT DISTINCT md5(text) AS text_hash FROM documents"


# ---------------------------------------------------------- triangle stream
def q_doc_triangle_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.triangles import triangle_stream

    return triangle_stream(doc_graph(spark, sf_dir))


def sql_doc_triangle_stream() -> str:
    return (
        _PROLOG
        + """SELECT e1.a AS a, e1.b AS b, e2.b AS c
FROM ce e1 JOIN ce e2 ON e1.a = e2.a AND e1.b < e2.b
JOIN ce e3 ON e3.a = e1.b AND e3.b = e2.b"""
    )


# ---------------------------------------------------------- pagerank pull path
def q_doc_pagerank_pull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same PageRank, pull/CSC strategy — validates the zero-shuffle path
    against the identical oracle as doc_pagerank."""
    from linkgraph.algorithms.pagerank import PageRank

    g = doc_graph(spark, sf_dir)
    ranks = PageRank(damping=DAMPING, max_iterations=PR_ITERS, strategy="pull").run(g)
    return ranks.select("id", F.round("rank", 5).alias("rank"))


# ------------------------------------------------- sparse similarity (asVector)
def _user_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user, event_type, count) — deterministic integer weights."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    return events.groupBy(
        F.col("user_id").alias("item"), F.col("event_type").alias("category")
    ).agg(F.count(F.lit(1)).cast("double").alias("weight"))


def q_user_cosine_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """algo.similarity.cosine over the sparse asVector input path —
    inverted-index pair generation, no broadcast/collect."""
    from linkgraph.algorithms.vector_similarity import cosine_sparse

    return cosine_sparse(_user_sparse(spark, sf_dir), top_k=3)


_USER_SPARSE_SQL = """
WITH w AS MATERIALIZED (
  SELECT user_id AS item, event_type AS category, CAST(COUNT(*) AS DOUBLE) AS wt
  FROM events GROUP BY user_id, event_type),
stats AS MATERIALIZED (
  SELECT item, SUM(wt * wt) AS q FROM w GROUP BY item),
dots AS (
  SELECT x.item AS a, y.item AS b, SUM(x.wt * y.wt) AS dot
  FROM w x JOIN w y ON x.category = y.category AND x.item < y.item
  GROUP BY x.item, y.item)
"""


def sql_user_cosine_sparse() -> str:
    return (
        _USER_SPARSE_SQL
        + """,
scored AS (
  SELECT d.a, d.b, d.dot / GREATEST(sqrt(sa.q) * sqrt(sb.q), 1e-300) AS sim
  FROM dots d JOIN stats sa ON sa.item = d.a JOIN stats sb ON sb.item = d.b),
ranked AS (
  SELECT a, b, sim, ROW_NUMBER() OVER (PARTITION BY a ORDER BY sim DESC, b ASC) AS rn
  FROM scored)
SELECT a, b, ROUND(sim, 6) AS similarity FROM ranked WHERE rn <= 3"""
    )


def q_user_sim_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimilarityProc writeResult summary row over the sparse cosine pairs."""
    from linkgraph.algorithms.vector_similarity import cosine_sparse, similarity_summary

    pairs = cosine_sparse(_user_sparse(spark, sf_dir), similarity_cutoff=0.2)
    row = similarity_summary(pairs)
    return row.select(
        "nodes",
        "similarityPairs",
        F.round("min", 5).alias("min"),
        F.round("max", 5).alias("max"),
        F.round("mean", 5).alias("mean"),
    )


def sql_user_sim_summary() -> str:
    return (
        _USER_SPARSE_SQL
        + """,
scored AS (
  SELECT d.a, d.b,
         ROUND(d.dot / GREATEST(sqrt(sa.q) * sqrt(sb.q), 1e-300), 6) AS sim
  FROM dots d JOIN stats sa ON sa.item = d.a JOIN stats sb ON sb.item = d.b),
cut AS (SELECT a, b, sim FROM scored WHERE sim >= 0.2)
SELECT (SELECT COUNT(DISTINCT i) FROM (SELECT a AS i FROM cut UNION SELECT b FROM cut) u) AS nodes,
       COUNT(*) AS similarityPairs,
       ROUND(MIN(sim), 5) AS min,
       ROUND(MAX(sim), 5) AS max,
       ROUND(AVG(sim), 5) AS mean
FROM cut"""
    )


WAPSP_ROUNDS = 18


def q_doc_allsp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted allShortestPaths.stream — per-source Dijkstra over the
    distributed CSR store, sources fanned across tasks. Directed graph."""
    from linkgraph.algorithms.msbfs import weighted_all_shortest_paths

    g = _weighted_doc_graph(spark, sf_dir)
    out = weighted_all_shortest_paths(g, direction="OUTGOING")
    return out.select("source", "target", F.round("distance", 5).alias("distance"))


def sql_doc_allsp_weighted() -> str:
    """Weighted pair-Bellman-Ford unrolled to fixpoint (hops ≤ WAPSP_ROUNDS)."""
    parts = [_PROLOG]
    parts.append(
        ", we AS MATERIALIZED (SELECT src, dst, "
        "CAST(1 + (src + dst) % 3 AS DOUBLE) AS w FROM edges)"
    )
    parts.append(
        ", w0 AS MATERIALIZED (SELECT id AS source, id AS node, "
        "CAST(0.0 AS DOUBLE) AS d FROM nodes)"
    )
    for k in range(1, WAPSP_ROUNDS + 1):
        parts.append(
            f""", w{k} AS MATERIALIZED (
  SELECT source, node, MIN(d) AS d FROM (
    SELECT source, node, d FROM w{k - 1}
    UNION ALL
    SELECT p.source, e.dst AS node, p.d + e.w AS d
    FROM w{k - 1} p JOIN we e ON p.node = e.src
  ) t GROUP BY source, node)"""
        )
    parts.append(
        f"SELECT source, node AS target, ROUND(d, 5) AS distance "
        f"FROM w{WAPSP_ROUNDS} WHERE source <> node"
    )
    return "\n".join(parts)


def q_doc_kspanning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.paths import k_spanning_tree

    g = _weighted_doc_graph(spark, sf_dir)
    return k_spanning_tree(g, k=5)


def sql_doc_balanced_triads() -> str:
    sgn = "CASE WHEN ({x} + {y}) % 2 = 0 THEN 1 ELSE -1 END"
    return (
        _PROLOG
        + f""", tri AS MATERIALIZED (
  SELECT w.a, w.b, w.c,
         ({sgn.format(x='w.a', y='w.b')}) * ({sgn.format(x='w.a', y='w.c')})
           * ({sgn.format(x='w.b', y='w.c')}) > 0 AS bal
  FROM (
    SELECT e1.a, e1.b, e2.b AS c
    FROM ce e1 JOIN ce e2 ON e1.a = e2.a AND e1.b < e2.b
  ) w JOIN ce e3 ON e3.a = w.b AND e3.b = w.c)
, corners AS (
  SELECT a AS id, bal FROM tri
  UNION ALL SELECT b, bal FROM tri
  UNION ALL SELECT c, bal FROM tri)
, agg AS (
  SELECT id, SUM(CASE WHEN bal THEN 1 ELSE 0 END) AS balanced,
         SUM(CASE WHEN bal THEN 0 ELSE 1 END) AS unbalanced
  FROM corners GROUP BY id)
SELECT n.id, CAST(COALESCE(a.balanced, 0) AS BIGINT) AS balanced,
       CAST(COALESCE(a.unbalanced, 0) AS BIGINT) AS unbalanced
FROM nodes n LEFT JOIN agg a ON n.id = a.id"""
    )


def q_doc_kspanning_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-spanning-tree invariant: cutting k−1 tree edges of a forest with c
    components yields exactly c + k − 1 clusters (oracle computes c via the
    WCC component-count CTE)."""
    out = q_doc_kspanning(spark, sf_dir)
    return out.agg(F.countDistinct("cluster").cast("long").alias("n_clusters"))


def sql_doc_kspanning_stats() -> str:
    parts = [_PROLOG]
    parts.append(_wcc_count_cte("kfull", "SELECT src, dst FROM edges"))
    parts.append(
        "SELECT CAST((SELECT cnt FROM c_kfull) + 4 AS BIGINT) AS n_clusters"
    )
    return "\n".join(parts)


def q_doc_infomap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.infomap import infomap

    g = doc_graph(spark, sf_dir)
    return infomap(g, pr_iterations=20)


# ------------------------------------------------------------ rows-only extras
def q_doc_yen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.paths import yens_k_shortest_paths

    g = _weighted_doc_graph(spark, sf_dir)
    return yens_k_shortest_paths(g, 0, DIJKSTRA_TARGET, k=3)


def q_doc_mst_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MST total weight + edge count — oracle-checkable even though the
    tree itself is not unique (ties): every minimum spanning forest has
    the same weight multiset. Oracle = Kruskal's component-count identity
    MST_w = Σ_w w·(c(G_{<w}) − c(G_{≤w})) with c() from the unrolled WCC
    CTE on each weight-threshold subgraph."""
    from linkgraph.algorithms.paths import minimum_spanning_forest

    forest = q_doc_mst(spark, sf_dir)
    return forest.agg(
        F.round(F.sum("weight"), 5).alias("total_weight"),
        F.count(F.lit(1)).alias("n_edges"),
    )


def q_doc_maxst_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-spanning-forest total weight (Kruskal identity from the top:
    #edges of weight ≥ w in any MaxSF = n − c(G_{≥w}))."""
    forest = q_doc_spanning_tree_max(spark, sf_dir)
    return forest.agg(
        F.round(F.sum("weight"), 5).alias("total_weight"),
        F.count(F.lit(1)).alias("n_edges"),
    )


def sql_doc_maxst_weight() -> str:
    parts = [_PROLOG]
    parts.append(
        ", wce AS MATERIALIZED (SELECT LEAST(src,dst) AS src, GREATEST(src,dst) AS dst, "
        "1 + (src + dst) % 3 AS w FROM edges GROUP BY 1, 2, 3)"
    )
    for w in (3, 2, 1):
        parts.append(
            _wcc_count_cte(f"h{w}", f"SELECT src, dst FROM wce WHERE w >= {w}")
        )
    parts.append(
        """
SELECT CAST(ROUND(
    3*((SELECT COUNT(*) FROM documents) - (SELECT cnt FROM c_h3))
  + 2*((SELECT cnt FROM c_h3) - (SELECT cnt FROM c_h2))
  + 1*((SELECT cnt FROM c_h2) - (SELECT cnt FROM c_h1)), 5) AS DOUBLE) AS total_weight,
  CAST((SELECT COUNT(*) FROM documents) - (SELECT cnt FROM c_h1) AS BIGINT) AS n_edges"""
    )
    return "\n".join(parts)


def _wcc_count_cte(tag: str, edge_src: str) -> str:
    """Component count of the symmetric closure of `edge_src` (SQL rel with
    src,dst cols) as CTE c_<tag>(cnt), via WCC_ROUNDS hash-min rounds."""
    parts = [
        f", ue_{tag} AS MATERIALIZED (SELECT src, dst FROM ({edge_src}) "
        f"UNION SELECT dst, src FROM ({edge_src}))",
        f", {tag}_l0 AS (SELECT doc_id AS id, doc_id AS comp FROM documents)",
    ]
    for k in range(1, WCC_ROUNDS + 1):
        parts.append(
            f""", {tag}_m{k} AS MATERIALIZED (
  SELECT l.id, LEAST(l.comp, COALESCE(nm.nmin, l.comp)) AS comp
  FROM {tag}_l{k - 1} l LEFT JOIN (
    SELECT u.dst AS id, MIN(p.comp) AS nmin
    FROM ue_{tag} u JOIN {tag}_l{k - 1} p ON u.src = p.id GROUP BY u.dst
  ) nm ON l.id = nm.id)
, {tag}_l{k} AS MATERIALIZED (
  SELECT m.id, COALESCE(p2.comp, m.comp) AS comp
  FROM {tag}_m{k} m LEFT JOIN {tag}_m{k} p2 ON m.comp = p2.id)"""
        )
    parts.append(
        f", c_{tag} AS (SELECT COUNT(DISTINCT comp) AS cnt FROM {tag}_l{WCC_ROUNDS})"
    )
    return "\n".join(parts)


def sql_doc_mst_weight() -> str:
    parts = [_PROLOG]
    parts.append(
        ", wce AS MATERIALIZED (SELECT LEAST(src,dst) AS src, GREATEST(src,dst) AS dst, "
        "1 + (src + dst) % 3 AS w FROM edges GROUP BY 1, 2, 3)"
    )
    for w in (1, 2, 3):
        parts.append(
            _wcc_count_cte(f"g{w}", f"SELECT src, dst FROM wce WHERE w <= {w}")
        )
    parts.append(
        """
SELECT CAST(ROUND(
    1*((SELECT COUNT(*) FROM documents) - (SELECT cnt FROM c_g1))
  + 2*((SELECT cnt FROM c_g1) - (SELECT cnt FROM c_g2))
  + 3*((SELECT cnt FROM c_g2) - (SELECT cnt FROM c_g3)), 5) AS DOUBLE) AS total_weight,
  CAST((SELECT COUNT(*) FROM documents) - (SELECT cnt FROM c_g3) AS BIGINT) AS n_edges"""
    )
    return "\n".join(parts)


def q_doc_dfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.paths import dfs

    g = doc_graph(spark, sf_dir)
    return dfs(g, 0)


def q_doc_spanning_tree_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.algorithms.paths import minimum_spanning_forest

    g = _weighted_doc_graph(spark, sf_dir)
    return minimum_spanning_forest(g, maximum=True)


def q_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline.dedup import simhash_candidates

    return simhash_candidates(load_documents(spark, sf_dir), max_hamming=7)


def q_emb_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded hyperplane-LSH near-dup pairs at cosine ≥ 0.98.

    The oracle is brute-force all-pairs cosine — with the exact cosine
    re-check after the LSH candidate join, precision is provable; recall
    holds because the 8×8 banding recall at this threshold is ≈0.9998 per
    pair. The sf0.01 corpus has no organic pair above 0.52, which would
    make a 0.98-threshold oracle vacuously true on 0 rows — so the query
    input plants 10 deterministic exact duplicates (vec_id+100000 copies
    of vec_id<10, mirrored in the SQL oracle): LSH recall on identical
    vectors is exactly 1 (same hyperplane signs in every band), so the
    driver check exercises real pairs."""
    from linkgraph.pipeline.dedup import embedding_near_duplicates

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    planted = emb.filter(F.col("vec_id") < 10).withColumn(
        "vec_id", (F.col("vec_id") + F.lit(100000)).cast("long")
    )
    return embedding_near_duplicates(emb.unionByName(planted))


def sql_emb_near_dup() -> str:
    return """
WITH base AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT CAST(vec_id + 100000 AS BIGINT) AS vec_id, embedding
  FROM embeddings WHERE vec_id < 10),
v AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM base)
SELECT a, b, cosine FROM (
  SELECT a.vec_id AS a, b.vec_id AS b,
         ROUND(list_dot_product(a.e, b.e) /
           (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 4) AS cosine
  FROM v a JOIN v b ON a.vec_id < b.vec_id
) WHERE cosine >= 0.98"""


def q_emb_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC ANN: coarse-cell pruning (nprobe=2 of 8 cells) in front of
    the asymmetric-distance re-rank over RESIDUAL-encoded codes
    (x − cell-mean anchors) — the 10⁹-vector shape, not a linear ADC scan.
    Top-3 for the first 20 query vectors (rows-only: PQ codes depend on
    seeded k-means, not SQL-reproducible)."""
    from linkgraph.pipeline.ann import (
        ivf_cell_means,
        pq_encode,
        pq_topk_ivf,
        pq_train,
        train_ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cent = train_ivf_centroids(emb, num_cells=8)
    anchors = ivf_cell_means(emb, cent)
    books = pq_train(emb, num_subspaces=8, bits=6, iters=4,
                     centroids=cent, residual=True, anchors=anchors)
    codes = pq_encode(emb, books, centroids=cent, residual=True, anchors=anchors)
    qs = emb.filter(F.col("vec_id") < 20)
    return pq_topk_ivf(qs, codes, books, cent, k=3, nprobe=2,
                       residual=True, anchors=anchors)


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from linkgraph.pipeline.multimodal import frame_sample, synthesize_media

    return frame_sample(synthesize_media(spark, n=32))


# Thresholds re-centered on the synthetic corpus (10-99 words/doc, mean
# word length 3.7-5.3) so every funnel branch is reachable; the RULE SET
# and order are Gopher's (Rae et al. 2021, A1.1).
_GOPHER_PARAMS = dict(
    min_words=30,
    max_words=90,
    min_mean_word_len=4.0,
    max_mean_word_len=5.0,
    min_stopword_hits=1,
)


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality-rule funnel (word-count / mean-word-length /
    symbol-ratio / bullet-ellipsis / alpha-ratio / stop-words) — pure
    codegen column expressions, zero shuffle."""
    from linkgraph.pipeline.text import gopher_rules

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return gopher_rules(docs, **_GOPHER_PARAMS)


def sql_gopher_rules() -> str:
    from linkgraph.pipeline.text import GOPHER_STOPWORDS

    p = _GOPHER_PARAMS
    stop_hits = " + ".join(
        f"list_contains(toks, '{w}')::INT" for w in GOPHER_STOPWORDS
    )
    return f"""
WITH f AS (
  SELECT doc_id,
         len(toks)::BIGINT AS n_words,
         list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) AS mean_wl,
         (len(regexp_extract_all(text, '#'))
          + len(regexp_extract_all(text, '\\.\\.\\.')))::DOUBLE AS symbols,
         len(list_filter(lines, l -> starts_with(l, '- ') OR starts_with(l, '•')))::DOUBLE
           / len(lines) AS bullet_frac,
         len(list_filter(lines, l -> ends_with(l, '...')))::DOUBLE
           / len(lines) AS ellipsis_frac,
         len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE
           / len(toks) AS alpha_frac,
         {stop_hits} AS stop_hits
  FROM (SELECT doc_id, text,
               string_split(text, ' ') AS toks,
               string_split(text, chr(10)) AS lines
        FROM documents)),
decided AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words < {p["min_words"]} OR n_words > {p["max_words"]}
                THEN 'word_count'
              WHEN mean_wl < {p["min_mean_word_len"]} OR mean_wl > {p["max_mean_word_len"]}
                THEN 'mean_word_length'
              WHEN symbols / n_words > 0.1 THEN 'symbol_ratio'
              WHEN bullet_frac > 0.9 OR ellipsis_frac > 0.3 THEN 'bullet_ellipsis'
              WHEN alpha_frac < 0.8 THEN 'alpha_ratio'
              WHEN stop_hits < {p["min_stopword_hits"]} THEN 'stop_words'
              ELSE '' END AS fail_reason
  FROM f)
SELECT doc_id, n_words, fail_reason = '' AS keep, fail_reason FROM decided"""


# -------------------------------------------------------- batch PPR (r5)
PPR_SEEDS = [0, 7, 13, 42]
PPR_B_ITERS = 10
PPR_B_K = 10


def q_doc_ppr_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch personalized PageRank: 4 seeds in ONE superstep loop (wide
    rank columns, S seeds = one edge pass not S), top-10 nodes per seed.
    Oracle = the recurrence unrolled into a generated CTE chain."""
    from linkgraph.algorithms.ppr import ppr_topk

    g = doc_graph(spark, sf_dir)
    return ppr_topk(
        g, PPR_SEEDS, k=PPR_B_K, damping=DAMPING, iterations=PPR_B_ITERS
    )


def sql_doc_ppr_topk() -> str:
    rcols = [f"r{i}" for i in range(len(PPR_SEEDS))]
    ind = {
        c: f"CASE WHEN n.id = {s} THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
        for c, s in zip(rcols, PPR_SEEDS)
    }
    parts = [_PROLOG]
    parts.append(
        ", outdeg AS MATERIALIZED (SELECT src, COUNT(*) AS wsum FROM edges GROUP BY src)"
    )
    init = ", ".join(ind[c].replace("n.id", "id") + f" AS {c}" for c in rcols)
    parts.append(f", p0 AS (SELECT id, {init} FROM nodes)")
    for k in range(1, PPR_B_ITERS + 1):
        upd = ", ".join(
            f"{_ONE_MINUS_D} * ({ind[c]}) + {_D} * COALESCE(c.{c}, CAST(0.0 AS DOUBLE)) AS {c}"
            for c in rcols
        )
        sums = ", ".join(f"SUM(r.{c} / o.wsum) AS {c}" for c in rcols)
        parts.append(
            f""", p{k} AS MATERIALIZED (
  SELECT n.id, {upd}
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id, {sums}
    FROM edges e JOIN p{k - 1} r ON e.src = r.id JOIN outdeg o ON e.src = o.src
    GROUP BY e.dst
  ) c ON n.id = c.id)"""
        )
    longs = " UNION ALL ".join(
        f"SELECT CAST({s} AS BIGINT) AS seed, id, ROUND({c}, 5) AS score FROM p{PPR_B_ITERS}"
        for c, s in zip(rcols, PPR_SEEDS)
    )
    parts.append(
        f""", longf AS ({longs})
SELECT seed, id, score, rk FROM (
  SELECT seed, id, score,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY seed ORDER BY score DESC, id ASC) AS INT) AS rk
  FROM longf)
WHERE rk <= {PPR_B_K}"""
    )
    return "\n".join(parts)


# ------------------------------------- neighbor feature aggregation (r5)
def q_nbr_mean_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GraphSAGE-style mean aggregator over the doc graph: element-wise
    mean of out-neighbors' embeddings, ONE shuffle, per-dimension F.avg
    codegen aggregates (no explode, no UDF). Long (id, dim, ...) output
    for the value-hash."""
    from linkgraph.pipeline.embed import neighbor_mean_embeddings

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    wide = neighbor_mean_embeddings(doc_edges(spark, sf_dir), emb, dim=64)
    return wide.select(
        "id", "nbr_degree", F.posexplode("nbr_mean").alias("dim", "mval")
    ).select(
        "id",
        F.col("dim").cast("int").alias("dim"),
        F.col("nbr_degree").cast("long").alias("nbr_degree"),
        "mval",
    )


def sql_nbr_mean_embedding() -> str:
    return (
        _PROLOG
        + """
, nb AS MATERIALIZED (
  SELECT e.src AS id, emb.embedding AS v
  FROM edges e JOIN embeddings emb ON e.dst = emb.vec_id),
longf AS (
  SELECT id, unnest(v) AS val, unnest(range(0, len(v))) AS dim FROM nb),
deg AS (SELECT id, COUNT(*) AS nbr_degree FROM nb GROUP BY id)
SELECT l.id, CAST(l.dim AS INT) AS dim,
       CAST(d.nbr_degree AS BIGINT) AS nbr_degree,
       ROUND(AVG(l.val), 5) AS mval
FROM longf l JOIN deg d USING (id)
GROUP BY l.id, l.dim, d.nbr_degree"""
    )


# ------------------------------------------------ C4 line cleaning (r5)
_C4_CHUNK = 8


def _planted_multiline_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents re-rendered as multi-LINE pages (the corpus is single-line)
    with deterministically planted cleaning targets: every 3rd line lacks
    terminal punctuation, doc_id%4 pages get a 2-word 'nav menu' junk
    line, doc_id%5 pages repeat their first line, doc_id%17 pages carry a
    blocklist phrase. Same planted-fixture pattern as _planted_pii_text;
    the identical augmentation is replayed in SQL inside sql_c4_clean."""
    d = load_documents(spark, sf_dir)
    n = _C4_CHUNK
    t = F.split(F.col("text"), " ")
    nchunks = F.ceil(F.size(t) / n).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(1), nchunks),
        lambda j: F.concat(
            F.array_join(F.slice(t, (j - 1) * n + 1, n), " "),
            F.when((F.col("doc_id") + j) % 3 != 0, F.lit(".")).otherwise(
                F.lit("")
            ),
        ),
    )
    extras = F.concat(
        F.when(F.col("doc_id") % 4 == 0, F.array(F.lit("nav menu"))).otherwise(
            F.array().cast("array<string>")
        ),
        F.when(F.col("doc_id") % 5 == 0, F.array(F.element_at(chunks, 1))).otherwise(
            F.array().cast("array<string>")
        ),
        F.when(
            F.col("doc_id") % 17 == 0, F.array(F.lit("see lorem ipsum terms."))
        ).otherwise(F.array().cast("array<string>")),
    )
    return d.select(
        "doc_id", F.array_join(F.concat(chunks, extras), "\n").alias("text")
    )


_C4_PLANT_SQL = f"""
  SELECT doc_id,
         array_to_string(
           lines
           || CASE WHEN doc_id % 4 = 0 THEN ['nav menu'] ELSE [] END
           || CASE WHEN doc_id % 5 = 0 THEN [lines[1]] ELSE [] END
           || CASE WHEN doc_id % 17 = 0 THEN ['see lorem ipsum terms.'] ELSE [] END,
           chr(10)) AS text
  FROM (
    SELECT doc_id,
           list_transform(range(1, CAST(ceil(len(t) / {_C4_CHUNK}.0) AS INT) + 1),
             j -> array_to_string(t[(j-1)*{_C4_CHUNK}+1 : least(j*{_C4_CHUNK}, len(t))], ' ')
                  || CASE WHEN (doc_id + j) % 3 <> 0 THEN '.' ELSE '' END) AS lines
    FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents))"""


def q_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level cleaning over planted multi-line pages:
    min-words + terminal-punctuation line filters, first-occurrence line
    dedup, page-level blocklist — all row-local codegen, zero shuffle."""
    from linkgraph.pipeline.text import c4_line_clean

    return c4_line_clean(
        _planted_multiline_text(spark, sf_dir),
        min_words=3,
        require_terminal_punct=True,
        blocklist=("lorem ipsum",),
        dedup_lines=True,
    )


def sql_c4_clean(min_words: int = 3) -> str:
    return f"""
WITH planted AS ({_C4_PLANT_SQL}),
pages AS MATERIALIZED (
  SELECT doc_id, string_split(text, chr(10)) AS ls,
         lower(text) LIKE '%lorem ipsum%' AS blocked
  FROM planted),
ul AS (
  SELECT doc_id, unnest(ls) AS l, unnest(range(1, len(ls) + 1)) AS pos
  FROM pages),
keptl AS (
  SELECT doc_id, l, pos FROM ul
  WHERE len(list_filter(string_split(trim(l), ' '), w -> w <> '')) >= {min_words}
    AND regexp_matches(trim(l), '[.!?]$')),
firsts AS (
  SELECT doc_id, l, pos,
         ROW_NUMBER() OVER (PARTITION BY doc_id, l ORDER BY pos) AS occ
  FROM keptl),
rebuilt AS (
  SELECT doc_id,
         string_agg(l, chr(10) ORDER BY pos) AS clean_text,
         COUNT(*) AS n_kept
  FROM firsts WHERE occ = 1 GROUP BY doc_id)
SELECT p.doc_id, NOT p.blocked AS keep,
       CAST(len(p.ls) AS BIGINT) AS n_lines,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(r.clean_text, '') AS clean_text
FROM pages p LEFT JOIN rebuilt r USING (doc_id)"""


# ------------------------------------------ curation composition (r5)
_CURATION_CONT_MAX = 0.2


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus-curation funnel — the composed per-document
    verdict a training-data pipeline produces, with first-failing-stage
    semantics: benchmark holdout (doc_id%20=0) → quality gate → exact
    dedup keep-first (among gate survivors) → benchmark decontamination
    (3-gram overlap ratio > 0.2) → kept.

    Composition of quality_gate + md5 groupBy dedup +
    benchmark_contamination; scale shape = each stage's own (zero-shuffle
    gate, one hash groupBy, broadcast bench grams) — the funnel adds only
    left joins back to the doc spine."""
    from linkgraph.pipeline.text import benchmark_contamination, quality_gate

    docs = load_documents(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    cand = docs.filter(F.col("doc_id") % 20 != 0)
    gate = quality_gate(cand, **_GATE_PARAMS)
    passed = cand.join(gate.filter(F.col("keep")).select("doc_id"), "doc_id")
    reps = passed.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("rep_id")
    )
    deduped = passed.withColumn("h", F.md5(F.col("text"))).join(reps, "h")
    survivors = deduped.filter(F.col("doc_id") == F.col("rep_id")).select(
        "doc_id", "text"
    )
    cont = benchmark_contamination(survivors, bench, n=3)
    verdict = (
        F.when(F.col("doc_id") % 20 == 0, "benchmark_holdout")
        .when(F.col("fail_reason") != "", F.concat(F.lit("gate:"), "fail_reason"))
        .when(F.col("rep_id") != F.col("doc_id"), "duplicate")
        .when(F.col("contamination_ratio") > _CURATION_CONT_MAX, "contaminated")
        .otherwise("kept")
    )
    return (
        docs.select("doc_id")
        .join(gate.select("doc_id", "fail_reason"), "doc_id", "left")
        .join(
            deduped.select("doc_id", "rep_id"), "doc_id", "left"
        )
        .join(cont.select("doc_id", "contamination_ratio"), "doc_id", "left")
        .select("doc_id", verdict.alias("verdict"))
        .withColumn("kept", F.col("verdict") == "kept")
    )


def sql_corpus_curation() -> str:
    from linkgraph.pipeline.text import PII_PATTERNS

    pii = " + ".join(
        f"len(regexp_extract_all(text, '{p}'))" for p in PII_PATTERNS.values()
    )
    mt, mdr = _GATE_PARAMS["min_tokens"], _GATE_PARAMS["max_dup_ratio"]
    langs = ", ".join(f"'{l}'" for l in _GATE_PARAMS["langs"])
    return f"""
WITH cand AS MATERIALIZED (SELECT * FROM documents WHERE doc_id % 20 <> 0),
feats AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 2
              THEN 1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g)
              ELSE 0.0 END AS dup_ratio,
         len(t) AS n_tokens, lang, {pii} AS pii
  FROM (SELECT *, string_split(text, ' ') AS t,
               CASE WHEN len(string_split(text, ' ')) >= 2
                    THEN list_transform(range(1, len(string_split(text, ' '))),
                                        i -> array_to_string(string_split(text, ' ')[i:i+1], ' '))
                    ELSE [] END AS g
        FROM cand)),
gate AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN n_tokens < {mt} THEN 'too_few_tokens'
              WHEN dup_ratio > {mdr} THEN 'too_repetitive'
              WHEN lang NOT IN ({langs}) THEN 'bad_lang'
              WHEN pii > 0 THEN 'has_pii'
              ELSE '' END AS fail_reason
  FROM feats),
passed AS MATERIALIZED (
  SELECT c.doc_id, c.text FROM cand c JOIN gate g USING (doc_id)
  WHERE g.fail_reason = ''),
reps AS (SELECT md5(text) AS h, MIN(doc_id) AS rep_id FROM passed GROUP BY 1),
dedup AS MATERIALIZED (
  SELECT p.doc_id, p.text, r.rep_id
  FROM passed p JOIN reps r ON md5(p.text) = r.h),
surv AS MATERIALIZED (SELECT doc_id, text FROM dedup WHERE doc_id = rep_id),
sgrams AS (
  SELECT doc_id,
         unnest(list_distinct(
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> array_to_string(t[i:i+2], ' '))
                ELSE [] END)) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM surv)),
bgrams AS (
  SELECT DISTINCT unnest(list_distinct(
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> array_to_string(t[i:i+2], ' '))
                ELSE [] END)) AS gram
  FROM (SELECT string_split(text, ' ') AS t FROM documents WHERE doc_id % 20 = 0)),
cont AS (
  SELECT s.doc_id,
         CASE WHEN COUNT(*) > 0
              THEN ROUND(CAST(COUNT(b.gram) AS DOUBLE) / COUNT(*), 5)
              ELSE 0.0 END AS cr
  FROM sgrams s LEFT JOIN bgrams b ON s.gram = b.gram
  GROUP BY s.doc_id),
verdicts AS (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % 20 = 0 THEN 'benchmark_holdout'
              WHEN g.fail_reason <> '' THEN 'gate:' || g.fail_reason
              WHEN dd.rep_id <> d.doc_id THEN 'duplicate'
              WHEN c.cr > {_CURATION_CONT_MAX} THEN 'contaminated'
              ELSE 'kept' END AS verdict
  FROM (SELECT doc_id FROM documents) d
  LEFT JOIN gate g USING (doc_id)
  LEFT JOIN dedup dd USING (doc_id)
  LEFT JOIN cont c USING (doc_id))
SELECT doc_id, verdict, verdict = 'kept' AS kept FROM verdicts"""


QUERIES = {
    # ------------------------------------------------------------------
    # Positions 1-50: one oracle-backed query per DISTINCT operator
    # family.  The driver's CORRECTNESS gate records at most the first 50
    # entries, so redundant-oracle variants (same engine, different
    # strategy/norm) are demoted to the 51+ block below — they keep their
    # oracles and are verifiable via tools/check_contract.py.
    # ------------------------------------------------------------------
    "doc_pagerank": q_doc_pagerank,
    "stream_near_dup": q_stream_near_dup,
    "doc_sssp": q_doc_sssp,
    "doc_bfs": q_doc_bfs,
    "doc_closeness": q_doc_closeness,
    "doc_allsp": q_doc_allsp,
    "doc_scc": q_doc_scc,
    "doc_wcc": q_doc_wcc,
    "doc_lpa": q_doc_lpa,
    "doc_triangles": q_doc_triangles,
    "doc_ppr_topk": q_doc_ppr_topk,
    "doc_reciprocity": q_doc_reciprocity,
    "dimsum_cosine": q_dimsum_cosine,
    "doc_hits": q_doc_hits,
    "doc_source_graph": q_doc_source_graph,
    "doc_degree": q_doc_degree,
    "doc_subgraph_degree": q_doc_subgraph_degree,
    "stream_distinct_degree": q_stream_distinct_degree,
    "doc_betweenness_sub": q_doc_betweenness_sub,
    "doc_kcore": q_doc_kcore,
    "doc_ktruss": q_doc_ktruss,
    "doc_mst_weight": q_doc_mst_weight,
    "doc_linkpred": q_doc_linkpred,
    "user_jaccard_topk": q_user_jaccard_topk,
    "user_sim_summary": q_user_sim_summary,
    "dedup_exact": q_dedup_exact,
    "dedup_clusters": q_dedup_clusters,
    "token_counts": q_token_counts,
    "language_id": q_langid,
    "nbr_mean_embedding": q_nbr_mean_embedding,
    "c4_clean": q_c4_clean,
    "corpus_curation": q_corpus_curation,
    "emb_cosine_topk": q_emb_cosine_topk,
    "emb_near_dup": q_emb_near_dup,
    "skipgram_pairs": q_skipgram_pairs,
    "scalar_functions": q_scalar_functions,
    "rel_dedup_sum": q_rel_dedup_sum,
    "pii_scan": q_pii_scan,
    "span_dedup": q_span_dedup,
    "contamination": q_contamination,
    "quality_gate": q_quality_gate,
    "quality_classifier": q_quality_classifier,
    "boilerplate": q_boilerplate,
    "emb_random_projection": q_random_projection,
    "sessionize": q_sessionize,
    "pack_sequences": q_pack_sequences,
    "lm_score": q_lm_score,
    "dsir_select": q_dsir_select,
    "token_heavy_hitters": q_token_heavy_hitters,
    "doc_khop_sample": q_doc_khop_sample,
    # ---- positions 51+: oracle-backed variants sharing a family above ----
    # (r5: mixture_weights demoted — its corpus-mixture family stays
    #  covered by mix_report below; dsir_select takes the selection-family
    #  window slot)
    "mixture_weights": q_mixture_weights,
    "tfidf_topk": q_tfidf_topk,
    # (r5: tfidf_topk demoted — term-weighting family stays covered by
    #  bm25_topk below; quality_classifier takes the window slot)
    # (r5 demotions to make window room for doc_ppr_topk / nbr_mean_embedding /
    #  c4_clean / corpus_curation: balanced triads ≙ triangle family,
    #  vocab_stats ≙ token-stats family, winnow ≙ span/fingerprint family,
    #  stratified_sample ≙ sampling family with weighted_sample below)
    "doc_balanced_triads": q_doc_balanced_triads,
    "vocab_stats": q_vocab_stats,
    "winnow": q_winnow,
    "stratified_sample": q_stratified_sample,
    "near_dup_jaccard": q_near_dup_jaccard,
    "pmi_topk": q_pmi_topk,
    "moore_lewis": q_moore_lewis,
    "weighted_sample": q_weighted_sample,
    "bpe_merges": q_bpe_merges,
    "doc_katz": q_doc_katz,
    "walk_skipgram": q_walk_skipgram,
    "cm_token_counts": q_cm_token_counts,
    "doc_spectral": q_doc_spectral,
    "emb_knn_components": q_emb_knn_components,
    "emb_knn_components_ivf": q_emb_knn_components_ivf,
    "chunk_documents": q_chunk_documents,
    "dedup_keep_best": q_dedup_keep_best,
    "session_cooccurrence": q_session_cooccurrence,
    "emb_sq_topk": q_emb_sq_topk,
    "source_pagerank": q_source_pagerank,
    "gopher_rules": q_gopher_rules,
    "mix_report": q_mix_report,
    "ngram_repetition": q_ngram_repetition,
    "bm25_topk": q_bm25_topk,
    "perplexity_buckets": q_perplexity_buckets,
    "span_dup_fraction": q_span_dup_fraction,
    "degree_histogram": q_degree_histogram,
    "doc_anf": q_doc_anf,
    "emb_cosine_procs": q_emb_cosine_procs,
    "doc_article_rank": q_doc_article_rank,
    "doc_assortativity": q_doc_assortativity,
    "doc_eigenvector": q_doc_eigenvector,
    "doc_astar": q_doc_astar,
    "doc_harmonic": q_doc_harmonic,
    "doc_wcc_stats": q_doc_wcc_stats,
    "doc_triangle_global": q_doc_triangle_global,
    "doc_same_community": q_doc_same_community,
    "user_jaccard_cutoffs": q_user_jaccard_cutoffs,
    "user_cosine_sparse": q_user_cosine_sparse,
    "doc_pagerank_pull": q_doc_pagerank_pull,
    "doc_pagerank_personalized": q_doc_pagerank_personalized,
    "doc_wcc_threshold": q_doc_wcc_threshold,
    "doc_pagerank_weighted": q_doc_pagerank_weighted,
    "doc_pagerank_converged": q_doc_pagerank_converged,
    "doc_dijkstra": q_doc_dijkstra,
    "doc_closeness_wf": q_doc_closeness_wf,
    "doc_lpa_weighted": q_doc_lpa_weighted,
    "doc_degree_weighted": q_doc_degree_weighted,
    "doc_kspanning_stats": q_doc_kspanning_stats,
    "doc_dangalchev": q_doc_dangalchev,
    "doc_allsp_weighted": q_doc_allsp_weighted,
    "doc_maxst_weight": q_doc_maxst_weight,
    "doc_sssp_dijkstra": q_doc_sssp_dijkstra,
    "doc_eigenvector_l1": q_doc_eigenvector_l1,
    "doc_lpa_seeded": q_doc_lpa_seeded,
    "doc_wcc_sizes": q_doc_wcc_sizes,
    "doc_triangle_stream": q_doc_triangle_stream,
    "quality_scores": q_quality,
    "fingerprint": q_fingerprint,
    "emb_pearson_procs": q_emb_pearson_procs,
    "emb_euclidean_procs": q_emb_euclidean_procs,
    "user_overlap_topk": q_user_overlap_topk,
    "doc_core_numbers": q_doc_core_numbers,
    "rel_dedup_minmax": q_rel_dedup_minmax,
    "token_stats": q_token_stats,
    "stream_dedup": q_stream_dedup,
    "dedup_tokenset": q_dedup_tokenset,
    # rows-only (no SQL-expressible oracle: hashing/UDF/iterative-internal)
    "doc_betweenness": q_doc_betweenness,
    "doc_louvain": q_doc_louvain,
    "doc_infomap": q_doc_infomap,
    "doc_kspanning": q_doc_kspanning,
    "doc_random_walks": q_doc_random_walks,
    "doc_mst": q_doc_mst,
    "doc_spanning_tree_max": q_doc_spanning_tree_max,
    "doc_yen": q_doc_yen,
    "doc_dfs": q_doc_dfs,
    "minhash_lsh_candidates": q_minhash_lsh,
    "simhash": q_simhash,
    "simhash_candidates": q_simhash_candidates,
    "emb_cosine_ivf": q_emb_cosine_ivf,
    "emb_pq_topk": q_emb_pq_topk,
    "multimodal_features": q_multimodal_features,
    "multimodal_frames": q_multimodal_frames,
    "emb_pca": q_emb_pca,
    "semantic_dedup": q_semantic_dedup,
}

ORACLES = {
    "doc_pagerank": sql_doc_pagerank(),
    "doc_ppr_topk": sql_doc_ppr_topk(),
    "nbr_mean_embedding": sql_nbr_mean_embedding(),
    "c4_clean": sql_c4_clean(),
    "corpus_curation": sql_corpus_curation(),
    "doc_pagerank_weighted": sql_doc_pagerank_weighted(),
    "doc_pagerank_personalized": sql_doc_pagerank_personalized(),
    "doc_pagerank_pull": sql_doc_pagerank(),
    "doc_pagerank_converged": sql_doc_pagerank_converged(),
    "doc_eigenvector_l1": sql_doc_eigenvector_l1(),
    "doc_article_rank": sql_doc_article_rank(),
    "doc_eigenvector": sql_doc_eigenvector(),
    "doc_sssp": sql_doc_sssp(),
    "doc_sssp_dijkstra": sql_doc_sssp(),
    "doc_dijkstra": sql_doc_dijkstra(),
    "doc_astar": sql_doc_astar(),
    "doc_bfs": sql_doc_bfs(),
    "user_overlap_topk": sql_user_overlap_topk(),
    "user_jaccard_cutoffs": sql_user_jaccard_cutoffs(),
    "doc_wcc": sql_doc_wcc(),
    "doc_wcc_sizes": sql_doc_wcc_sizes(),
    "doc_wcc_threshold": sql_doc_wcc_threshold(),
    "doc_wcc_stats": sql_doc_wcc_stats(),
    "doc_lpa": sql_doc_lpa(),
    "doc_lpa_weighted": sql_doc_lpa_weighted(),
    "doc_lpa_seeded": sql_doc_lpa_seeded(),
    "doc_triangles": sql_doc_triangles(),
    "doc_triangle_global": sql_doc_triangle_global(),
    "doc_triangle_stream": sql_doc_triangle_stream(),
    "doc_degree": sql_doc_degree(),
    "doc_degree_weighted": sql_doc_degree_weighted(),
    "doc_subgraph_degree": sql_doc_subgraph_degree(),
    "stream_distinct_degree": sql_stream_distinct_degree(),
    "doc_betweenness_sub": sql_doc_betweenness_sub(),
    "doc_mst_weight": sql_doc_mst_weight(),
    "doc_kspanning_stats": sql_doc_kspanning_stats(),
    "doc_maxst_weight": sql_doc_maxst_weight(),
    "doc_balanced_triads": sql_doc_balanced_triads(),
    "doc_linkpred": sql_doc_linkpred(),
    "doc_same_community": sql_doc_same_community(),
    "user_jaccard_topk": sql_user_jaccard_topk(),
    "dedup_exact": sql_dedup_exact(),
    "dedup_tokenset": sql_dedup_tokenset(),
    "token_stats": sql_token_stats(),
    "quality_scores": sql_quality(),
    "language_id": sql_langid(),
    "fingerprint": sql_fingerprint(),
    "pii_scan": sql_pii_scan(),
    "ngram_repetition": sql_ngram_repetition(),
    "contamination": sql_contamination(),
    "stratified_sample": sql_stratified_sample(),
    "quality_gate": sql_quality_gate(),
    "gopher_rules": sql_gopher_rules(),
    "tfidf_topk": sql_tfidf_topk(),
    "sessionize": sql_sessionize(),
    "pack_sequences": sql_pack_sequences(),
    "lm_score": sql_lm_score(),
    "mixture_weights": sql_mixture_weights(),
    "token_heavy_hitters": sql_token_heavy_hitters(),
    "doc_reciprocity": sql_doc_reciprocity(),
    "doc_assortativity": sql_doc_assortativity(),
    "doc_hits": sql_doc_hits(),
    "doc_source_graph": sql_doc_source_graph(),
    "doc_ktruss": sql_doc_ktruss(),
    "source_pagerank": sql_source_pagerank(),
    "degree_histogram": sql_degree_histogram(),
    "pmi_topk": sql_pmi_topk(),
    "skipgram_pairs": sql_skipgram_pairs(),
    "doc_khop_sample": sql_doc_khop_sample(),
    "weighted_sample": sql_weighted_sample(),
    "doc_katz": sql_doc_katz(),
    "stream_near_dup": sql_stream_near_dup(),
    "dimsum_cosine": sql_dimsum_cosine(),
    "cm_token_counts": sql_cm_token_counts(),
    "emb_knn_components": sql_emb_knn_components(),
    "chunk_documents": sql_chunk_documents(),
    "dedup_keep_best": sql_dedup_keep_best(),
    "session_cooccurrence": sql_session_cooccurrence(),
    "bm25_topk": sql_bm25_topk(),
    "perplexity_buckets": sql_perplexity_buckets(),
    "mix_report": sql_mix_report(),
    "boilerplate": sql_boilerplate(),
    "winnow": sql_winnow(),
    "emb_random_projection": sql_random_projection(),
    "near_dup_jaccard": sql_near_dup_jaccard(),
    "span_dedup": sql_span_dedup(),
    "span_dup_fraction": sql_span_dup_fraction(),
    "vocab_stats": sql_vocab_stats(),
    "moore_lewis": sql_moore_lewis(),
    "dsir_select": sql_dsir_select(),
    "quality_classifier": sql_quality_classifier(),
    "emb_sq_topk": sql_emb_sq_topk(),
    "emb_cosine_topk": sql_emb_cosine_topk(),
    "emb_cosine_procs": sql_emb_cosine_procs(),
    "emb_euclidean_procs": sql_emb_euclidean_procs(),
    "emb_pearson_procs": sql_emb_pearson_procs(),
    "scalar_functions": sql_scalar_functions(),
    "rel_dedup_sum": sql_rel_dedup_sum(),
    "rel_dedup_minmax": sql_rel_dedup_minmax(),
    "user_cosine_sparse": sql_user_cosine_sparse(),
    "user_sim_summary": sql_user_sim_summary(),
    "doc_closeness": sql_doc_closeness(),
    "doc_closeness_wf": sql_doc_closeness_wf(),
    "doc_harmonic": sql_doc_harmonic(),
    "doc_dangalchev": sql_doc_dangalchev(),
    "doc_allsp": sql_doc_allsp(),
    "doc_allsp_weighted": sql_doc_allsp_weighted(),
    "doc_scc": sql_doc_scc(),
    "emb_near_dup": sql_emb_near_dup(),
    "stream_dedup": sql_stream_dedup(),
    "token_counts": sql_token_counts(),
    "dedup_clusters": sql_dedup_clusters(),
    "doc_kcore": sql_doc_kcore(),
    "doc_core_numbers": sql_doc_core_numbers(),
}
