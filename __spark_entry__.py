"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in the ``linkgraph`` package (SURVEY.md §2
inventory); this file only adapts them to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402


def _prep(spark: SparkSession) -> None:
    """Ship the linkgraph package to executors (idempotent per context)."""
    from linkgraph.session import ship_package

    if not getattr(spark.sparkContext, "_linkgraph_shipped", False):
        ship_package(spark)
        spark.sparkContext._linkgraph_shipped = True


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on sf0.001: doc dependency graph → PageRank → top-10 docs."""
    _prep(spark)
    from linkgraph.algorithms.pagerank import PageRank
    from linkgraph.queries import doc_graph

    sf_dir = "/root/testdata/sf0.001"
    g = doc_graph(spark, sf_dir)
    pr = PageRank(damping=0.85, max_iterations=20, strategy="csr")
    ranks = pr.run(g)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        ranks.join(docs, ranks.id == docs.doc_id)
        .select("id", F.round("rank", 5).alias("rank"), "lang", "source")
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(10)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from linkgraph.queries import QUERIES

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _prep(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (omitted for rows-only ops)."""
    from linkgraph.queries import ORACLES

    return dict(ORACLES)
