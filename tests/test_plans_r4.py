"""Plan-shape regressions for the round-4 graph operators: contraction
aggregates with a map-side partial, the truss wedge join is an equi-join
(never a cartesian), and HITS's steady loop ships no scalar subquery."""

from linkgraph.graph import Graph
from tests.conftest import edges_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_contract_edges_partial_agg_no_cartesian(spark):
    from linkgraph.algorithms.coarsen import contract_edges

    edges = edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)])
    mapping = spark.createDataFrame(
        [(i, f"g{i % 2}") for i in range(4)], "id long, grp string"
    )
    out = contract_edges(edges, mapping, id_col="id", group_col="grp")
    p = _plan(out)
    assert "CartesianProduct" not in p
    # groupBy(src_group, dst_group) must partial-aggregate map-side
    assert "partial_count" in p or "HashAggregate" in p


def test_ktruss_support_equijoin_only(spark):
    from linkgraph.algorithms.ktruss import _support

    g = Graph.from_edges(
        edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0), (0, 3, 1.0)])
    )
    sup = _support(g.canonical_edges().select("src", "dst"))
    p = _plan(sup)
    assert "CartesianProduct" not in p
    # wedge close is a hash/sort-merge equi-join on (b, c) keys
    assert "Join" in p


def test_hits_loop_plan_is_joins_and_aggs(spark):
    from linkgraph.algorithms.hits import hits

    g = Graph.from_edges(
        edges_df(spark, [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 1.0)]),
        nodes=spark.createDataFrame([(i,) for i in range(3)], "id long"),
    )
    out = hits(g, max_iterations=2)
    p = _plan(out)
    assert "CartesianProduct" not in p
