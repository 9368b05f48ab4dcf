import pytest

from pyspark.sql import functions as F

from linkgraph.ids import densify_ids
from linkgraph.mining import (
    ground_truth_repo_edges,
    mine_import_edges,
    repo_dependency_graph,
    synthesize_repos,
    verify_content_sha,
)


@pytest.fixture(scope="module")
def repos(spark):
    df = synthesize_repos(spark, n_repos=10, files_per_repo=8, seed=42).persist()
    df.count()
    return df


def test_synthesis_deterministic(spark, repos):
    again = synthesize_repos(spark, n_repos=10, files_per_repo=8, seed=42)
    a = sorted(map(tuple, repos.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b
    assert repos.count() == 80


def test_content_sha_invariant(spark, repos):
    assert verify_content_sha(repos) == 0
    # invariant still holds after a shuffle-heavy stage
    shuffled = repos.repartition(8, "lang").sortWithinPartitions("path")
    assert verify_content_sha(shuffled) == 0


def test_mined_edges_match_ground_truth(spark, repos):
    nodes, edges = repo_dependency_graph(repos)
    id2repo = {r["id"]: r["repo"] for r in nodes.collect()}
    got = sorted(
        (int(id2repo[r["src"]].split("repo")[1]), int(id2repo[r["dst"]].split("repo")[1]),
         r["weight"])
        for r in edges.collect()
    )
    assert got == ground_truth_repo_edges(n_repos=10, files_per_repo=8, seed=42)


def test_import_extraction_all_langs(spark, repos):
    mined = mine_import_edges(repos)
    langs_covered = (
        mined.join(repos.select("path", "lang").distinct(),
                   mined.src_path == F.col("path"))
        .select("lang").distinct().collect()
    )
    assert {r["lang"] for r in langs_covered} == {"python", "java", "js"}


def test_densify_contiguous(spark):
    df = spark.createDataFrame([(f"key{i}",) for i in [5, 3, 9, 100, 42]], "name string")
    out = densify_ids(df, "name", num_partitions=3).collect()
    ids = sorted(r["id"] for r in out)
    assert ids == [0, 1, 2, 3, 4]
    # deterministic: same input → same mapping
    out2 = densify_ids(df, "name", num_partitions=3).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_densify_long_keys(spark):
    """The Arrow schema is derived from the key column's real type — long
    keys must round-trip exactly (previously hardcoded to string)."""
    big = 10_000_000_000  # > int32, catches silent narrowing
    df = spark.createDataFrame(
        [(big + i * 7,) for i in [5, 3, 9, 100, 42]], "name long"
    )
    out = densify_ids(df, "name", num_partitions=3).collect()
    assert sorted(r["id"] for r in out) == [0, 1, 2, 3, 4]
    assert {r["name"] for r in out} == {big + i * 7 for i in [5, 3, 9, 100, 42]}
    assert all(isinstance(r["name"], int) for r in out)


def test_file_dependency_graph(spark):
    """File-level edges: every mined import resolves to the target repo's
    defining file; node ids are dense; PageRank runs on the file graph."""
    from linkgraph.mining import (
        file_dependency_graph,
        mine_import_edges,
        synthesize_repos,
    )
    from linkgraph.graph import Graph
    from linkgraph.algorithms.pagerank import pagerank
    from pyspark.sql import functions as F

    repos = synthesize_repos(spark, n_repos=8, files_per_repo=6).persist()
    nodes, edges = file_dependency_graph(repos)
    n = nodes.count()
    assert n == 8 * 6
    ids = [r["id"] for r in nodes.select("id").collect()]
    assert sorted(ids) == list(range(n))  # dense 0..n-1

    # total import weight equals mined import rows that resolve to a repo
    total_imports = (
        mine_import_edges(repos)
        .filter(F.col("dst_pkg").rlike("^pkg_[0-7]$"))
        .count()
    )
    got_weight = edges.agg(F.sum("weight")).first()[0]
    assert int(got_weight) == total_imports

    # every dst is a repo's lexicographically-first path
    first_paths = {
        (r["repo"], r["mp"])
        for r in repos.groupBy("repo").agg(F.min("path").alias("mp")).collect()
    }
    dst_files = {
        (r["repo"], r["path"])
        for r in edges.join(nodes, edges.dst == nodes.id).select("repo", "path").collect()
    }
    assert dst_files <= first_paths

    ranks = pagerank(Graph.from_edges(edges, nodes=nodes.select("id")), max_iterations=5)
    assert ranks.count() == n
