"""Contract-surface guards: every oracle references a registered query and
parses/plans in DuckDB against the real table schemas — catches key typos
and SQL syntax drift without running the full gate."""

import duckdb
import pytest


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return c


def test_oracle_keys_subset_of_queries():
    from linkgraph.queries import ORACLES, QUERIES

    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 75


def test_queries_dict_literal_has_no_duplicate_keys():
    """A repeated key in the QUERIES/ORACLES dict literal silently drops the
    later entry (first wins in the merged dict, so the runtime object can't
    reveal it) — parse the source with ast and assert uniqueness."""
    import ast
    import inspect

    import linkgraph.queries as Q

    tree = ast.parse(inspect.getsource(Q))
    checked = 0
    for node in ast.walk(tree):
        if not isinstance(node, ast.Assign) or not isinstance(node.value, ast.Dict):
            continue
        names = [t.id for t in node.targets if isinstance(t, ast.Name)]
        if not any(n in ("QUERIES", "ORACLES") for n in names):
            continue
        checked += 1
        keys = [k.value for k in node.value.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)]
        dupes = sorted({k for k in keys if keys.count(k) > 1})
        assert not dupes, f"duplicate keys in {names}: {dupes}"
    assert checked == 2


def test_gate_window_is_fully_oracle_backed():
    """The driver records only the first 50 QUERIES entries. Every one of
    those slots must carry a value-level oracle — a rows-only entry inside
    the window wastes a driver-recorded hash check."""
    import ast
    import inspect

    import linkgraph.queries as Q

    tree = ast.parse(inspect.getsource(Q))
    dicts = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.Assign) or not isinstance(node.value, ast.Dict):
            continue
        for t in node.targets:
            if isinstance(t, ast.Name) and t.id in ("QUERIES", "ORACLES"):
                dicts[t.id] = [k.value for k in node.value.keys
                               if isinstance(k, ast.Constant)]
    window = dicts["QUERIES"][:50]
    missing = [k for k in window if k not in set(dicts["ORACLES"])]
    assert not missing, f"rows-only entries inside the 50-slot gate window: {missing}"


def test_every_oracle_plans_in_duckdb(con):
    from linkgraph.queries import ORACLES

    for name, sql in ORACLES.items():
        try:
            con.execute("EXPLAIN " + sql)
        except Exception as e:  # pragma: no cover
            raise AssertionError(f"oracle {name} failed to plan: {e}") from e


def test_entry_module_exposes_contract():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    qs, os_ = mod.queries(), mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert callable(next(iter(qs.values())))
