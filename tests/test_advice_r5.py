"""Round-5 ADVICE regressions: session_cooccurrence gap-boundary parity
(Spark session_window vs the DuckDB `diff > gap` oracle — the advisor
suspected a half-open mismatch; the r4 empirical test proved exactly-gap
MERGES, this extends the proof to the co-occurrence composition)."""

import datetime

import duckdb
import pandas as pd


def _boundary_events():
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    return pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "ts": [
                t0,
                t0 + datetime.timedelta(seconds=1800),  # exactly the gap
                t0 + datetime.timedelta(seconds=1900),
            ],
            "user_id": [7, 7, 7],
            # event 3 repeats 'b' so merged vs split sessions DIFFER:
            # merged {a,b,b} -> pair (a,b); split {a} + {b,b} -> no pair
            "event_type": ["a", "b", "b"],
            "value": [1.0, 1.0, 1.0],
            "props": ["", "", ""],
        }
    )


def test_session_cooccurrence_gap_boundary_spark_vs_oracle(spark):
    """An event exactly gap seconds after its predecessor merges in BOTH
    engines, so the merged session {a,b} yields the (a,b) pair in Spark
    AND the oracle; one second past the gap splits in both (no pair)."""
    from linkgraph import queries as Q
    from linkgraph.pipeline.sessions import session_cooccurrence

    pdf = _boundary_events()
    got = {(r["type_a"], r["type_b"]): r["n_sessions"]
           for r in session_cooccurrence(
               spark.createDataFrame(pdf), gap="30 minutes"
           ).collect()}
    con = duckdb.connect()
    con.register("events", pdf)
    oracle = {(a, b): n for a, b, n in
              con.execute(Q.sql_session_cooccurrence()).fetchall()}
    assert got == oracle == {("a", "b"): 1}

    pdf2 = pdf.copy()
    pdf2.loc[1, "ts"] += datetime.timedelta(seconds=1)
    pdf2.loc[2, "ts"] += datetime.timedelta(seconds=1)
    got2 = {(r["type_a"], r["type_b"]): r["n_sessions"]
            for r in session_cooccurrence(
                spark.createDataFrame(pdf2), gap="30 minutes"
            ).collect()}
    con2 = duckdb.connect()
    con2.register("events", pdf2)
    oracle2 = {(a, b): n for a, b, n in
               con2.execute(Q.sql_session_cooccurrence()).fetchall()}
    # split sessions {a} and {b,b}: the cross-type pair disappears in both
    assert got2 == oracle2 == {}
