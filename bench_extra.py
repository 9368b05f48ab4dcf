"""Extra benchmarks for optimization work (guide §1.4) — NOT the driver's
bench. Times a subset of queries with the same session/methodology as
bench.py (1 untimed warm-up + median of N runs, `.count()` action), and can
instead use the noop sink (computes every column) or capture
`.explain("formatted")` into plans/<tag>/<query>_<suffix>.txt.

Usage:
  python bench_extra.py q1 q2 ...               # time with .count()
  BENCH_EXTRA_SINK=noop python bench_extra.py q1 # noop sink (all columns)
  BENCH_EXTRA_PLANS=r06 BENCH_EXTRA_SUFFIX=before python bench_extra.py q1
  BENCH_EXTRA_RUNS=3 ...                        # runs per query (default 3)
"""

from __future__ import annotations

import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_runs = int(os.environ.get("BENCH_EXTRA_RUNS", "3"))
    sink = os.environ.get("BENCH_EXTRA_SINK", "count")
    plans_tag = os.environ.get("BENCH_EXTRA_PLANS", "")
    suffix = os.environ.get("BENCH_EXTRA_SUFFIX", "before")

    from linkgraph.session import get_spark

    spark = get_spark(
        app_name="linkgraph-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    from linkgraph import queries as Q

    names = sys.argv[1:]
    if not names:
        print("usage: bench_extra.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)

    # same warm-up as bench.py: spin executors + Python/Arrow workers
    import pandas as _pd

    warm = spark.range(1 << 16).selectExpr("id", "id % 7 AS k")
    warm.groupBy("k").applyInPandas(
        lambda pdf: _pd.DataFrame({"k": [pdf["k"].iloc[0]], "n": [len(pdf)]}),
        schema="k long, n long",
    ).count()
    Q.q_doc_pagerank(spark, sf_dir).count()

    def run_once(fn):
        df = fn(spark, sf_dir)
        if sink == "noop":
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    out = {}
    for name in names:
        fn = Q.QUERIES[name]
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        if plans_tag:
            d = os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "plans", plans_tag
            )
            os.makedirs(d, exist_ok=True)
            jvm = spark.sparkContext._jvm
            plan = jvm.PythonSQLUtils.explainString(
                fn(spark, sf_dir)._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(d, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
        t0 = time.time()
        run_once(fn)
        warm_s = round(time.time() - t0, 3)
        gc.collect()
        rs = []
        for _ in range(n_runs):
            t0 = time.time()
            run_once(fn)
            rs.append(round(time.time() - t0, 3))
            gc.collect()
        out[name] = {"warmup": warm_s, "runs": rs, "median": round(statistics.median(rs), 3)}
        print(json.dumps({name: out[name]}), flush=True)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"summary": {k: v["median"] for k, v in out.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
