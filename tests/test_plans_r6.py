"""Plan-shape regressions for the round-4 sampling/skip-gram/BPE
operators: the skip-gram expansion stays row-local codegen (no join, no
Python), k-hop sampling never plans a per-node window, and the weighted
sampler is key-pass + TakeOrdered (no global sort, no window)."""

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=30):
    return spark.createDataFrame(
        [(i, f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 5} w{i % 3} x{i} y z",
          "en", f"s{i % 3}", 20) for i in range(n)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_skipgram_no_join_no_python(spark):
    from linkgraph.pipeline.cooccur import skipgram_pairs

    p = _plan(skipgram_pairs(_docs(spark), window=3, k=10))
    assert "Join" not in p and "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "TakeOrderedAndProject" in p


def test_khop_sample_no_window_operator(spark):
    from linkgraph.algorithms.sampling import sample_neighbors

    e = spark.createDataFrame(
        [(i % 5, (i * 3 + 1) % 20) for i in range(40)], "src long, dst long"
    )
    p = _plan(sample_neighbors(e, fanout=3))
    # the salted two-stage agg replaces the per-node row_number window —
    # a Window operator here would mean a straggler per power-law hub
    assert "Window" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_weighted_sample_no_window_no_global_sort(spark):
    from linkgraph.pipeline.text import weighted_sample

    p = _plan(weighted_sample(_docs(spark), F.col("n_chars").cast("double"), n=5))
    assert "Window" not in p
    assert "TakeOrderedAndProject" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_bpe_pair_counts_row_local(spark):
    from linkgraph.pipeline.bpe import _adjacent_pair_counts, word_freq

    words = word_freq(_docs(spark)).select(
        F.split(F.col("word"), "").alias("syms"), "cnt"
    )
    p = _plan(_adjacent_pair_counts(words))
    assert "Join" not in p and "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
