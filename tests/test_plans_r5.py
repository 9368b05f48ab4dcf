"""Plan-shape regressions for the span/vocab/SQ8/ANF operators: scans prune
to the columns actually read, no cartesian products sneak in, and the span
pipeline stays in codegen (no Python UDF in the plan)."""


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark, n=30):
    return spark.createDataFrame(
        [(i, f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 5} w{i % 3} x{i} y z", "en",
          f"s{i % 3}", 20) for i in range(n)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_span_dedup_codegen_only_no_python(spark):
    from linkgraph.pipeline.spans import duplicated_spans_topk

    out = duplicated_spans_topk(_docs(spark), width=3, k=5)
    p = _plan(out)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "TakeOrderedAndProject" in p  # global top-k never single-sorts


def test_span_fraction_shuffles_hashes_not_text(spark):
    from linkgraph.pipeline.spans import span_dup_fraction

    out = span_dup_fraction(_docs(spark), width=3)
    p = _plan(out)
    assert "xxhash64" in p  # 8-byte keys through the exchange
    assert "CartesianProduct" not in p


def test_vocab_stats_rank_window_is_bounded(spark):
    from linkgraph.pipeline.vocab import vocab_stats

    out = vocab_stats(_docs(spark), zipf_top=100)
    p = _plan(out)
    # the unpartitioned window must sit ABOVE the top-k limit, not the
    # full vocabulary: a TakeOrderedAndProject (or global limit) feeds it
    assert "TakeOrderedAndProject" in p or "GlobalLimit" in p
    assert "CartesianProduct" not in p


def test_moore_lewis_lm_join_broadcasts(spark):
    from linkgraph.pipeline.vocab import moore_lewis_scores

    out = moore_lewis_scores(_docs(spark), "s0", k=10)
    p = _plan(out)
    # the vocabulary-sized LM table reaches the token stream via broadcast
    assert "BroadcastHashJoin" in p or "BroadcastExchange" in p


def test_sq8_encode_pure_codegen(spark):
    from linkgraph.pipeline.ann import sq8_bounds, sq8_encode

    emb = spark.createDataFrame(
        [(i, [float(i), float(i * 2)], 0) for i in range(20)],
        "vec_id long, embedding array<float>, label int",
    )
    out = sq8_encode(emb, sq8_bounds(emb))
    p = _plan(out)
    # bounds are inlined literals: no join against the bounds table,
    # no Python evaluation — encoding is zip_with inside codegen
    assert "Join" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
