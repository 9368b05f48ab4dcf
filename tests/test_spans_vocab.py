"""Substring-span dedup and vocabulary/data-selection goldens (hand-computed)."""

import math


def _docs(spark, rows):
    """rows: list of (doc_id, text, source)."""
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_duplicated_spans_topk(spark):
    from linkgraph.pipeline.spans import duplicated_spans_topk

    rows = [
        (0, "a b c d e", "s"),      # windows (w=3): "a b c","b c d","c d e"
        (1, "x a b c y", "s"),      # "x a b","a b c","b c y"
        (2, "a b c a b c", "s"),    # "a b c","b c a","c a b","a b c"
        (3, "q r", "s"),            # shorter than w → no windows
    ]
    out = duplicated_spans_topk(_docs(spark, rows), width=3, k=10)
    got = {r["span"]: (r["n_docs"], r["n_occurrences"]) for r in out.collect()}
    # "a b c" in docs 0,1,2 with 4 total occurrences (doc 2 has it twice)
    assert got["a b c"] == (3, 4)
    # every other window is unique to one doc → filtered by min_docs=2
    assert list(got) == ["a b c"]


def test_span_dup_fraction(spark):
    from linkgraph.pipeline.spans import span_dup_fraction

    rows = [
        (0, "a b c d e", "s"),
        (1, "x a b c y", "s"),
        (2, "a b c a b c", "s"),
        (3, "q r", "s"),
    ]
    out = span_dup_fraction(_docs(spark, rows), width=3)
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["n_windows"] == 3 and got[0]["n_dup_windows"] == 1
    assert got[0]["dup_fraction"] == round(1 / 3, 5)
    assert got[1]["n_windows"] == 3 and got[1]["n_dup_windows"] == 1
    # doc 2: windows "a b c","b c a","c a b","a b c" → 2 of 4 duplicated
    assert got[2]["n_windows"] == 4 and got[2]["n_dup_windows"] == 2
    assert got[2]["dup_fraction"] == 0.5
    # doc 3 too short: zero windows, fraction 0.0
    assert got[3]["n_windows"] == 0 and got[3]["dup_fraction"] == 0.0


def test_vocab_stats(spark):
    from linkgraph.pipeline.vocab import vocab_stats

    # tokens: a×4, b×2, c×1  → n_tokens=7, n_types=3, hapax=1
    rows = [(0, "a a b", "s"), (1, "a b c", "s"), (2, "a", "s")]
    row = vocab_stats(_docs(spark, rows), zipf_top=10).collect()[0]
    assert row["n_tokens"] == 7 and row["n_types"] == 3 and row["n_hapax"] == 1
    assert row["type_token_ratio"] == round(3 / 7, 5)
    assert row["hapax_share"] == round(1 / 3, 5)
    # OLS slope of ln(freq) on ln(rank) over ranks 1..3, freqs (4,2,1)
    lr = [math.log(r) for r in (1, 2, 3)]
    lf = [math.log(f) for f in (4, 2, 1)]
    mr, mf = sum(lr) / 3, sum(lf) / 3
    slope = sum((x - mr) * (y - mf) for x, y in zip(lr, lf)) / sum(
        (x - mr) ** 2 for x in lr
    )
    assert abs(row["zipf_slope"] - round(slope, 5)) < 1e-9


def test_moore_lewis_ranks_in_domain_lookalikes_first(spark):
    from linkgraph.pipeline.vocab import moore_lewis_scores

    rows = [
        (0, "ml ml data data", "seed"),   # in-domain seed
        (1, "ml data", "pool"),           # looks like the seed
        (2, "cats dogs", "pool"),         # does not
        (3, "ml cats", "pool"),           # half-way
    ]
    out = moore_lewis_scores(_docs(spark, rows), "seed", k=10).collect()
    ids = [r["doc_id"] for r in out]
    # seed doc excluded; most in-domain-like pool doc first, off-domain last
    assert 0 not in ids
    assert ids[0] == 1 and ids[-1] == 2
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] > scores[-1]


def test_gopher_rules_each_branch_fires(spark):
    from linkgraph.pipeline.text import gopher_rules

    mk = lambda i, t: (i, t)
    good = "the quick brown fox jumps over lazy dogs " * 2 + "with vigor"
    docs = spark.createDataFrame(
        [
            mk(1, good),                                   # keep
            mk(2, "too short"),                            # word_count (low)
            mk(3, "word " * 200 + "end"),                  # word_count (high)
            mk(4, " ".join(["ab"] * 20)),                  # mean_word_length (low)
            mk(5, " ".join(["abcdefghijklmnop"] * 20)),    # mean_word_length (high)
            mk(6, " ".join(["the"] + ["##x"] * 19)),       # symbol_ratio
            mk(7, "\n".join(["- bullet line"] * 20)),      # bullet_ellipsis
            mk(8, " ".join(["the", "of"] + ["1234"] * 18)),  # alpha_ratio
            mk(9, " ".join(["alpha", "beta", "gamma", "delta"] * 5)),  # stop_words
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["keep"], r["fail_reason"])
        for r in gopher_rules(
            docs, min_words=10, max_words=100, min_mean_word_len=3.0,
            max_mean_word_len=10.0, min_stopword_hits=2,
        ).collect()
    }
    assert out[1] == (True, "")
    assert out[2] == (False, "word_count")
    assert out[3] == (False, "word_count")
    assert out[4] == (False, "mean_word_length")
    assert out[5] == (False, "mean_word_length")
    assert out[6] == (False, "symbol_ratio")
    assert out[7] == (False, "bullet_ellipsis")
    assert out[8] == (False, "alpha_ratio")
    assert out[9] == (False, "stop_words")


def test_gopher_rules_zero_shuffle_codegen(spark):
    from linkgraph.pipeline.text import gopher_rules

    docs = spark.createDataFrame([(1, "the and of")], "doc_id long, text string")
    p = gopher_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
