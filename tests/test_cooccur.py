"""Document-level PMI vs hand computation."""

import math


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_pmi_hand_computed(spark):
    from linkgraph.pipeline.cooccur import pmi_topk

    # 4 docs; 'a' in all 4, 'b' in 3 (always with a), 'c' in 2 (always with a)
    texts = ["a b", "a b c", "a b c", "a"]
    out = pmi_topk(_docs(spark, texts), k=10, min_df=2)
    got = {(r["tok_a"], r["tok_b"]): r for r in out.collect()}
    n = 4
    # (a,b): n_ab=3, n_a=4, n_b=3 → pmi = ln(3*4/(4*3)) = 0
    assert got[("a", "b")]["n_ab"] == 3
    assert got[("a", "b")]["pmi"] == 0.0
    # (b,c): n_ab=2, n_b=3, n_c=2 → ln(2*4/(3*2))
    assert abs(got[("b", "c")]["pmi"] - round(math.log(8 / 6), 5)) < 1e-9
    # (a,c): n_ab=2, 4*2 → ln(8/8)=0
    assert got[("a", "c")]["pmi"] == 0.0
    assert len(got) == 3


def test_pmi_df_band_and_k(spark):
    from linkgraph.pipeline.cooccur import pmi_topk

    # 'x' appears once → below min_df, excluded from every pair
    texts = ["p q x", "p q", "p q", "p"]
    out = pmi_topk(_docs(spark, texts), k=1, min_df=2).collect()
    assert len(out) == 1
    assert (out[0]["tok_a"], out[0]["tok_b"]) == ("p", "q")

    # max_df excludes the ubiquitous token entirely
    out2 = pmi_topk(_docs(spark, texts), k=10, min_df=2, max_df=3).collect()
    assert all("p" not in (r["tok_a"], r["tok_b"]) for r in out2)
