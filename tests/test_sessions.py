"""Sessionization, sequence packing, and LM-score operators."""

import math

from pyspark.sql import functions as F


def _events(spark, rows):
    """[(user_id, ts_str, value), ...] with synthetic event ids."""
    return spark.createDataFrame(
        [(i, u, t, float(v)) for i, (u, t, v) in enumerate(rows)],
        "event_id long, user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_sessionize_gap_split(spark):
    from linkgraph.pipeline.sessions import sessionize

    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:10:00", 2.0),  # same session (10 min gap)
            (1, "2024-01-01 01:00:00", 4.0),  # 50 min gap -> new session
            (2, "2024-01-01 00:00:00", 8.0),  # other user: own session
        ],
    )
    out = {
        (r["user_id"], r["start_s"]): r
        for r in sessionize(ev, gap="30 minutes").collect()
    }
    assert len(out) == 3
    s1 = out[(1, _epoch("2024-01-01 00:00:00"))]
    assert s1["n_events"] == 2 and s1["total_value"] == 3.0
    assert s1["end_s"] == _epoch("2024-01-01 00:10:00")
    s2 = out[(1, _epoch("2024-01-01 01:00:00"))]
    assert s2["n_events"] == 1 and s2["total_value"] == 4.0
    assert out[(2, _epoch("2024-01-01 00:00:00"))]["total_value"] == 8.0


def test_sessionize_exact_gap_boundary_splits(spark):
    """Spark's session_window is gap-INCLUSIVE: a follow-up exactly `gap`
    later still merges (measured — the contract oracle's strict-> split
    mirrors this); one microsecond beyond splits."""
    from linkgraph.pipeline.sessions import sessionize

    ev = _events(
        spark,
        [(1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-01 00:30:00", 1.0)],
    )
    assert sessionize(ev, gap="30 minutes").count() == 1
    ev2 = _events(
        spark,
        [(1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-01 00:30:00.000001", 1.0)],
    )
    assert sessionize(ev2, gap="30 minutes").count() == 2


def _epoch(ts_str):
    import datetime

    return datetime.datetime.fromisoformat(ts_str).timestamp()


def test_pack_sequences_layout(spark):
    from linkgraph.pipeline.sessions import pack_sequences, packing_stats

    docs = spark.createDataFrame(
        [
            (0, "a b c"),          # 3 tokens, offsets [0, 3)
            (1, "d e f g"),        # 4 tokens, [3, 7) -> crosses seq 0/1 at L=4
            (2, "h"),              # 1 token, [7, 8)
            (3, "i j k l m"),      # 5 tokens, [8, 13)
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pack_sequences(docs, seq_len=4).collect()}
    assert out[0]["start_offset"] == 0 and out[0]["first_seq"] == 0
    assert out[0]["last_seq"] == 0
    assert out[1]["start_offset"] == 3
    assert (out[1]["first_seq"], out[1]["last_seq"]) == (0, 1)
    assert out[2]["start_offset"] == 7 and out[2]["first_seq"] == 1
    assert (out[3]["first_seq"], out[3]["last_seq"]) == (2, 3)
    stats = packing_stats(pack_sequences(docs, seq_len=4), seq_len=4).first()
    assert stats["total_tokens"] == 13
    assert stats["n_sequences"] == 4
    assert stats["boundary_docs"] == 2  # docs 1 and 3
    assert abs(stats["fill_rate"] - 13 / 16) < 1e-9


def test_pack_sequences_partition_invariance(spark):
    """The distributed prefix sum must give identical offsets at any
    bucket count (1 bucket = the naive single-window answer)."""
    from linkgraph.pipeline.sessions import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * (1 + i % 7))) for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, pack_sequences(docs, seq_len=8, num_partitions=1).collect()))
    b = sorted(map(tuple, pack_sequences(docs, seq_len=8, num_partitions=6).collect()))
    assert a == b


def test_pack_sequences_empty(spark):
    from linkgraph.pipeline.sessions import pack_sequences

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pack_sequences(empty, seq_len=4).count() == 0


def test_lm_score_matches_hand_computation(spark):
    from linkgraph.pipeline.text import lm_score

    corpus = [(0, "a b a b"), (1, "a b"), (2, "c")]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lm_score(docs, k_smooth=0.5).collect()}
    # unigram counts: a=3, b=3, c=1; V=3
    # bigram counts: (a,b)=3, (b,a)=1
    def lp(c2, c1):
        return math.log((c2 + 0.5) / (c1 + 0.5 * 3))

    exp0 = (lp(3, 3) + lp(1, 3) + lp(3, 3)) / 3  # a b, b a, a b
    assert abs(out[0]["avg_logprob"] - round(exp0, 4)) < 1e-9
    assert out[0]["n_bigrams"] == 3
    assert abs(out[1]["avg_logprob"] - round(lp(3, 3), 4)) < 1e-9
    assert 2 not in out  # single-token doc has no bigrams


def test_stream_sessionize_matches_batch(spark, tmp_path):
    """Streaming session_window (append mode — the only mode Spark
    supports for streaming session aggregation) emits each session exactly
    once, after the watermark passes it, and agrees with the batch
    operator. A second file carrying one far-future event advances the
    watermark past every real session so they all flush."""
    from linkgraph.pipeline.sessions import sessionize
    from linkgraph.streaming import stream_sessionize

    ev = _events(
        spark,
        [
            (1, "2024-01-01 00:00:00", 1.0),
            (1, "2024-01-01 00:10:00", 2.0),
            (1, "2024-01-01 02:00:00", 4.0),
            (2, "2024-01-01 00:05:00", 8.0),
        ],
    )
    flush = _events(spark, [(99, "2024-01-02 00:00:00", 0.0)])
    path = str(tmp_path / "events")
    # one part-file per logical batch: the file source paces by FILE, so a
    # multi-part write would scatter one session's events across batches
    # and race them against the watermark
    ev.coalesce(1).write.parquet(f"{path}/f1.parquet")
    flush.coalesce(1).write.parquet(f"{path}/f2.parquet")
    stream = (
        spark.readStream.schema(
            "event_id long, user_id long, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{path}/*.parquet")
    )
    q = (
        stream_sessionize(stream, gap="30 minutes", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM sess_stream WHERE user_id != 99").collect())
    )
    want = sorted(map(tuple, sessionize(ev, gap="30 minutes").collect()))
    assert got == want
