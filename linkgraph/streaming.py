"""Structured Streaming surface.

The reference has NO streaming capability (SURVEY.md §2.9 — every proc
snapshots the store). This module is engine-added value for continuous
ingestion pipelines: the same JVM-side expressions the batch operators use
(pipeline.text), lifted onto streams, plus watermarked windowed graph-edge
aggregation. All transformations are built-in functions — streaming-safe,
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_document_stream(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """File-source document stream (new parquet files under `path`)."""
    schema = schema or "doc_id long, text string, lang string, source string, n_chars long"
    return spark.readStream.schema(schema).parquet(path)


def stream_token_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming token counts — stateless projection, identical expressions
    to pipeline.text.token_stats, so batch and stream results agree."""
    toks = F.split(F.col(text_col), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_uniq_tokens"),
    )


def stream_quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Streaming quality scores (stateless; mirrors pipeline.text)."""
    from linkgraph.pipeline.text import quality_scores

    return quality_scores(docs, text_col)


def stream_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Streaming exact deduplication on content hash.

    Continuous-ingestion twin of ``pipeline.dedup.exact_duplicates``: each
    document's content is hashed JVM-side (xxhash64 — same key as the
    batch path) and duplicates are dropped as they arrive. With an event-
    time column the state is WATERMARK-BOUNDED
    (``dropDuplicatesWithinWatermark``): a re-ingested document more than
    ``watermark`` late is treated as new, but state never grows past the
    window — the only shape that survives an unbounded corpus stream.
    Without one, plain ``dropDuplicates`` keeps all-time state (exact, for
    bounded backfills). ``hash_fn``: 'xxhash64' (fastest) or 'md5'
    (cross-engine-stable hex, used by the oracle-checked contract query)."""
    hexpr = (
        F.md5(F.col(text_col)) if hash_fn == "md5" else F.xxhash64(F.col(text_col))
    )
    hashed = docs.withColumn("text_hash", hexpr)
    if event_time_col is not None:
        return hashed.withWatermark(event_time_col, watermark).dropDuplicatesWithinWatermark(
            ["text_hash"]
        )
    return hashed.dropDuplicates(["text_hash"])


def stream_tokenset_dedup(
    docs: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming bag-of-words deduplication — the continuous twin of
    ``pipeline.dedup.tokenset_duplicates``: documents whose DISTINCT token
    set matches an already-seen one are dropped as they arrive (catches
    word-reorder / token-repeat variants that byte-exact dedup misses).
    The key is pure codegen (split → array_distinct → sort_array →
    concat_ws → md5); state is watermark-bounded when an event-time column
    is given, exactly like :func:`stream_exact_dedup`."""
    key = F.md5(
        F.concat_ws(
            " ",
            F.sort_array(
                F.array_distinct(F.split(F.coalesce(F.col(text_col), F.lit("")), " "))
            ),
        )
    )
    hashed = docs.withColumn("tokenset_hash", key)
    if event_time_col is not None:
        return hashed.withWatermark(
            event_time_col, watermark
        ).dropDuplicatesWithinWatermark(["tokenset_hash"])
    return hashed.dropDuplicates(["tokenset_hash"])


def windowed_edge_degrees(
    edges: DataFrame,
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked per-window out-degree over a timestamped edge stream —
    late rows beyond the watermark are dropped, state is bounded.

    → (window, src, out_degree, weight_sum)
    """
    return (
        edges.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("window"), "src")
        .agg(
            F.count(F.lit(1)).alias("out_degree"),
            F.sum("weight").alias("weight_sum"),
        )
    )


def stateful_distinct_degree(
    edges: DataFrame,
    max_exact: int = 100_000,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-source running DISTINCT neighbor count over an unbounded edge
    stream — a custom stateful operator via `applyInPandasWithState`.

    State per src: the exact neighbor-id set while it is ≤ ``max_exact``,
    then a degraded exact-count-stops marker (count keeps rising with
    possible overcount bounded by duplicates arriving after the cap) —
    bounded state per key by construction. Built-in streaming aggs cannot
    express running COUNT(DISTINCT) in update mode without unbounded
    shuffle state per micro-batch; per-key Arrow state can.

    → update-mode stream of (src, distinct_neighbors, total_edges, exact)
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = (
        "src long, distinct_neighbors long, total_edges long, exact boolean"
    )
    state_schema = "neighbors array<long>, total long, exact boolean"

    def update(key, pdfs, state):
        (src,) = key
        if state.exists:
            neighbors, total, exact = state.get
            seen = set(neighbors)
        else:
            seen, total, exact = set(), 0, True
        for pdf in pdfs:
            total += len(pdf)
            if exact:
                seen.update(int(d) for d in pdf["dst"])
                if len(seen) > max_exact:
                    exact = False
        state.update((sorted(seen), total, exact))
        yield pd.DataFrame(
            {
                "src": [src],
                "distinct_neighbors": [len(seen)],
                "total_edges": [total],
                "exact": [exact],
            }
        )

    tmo = {
        "NoTimeout": GroupStateTimeout.NoTimeout,
        "ProcessingTimeTimeout": GroupStateTimeout.ProcessingTimeTimeout,
        "EventTimeTimeout": GroupStateTimeout.EventTimeTimeout,
    }[timeout]
    return edges.groupBy("src").applyInPandasWithState(
        update, out_schema, state_schema, "update", tmo
    )


def stream_heavy_hitters(
    docs: DataFrame,
    k_per_group: int = 64,
    n_groups: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Running heavy-hitter candidates over an unbounded document stream —
    sharded Misra-Gries via `applyInPandasWithState`.

    Tokens hash into ``n_groups`` shards; each shard keeps ONE mergeable
    MG summary of ``k_per_group`` counters as its state (Agarwal et al.,
    Mergeable Summaries). Within a shard the MG guarantee holds: any
    token with frequency ≥ m_shard/(k+1) of that shard's mass survives,
    so the union of shard summaries is a guaranteed-superset candidate
    set for global heavy hitters (each token lives in exactly one shard).
    State is ≤ n_groups × k_per_group counters FOREVER, regardless of
    stream length or vocabulary — the property that lets this run against
    an unbounded corpus where exact streaming word-count state would grow
    with |vocab|.

    → update-mode stream of (grp, token, est) — current surviving
    counters per shard; filter/exact-verify downstream (same
    candidates → exact-verify shape as the batch `heavy_hitters`).
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupStateTimeout

    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).where(F.col("tok") != "")
    keyed = toks.withColumn(
        "grp", F.pmod(F.xxhash64("tok"), F.lit(n_groups)).cast("int")
    )

    def update(key, pdfs, state):
        from linkgraph.pipeline.sketch import mg_update

        (grp,) = key
        if state.exists:
            toks_s, counts_s = state.get
            counters = dict(zip(toks_s, (int(c) for c in counts_s)))
        else:
            counters = {}
        for pdf in pdfs:
            counters = mg_update(counters, pdf["tok"], k_per_group)
        state.update((list(counters.keys()), list(counters.values())))
        yield pd.DataFrame(
            {
                "grp": grp,
                "token": list(counters.keys()),
                "est": [int(v) for v in counters.values()],
            }
        )

    return keyed.groupBy("grp").applyInPandasWithState(
        update,
        "grp int, token string, est long",
        "toks array<string>, counts array<long>",
        "update",
        GroupStateTimeout.NoTimeout,
    )


def incremental_wcc(
    edge_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
):
    """Incremental connected components over an edge stream (foreachBatch).

    Classic incremental CC: the persisted (id, component) mapping is itself
    a star graph (id→component edges); per micro-batch, union it with the
    batch's new edges and re-run the batch Kiveris `wcc` on that union —
    cost scales with the DELTA plus one edge per known node, not the full
    history. The mapping is parquet-persisted under versioned dirs with an
    atomically-replaced CURRENT pointer file, so a crash at ANY point
    leaves the previous version intact and the streaming checkpoint replay
    reconverges.

    Returns the StreamingQuery (availableNow drains what exists).
    """
    import os
    import shutil

    from linkgraph.algorithms.wcc import wcc as _wcc
    from linkgraph.graph import Graph

    pointer = os.path.join(state_dir, "CURRENT")

    def _current_dir() -> str | None:
        if not os.path.exists(pointer):
            return None
        with open(pointer) as f:
            name = f.read().strip()
        path = os.path.join(state_dir, name)
        return path if name and os.path.exists(path) else None

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new_edges = batch_df.select("src", "dst")
        cur = _current_dir()
        if cur is not None:
            prior = spark.read.parquet(cur).select(
                F.col("id").alias("src"), F.col("component").alias("dst")
            )
            union = new_edges.unionByName(prior)
        else:
            union = new_edges
        g = Graph.from_edges(union)
        mapping = _wcc(g).select("id", "component")
        nxt_name = f"v{batch_id}"
        if cur is not None and os.path.basename(cur) == nxt_name:
            # checkpoint replay of a batch whose mapping already committed:
            # never overwrite the dir being read — write the alternate name
            nxt_name = f"v{batch_id}r"
        mapping.write.mode("overwrite").parquet(os.path.join(state_dir, nxt_name))
        tmp = pointer + ".tmp"
        with open(tmp, "w") as f:
            f.write(nxt_name)
        os.replace(tmp, pointer)  # single atomic commit point
        if cur is not None and os.path.basename(cur) != nxt_name:
            shutil.rmtree(cur, ignore_errors=True)

    return (
        edge_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming twin of ``pipeline.sessions.sessionize``: the SAME
    ``session_window`` aggregate, with a watermark so session state is
    BOUNDED — a session closes (and its row is emitted, in append mode)
    once the watermark passes its gap-extended end, and late events beyond
    ``watermark`` are dropped instead of growing state forever. Batch and
    stream rows agree for every session older than the watermark."""
    from linkgraph.pipeline.sessions import sessionize

    return sessionize(
        events.withWatermark(ts_col, watermark),
        gap=gap,
        user_col=user_col,
        ts_col=ts_col,
        value_col=value_col,
    )


def stream_lm_score(
    stream_docs: DataFrame,
    model: dict,
    sink_fn,
    k_smooth: float = 0.5,
    text_col: str = "text",
):
    """Score a document STREAM against a pre-trained static bigram model
    (``pipeline.text.train_bigram_lm``): every micro-batch is scored with
    the same batch scorer via foreachBatch — stateless across batches
    (each document's bigrams live inside its own row), so state never
    grows. ``sink_fn(scored_df, epoch_id)`` receives each batch's
    (doc_id, n_bigrams, avg_logprob). Use a CAPPED model (max_bigrams=M,
    broadcast) so the per-batch join is map-side."""
    from linkgraph.pipeline.text import score_bigram_lm

    def _batch(df: DataFrame, epoch_id: int) -> None:
        sink_fn(
            score_bigram_lm(
                df, model, k_smooth=k_smooth, text_col=text_col,
                broadcast_model=True,
            ),
            epoch_id,
        )

    return stream_docs.writeStream.foreachBatch(_batch)


class StaticNearDupIndex:
    """Precomputed, persisted LSH state for `stream_near_dup`: the static
    corpus's (band, bucket) table and its distinct-token sets. Build once,
    share across streams, and `unpersist()` when done — the streaming
    writer outlives the builder call, so cache lifetime must be explicit
    (a bare persist inside the stream factory leaks one cached index per
    invocation in a long-lived session)."""

    def __init__(
        self,
        static_docs: DataFrame,
        num_hashes: int = 64,
        bands: int = 16,
        shingle: int = 1,
        text_col: str = "text",
    ):
        from linkgraph.pipeline.dedup import minhash_bands

        self.num_hashes, self.bands, self.shingle = num_hashes, bands, shingle
        self.bands_df = minhash_bands(
            static_docs, num_hashes, bands, text_col, seed=42, shingle=shingle
        ).persist()
        self.toks_df = static_docs.select(
            F.col("doc_id").alias("static_id"),
            F.array_distinct(F.split(F.col(text_col), " ")).alias("tb"),
        ).persist()

    def unpersist(self) -> None:
        self.bands_df.unpersist()
        self.toks_df.unpersist()


def stream_near_dup(
    stream_docs: DataFrame,
    static_docs,
    sink_fn,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle: int = 1,
    text_col: str = "text",
):
    """Filter a document STREAM against a static corpus for NEAR
    duplicates: per micro-batch, MinHash-band the incoming docs, equi-join
    their (band, bucket) keys against the static corpus's precomputed band
    index (the Broder LSH candidate step), then exact-verify each
    candidate pair with unigram Jaccard — the same two-stage shape as the
    batch `near_duplicate_clusters` front-end.

    ``sink_fn(matches_df, epoch_id)`` receives (doc_id, static_id,
    jaccard) rows with jaccard >= threshold. Stateless across batches:
    the static index is fixed, each batch's signatures live in the batch —
    state never grows with stream length (contrast keeping a growing LSH
    table in stream state, which an unbounded corpus would overflow).
    At scale the static band index is a bucketed table on (band, bucket),
    so the per-batch join is co-located and the small batch side shuffles.

    ``static_docs`` may be a DataFrame (an index is built ad hoc — the
    caller cannot release its cache; fine for one-shot jobs) or a
    :class:`StaticNearDupIndex` (preferred for long-lived sessions:
    build once, share across streams, ``unpersist()`` when done).
    """
    if isinstance(static_docs, StaticNearDupIndex):
        index = static_docs
    else:
        index = StaticNearDupIndex(
            static_docs, num_hashes, bands, shingle, text_col
        )
    static_bands = index.bands_df
    static_toks = index.toks_df

    def _batch(df: DataFrame, epoch_id: int) -> None:
        from linkgraph.pipeline.dedup import minhash_bands

        # band with the INDEX's geometry — a mismatched batch-side banding
        # would bucket-join apples to oranges
        batch_bands = minhash_bands(
            df, index.num_hashes, index.bands, text_col, seed=42,
            shingle=index.shingle,
        )
        cand = (
            batch_bands.join(
                static_bands.select(
                    F.col("doc_id").alias("static_id"), "band", "bucket"
                ),
                ["band", "bucket"],
            )
            .filter(F.col("doc_id") != F.col("static_id"))
            .select("doc_id", "static_id")
            .distinct()
        )
        toks_a = df.select(
            "doc_id", F.array_distinct(F.split(F.col(text_col), " ")).alias("ta")
        )
        j = cand.join(toks_a, "doc_id").join(static_toks, "static_id")
        inter = F.size(F.array_intersect("ta", "tb"))
        matches = j.select(
            "doc_id",
            "static_id",
            F.round(
                inter.cast("double") / (F.size("ta") + F.size("tb") - inter), 5
            ).alias("jaccard"),
        ).filter(F.col("jaccard") >= threshold)
        sink_fn(matches, epoch_id)

    return stream_docs.writeStream.foreachBatch(_batch)


def run_available_now(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> list:
    """Drain everything currently available into an in-memory sink and
    return the rows (test/bootstrap helper; production uses writeStream to
    a real sink with checkpointLocation). Use output_mode='complete' for
    windowed aggregations — append only emits watermark-closed windows."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.sql(f"SELECT * FROM {query_name}").collect()


def stream_classifier_scores(
    stream_docs: DataFrame,
    w,
    bias: float,
    n_buckets: int = 256,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, score) as a STREAMING transformation — score a document
    stream against a pre-trained hashed logistic quality model
    (``pipeline.classify.train_quality_classifier``).

    Unlike the foreachBatch scorers (stream_lm_score), this is a plain
    streaming SELECT: the row-local literal-map scorer
    (classify.classifier_scores_rowlocal) contains no join, aggregate,
    or state, so the returned streaming DataFrame composes into ANY
    downstream mode/sink with zero state and zero shuffle per batch.
    Model refresh = restart the query with new literals (the model is
    n_buckets + 1 doubles — a restart, not a retrain, is the cheap
    path)."""
    from linkgraph.pipeline.classify import classifier_scores_rowlocal

    return classifier_scores_rowlocal(
        stream_docs,
        w,
        bias,
        n_buckets=n_buckets,
        text_col=text_col,
        key_col=key_col,
    )
