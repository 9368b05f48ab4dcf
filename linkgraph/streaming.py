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
