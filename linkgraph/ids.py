"""Id densification — the reference's IdMap, Spark-first.

Reference: `core/src/main/java/org/neo4j/graphalgo/core/IdMap.java` /
`core/.../core/huge/loader/HugeIdMap.java`: sparse external ids →
consecutive internal ids, bidirectional.

`monotonically_increasing_id` is NOT contiguous, so we use the two-pass
scheme: sort-partition the keys, count per partition, broadcast cumulative
offsets, then enumerate inside each partition (zipWithIndex semantics, but
expressed over Arrow batches). Deterministic given the sort key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def densify_ids(df: DataFrame, key_col: str, num_partitions: int | None = None) -> DataFrame:
    """distinct keys → (id: long contiguous 0..n-1, <key_col>).

    Two-pass: repartitionByRange on the key (deterministic order), per-
    partition counts → offsets, then an Arrow-batched enumerate. No global
    sort bottleneck: the range exchange samples, the enumerate is local.
    """
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    # Arrow schemas below are derived from the ACTUAL key type (string,
    # long, ...) — hardcoding string here silently corrupted long keys.
    key_ddl = df.schema[key_col].dataType.simpleString()
    keys = (
        df.select(F.col(key_col).alias("_key"))
        .distinct()
        .repartitionByRange(n_parts, "_key")
        .sortWithinPartitions("_key")
    )

    def with_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_part"] = pid
            yield pdf

    keyed = keys.mapInPandas(with_part, schema=f"_key {key_ddl}, _part int").persist()
    counts = keyed.groupBy("_part").agg(F.count(F.lit(1)).alias("_cnt"))
    w = Window.orderBy("_part").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_part", F.coalesce(F.sum("_cnt").over(w), F.lit(0)).alias("_offset")
    )
    off_map = {r["_part"]: r["_offset"] for r in offsets.collect()}

    def enumerate_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            part = int(pdf["_part"].iloc[0]) if len(pdf) else 0
            base = off_map.get(part, 0) + seen
            out = pd.DataFrame(
                {"id": range(base, base + len(pdf)), "_key": pdf["_key"].values}
            )
            seen += len(pdf)
            yield out

    result = keyed.mapInPandas(enumerate_part, schema=f"id long, _key {key_ddl}")
    return result.select("id", F.col("_key").alias(key_col))
