"""SparkSession builder with the engine's required settings.

Arrow execution on (every numeric kernel is a pandas/Arrow UDF), AQE on
(runtime shuffle-partition coalescing + skew-join splitting), shuffle
partitions sized to the core count. Mirrors the reference's global
`Pools.DEFAULT` / `concurrency` config (core/utils/Pools.java) — except
concurrency here is Spark parallelism, not a thread pool.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def ship_package(spark: SparkSession) -> None:
    """Make the linkgraph package importable on executors.

    Zips the installed package and `addPyFile`s it — identical semantics to
    `spark-submit --py-files dist/linkgraph.zip` on a real cluster, so
    module-level pandas UDFs (pickled by reference) resolve on workers no
    matter where the driver script lives.

    The shipped name is CONTENT-HASHED (linkgraph-<sha>.zip): executors
    cache fetched files by name and hard-fail when a same-named file
    arrives with different bytes, so re-shipping after a source edit into
    a long-lived JVM (interactive dev, test session reusing the
    SparkContext) would poison every subsequent task if the name were
    fixed. A new hash = a new file = a clean fetch; an unchanged package
    re-adds the identical file, which Spark accepts.
    """
    import hashlib

    import linkgraph

    pkg_dir = os.path.dirname(os.path.abspath(linkgraph.__file__))
    zip_base = os.path.join(tempfile.mkdtemp(prefix="linkgraph_pyfiles_"), "linkgraph")
    zf = shutil.make_archive(zip_base, "zip", root_dir=os.path.dirname(pkg_dir),
                             base_dir="linkgraph")
    digest = hashlib.sha256(open(zf, "rb").read()).hexdigest()[:16]
    hashed = os.path.join(os.path.dirname(zf), f"linkgraph-{digest}.zip")
    os.rename(zf, hashed)
    spark.sparkContext.addPyFile(hashed)


def get_spark(
    app_name: str = "linkgraph",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32)
    so the same entry points serve tests, the driver harness, and the
    two-parallelism scaling benchmark.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("LINKGRAPH_SHUFFLE_PARTITIONS", cpus)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("LINKGRAPH_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    ship_package(spark)
    return spark
