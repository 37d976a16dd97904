"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same config block is what we would
submit to a 1000-executor cluster (AQE on, adaptive coalescing, Arrow for
the few Pandas-UDF paths, sensible shuffle partitioning).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "custom_vector_database_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a real
    cluster the master/resource settings come from spark-submit; everything
    here is safe to keep.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    # Executor Python workers resolve pickled-by-reference functions by
    # importing this package; they inherit PYTHONPATH from the JVM, not
    # the driver's runtime sys.path. Export the package root BEFORE the
    # JVM starts so a driver launched from any cwd (sys.path.insert
    # style) still works. On a real cluster, ship the package with
    # --py-files / a wheel instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    py_path = os.environ.get("PYTHONPATH", "")
    if pkg_root not in py_path.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + py_path if py_path else "")
        )
    if shuffle_partitions is None:
        # local mode: match cores. On a cluster you'd size this to
        # total-cores * 2-3, or let AQE coalesce from a higher number.
        shuffle_partitions = max(int(cpus), 4)
    builder = SparkSession.builder
    # Respect an externally-configured master so submitting to a real
    # cluster doesn't silently run local on the driver; default to local[N]
    # only when none is set. Under `spark-submit app.py` the JVM gateway is
    # already running with spark.master set from the submit args — the
    # Python process sees PYSPARK_GATEWAY_PORT (PythonRunner exports it),
    # which is the reliable signal (spark-submit does NOT set
    # SPARK_MASTER/MASTER/PYSPARK_SUBMIT_ARGS for script apps).
    externally_set = (
        os.environ.get("PYSPARK_GATEWAY_PORT")
        or os.environ.get("SPARK_MASTER")
        or os.environ.get("MASTER")
        or "--master" in os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    )
    if not externally_set:
        builder = builder.master(f"local[{cpus}]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
