"""SparkSession builder with scale-conscious defaults.

Designed for a 1000-executor cluster reading ~100 TB; tested on local[N].
Every knob here is a plain Spark conf — nothing sandbox-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ship_package(spark: SparkSession) -> None:
    """Make the ie_spark package importable on executors (addPyFile zip).

    Required whenever a pandas-UDF closure references ie_spark code and the
    driver's cwd/PYTHONPATH isn't guaranteed to propagate to Python workers
    (spark-submit without --py-files, notebooks, embedding hosts).  No-op
    after the first call per SparkContext."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    import tempfile
    import zipfile
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zpath = os.path.join(tempfile.gettempdir(),
                         f"ie_spark_pkg_{os.getpid()}.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for r, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(r, f)
                    z.write(full, os.path.relpath(full, root))
    spark.sparkContext.addPyFile(zpath)
    _SHIPPED.add(key)


def get_spark(app_name: str = "ie_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession.

    - AQE on: runtime coalescing, skew-join splitting (SURVEY.md §4).
    - Arrow on + bounded batch size: the extraction UDFs are Arrow pandas
      UDFs; 10k rows/batch keeps Python worker memory flat regardless of
      input split size.
    - shuffle partitions default to 2× cores locally; on a real cluster set
      it (or rely on AQE coalescing from a high initial number).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") \
        or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    cores = 32
    if master.startswith("local["):
        inner = master[6:-1]
        cores = os.cpu_count() if inner == "*" else int(inner)
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cores, 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
