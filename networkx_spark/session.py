"""SparkSession factory tuned for the link-graph workload.

Local mode is a single JVM; on a real cluster the same settings apply, plus
``spark-submit --py-files`` packaging (see README).  AQE stays on so skewed
shuffle partitions from hot vertices get split at runtime; explicit salting
for extreme skew lives in :mod:`networkx_spark.partitioning`.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "networkx-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores=None`` → ``$SPARK_GRAFT_CPUS`` or ``local[*]``.  Shuffle
    partitions default to the core count: the per-round bench data is far
    below the size where >1 partition per core pays off, and the setting is
    explicit so a cluster deployment overrides it.
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = cores or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # per-task file moves instead of a serial driver-side commit rename
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.locality.wait", "0")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    # shuffle/spill scratch: the default /tmp sits on the (virtualized,
    # serialized) system disk here — a non-scaling bottleneck local mode
    # would hit with every exchange.  On a real cluster spark.local.dir is
    # per-executor NVMe; the single-box analogue is tmpfs.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    # diagnostics hook (e.g. -Xlog:gc*:file=/tmp/gc.log for GC tracing);
    # applies to the single local-mode JVM at launch
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    # ad-hoc conf overrides for experiments (JSON dict), e.g.
    # SPARK_GRAFT_EXTRA_CONF='{"spark.io.compression.codec":"zstd"}'
    extra_env = os.environ.get("SPARK_GRAFT_EXTRA_CONF")
    if extra_env:
        import json
        for k, v in json.loads(extra_env).items():
            builder = builder.config(k, str(v))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
