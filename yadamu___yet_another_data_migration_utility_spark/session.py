"""SparkSession factory with scale-aware defaults.

Defaults target the sandbox (local[32], single JVM, 128 GiB) but every
knob is the one you would set on a 1000-executor cluster too: AQE on
(runtime skew-join + partition coalescing), Arrow on (vectorized pandas
UDF transfer), UTC session timezone (the reference normalizes all
timestamps to UTC ISO-8601 -- /root/reference/src/YADAMU/file/node/
jsonWriter.js:125-149), shuffle partitions sized to cores rather than
the 200 default.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def scratch_dir() -> str:
    """Scratch for replay tables + shuffle. This sandbox has ONE virtio
    disk (~120 MB/s) that saturates at 8 cores; on a real cluster every
    executor brings its own disks (and S3A scales with the fleet), so
    aggregate storage bandwidth grows with cluster size. tmpfs restores
    that scales-with-compute property. Override: SPARK_GRAFT_SCRATCH."""
    d = os.environ.get("SPARK_GRAFT_SCRATCH")
    if d:
        return d
    return "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def get_spark(
    app_name: str = "yadamu_spark_cdc",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count -- on a real
    cluster you would size this to ~2-3x total cores and rely on AQE
    coalescing, which is enabled here for exactly that reason.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Under spark-submit (the north rule's cluster launch path:
    # `spark-submit --py-files pkg.zip ... cli.py <verb>`) the JVM
    # gateway already exists and --master/--driver-memory were decided
    # by the submit command; forcing local[N] here would fight the
    # cluster manager. Detected via the gateway env the PythonRunner
    # exports; every SQL conf below still applies per-session.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not under_submit:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] => N parallel tasks; more partitions than that only
        # adds scheduling overhead at this scale. AQE coalesces down
        # when partitions are small, splits when skewed. On a cluster
        # (master decided by spark-submit) the SUBMITTED conf wins:
        # leave the setting alone unless SPARK_GRAFT_SHUFFLE_PARTITIONS
        # explicitly overrides -- clobbering a --conf
        # spark.sql.shuffle.partitions=600 with a local default would
        # under-parallelize every shuffle on the fleet.
        if master is None:
            env_n = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
            shuffle_partitions = int(env_n) if env_n else None
        else:
            n = (master[master.find("[") + 1 : master.find("]")]
                 if "[" in master else str(cpus))
            shuffle_partitions = cpus if n == "*" else int(n)

    mem = (extra_conf or {}).get(
        "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g")
    )

    builder = (
        (SparkSession.builder if master is None
         else SparkSession.builder.master(master))
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # int64 micros (Iceberg/Delta's encoding): legacy INT96 carries
        # no footer min/max, which would blind LakeTable's zone maps
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # 256 MB matches bench.py (one config everywhere, ADVICE r1):
        # covers the dedup winner set of a 10^7-event micro-batch
        # (~2M keys x ~60 B); past that AQE falls back to shuffle join.
        # The apply path broadcasts its winner set explicitly anyway.
        .config("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
    )
    if shuffle_partitions is not None:
        builder = builder.config(
            "spark.sql.shuffle.partitions", str(shuffle_partitions))
    if not under_submit:
        # driver JVM sizing only applies when WE launch the JVM; under
        # spark-submit these are submit-time flags and would be ignored.
        # Fixed pre-touched heap: G1 heap growth under many concurrent
        # tasks stalls this sandbox's VM for tens of seconds (measured
        # 83s vs 1.3s for an identical pass); pay the page-fault cost
        # once at startup instead.
        builder = (
            builder.config("spark.driver.memory", mem)
            .config(
                "spark.driver.extraJavaOptions",
                f"-Xms{mem} -XX:+AlwaysPreTouch -XX:+UseParallelGC",
            )
            .config("spark.ui.enabled", "false")
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
