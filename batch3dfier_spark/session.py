"""SparkSession factory with the engine's scale-oriented defaults.

Defaults chosen for the 100 TB design point and scaled down by env for
the local[32] sandbox:
- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- Arrow transport for the few pandas UDFs
- shuffle partitions sized by env (driver bench sets cores)
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "batch3dfier_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    # catalog tables (bucketed ingest) go to a scratch warehouse, not cwd
    warehouse = os.environ.get("SPARK_GRAFT_WAREHOUSE") or os.path.join(
        tempfile.gettempdir(), f"b3d_warehouse_{os.getpid()}"
    )
    # heap must scale with task slots: allocation-heavy stages (regex
    # over html strings) at 32 threads on a fixed 8g heap turn into a
    # GC storm and scale NEGATIVELY from 8 to 32 cores (measured)
    mem = os.environ.get("SPARK_DRIVER_MEM") or f"{max(8, int(1.5 * cores))}g"
    b = SparkSession.builder.appName(app_name)
    # under spark-submit (gateway env present) the master/deploy mode
    # comes from the submit command — never override it here
    if "PYSPARK_GATEWAY_PORT" not in os.environ:
        # local[N, 4]: allow task retries — local mode defaults to
        # maxFailures=1, so a single crashed/killed python worker aborts
        # the whole job (observed on this shared-host VM; on a real
        # cluster 4 is the standard default)
        b = b.master(f"local[{cores},4]")
    else:
        # cluster path only: speculative copies of straggler tasks.
        # Spark's TaskSchedulerImpl never starts the speculation thread
        # in local mode, so setting these locally would be a no-op —
        # the local-mode mitigations are local[N,4] retries plus
        # tools/stall_watchdog.py.
        b = (
            b.config("spark.speculation", "true")
            .config("spark.speculation.multiplier", "4")
            .config("spark.speculation.quantile", "0.9")
        )
    b = (
        b
        .config("spark.python.worker.faulthandler.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE-time broadcast decisions use RUNTIME sizes, so a higher
        # threshold is safe at any scale (a genuinely big side never
        # qualifies); 64m lets mid-size dimension/signature tables
        # broadcast instead of re-shuffling multi-million-row streams
        # (guide §3.1 — measured on the minhash est-screen joins)
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        # smaller scan splits -> several task waves per stage, so one
        # straggler row group cannot serialize a map stage (64-file
        # corpora otherwise arrive as exactly one wave at 32 cores)
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", mem)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", warehouse)
        .config("spark.driver.extraJavaOptions", f"-Dderby.system.home={warehouse}")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
