"""SparkSession factory tuned for this engine.

Local mode is a stand-in for a multi-executor cluster: the knobs below are the
ones that transfer (AQE, shuffle partitions ~ cores, Arrow batching for the
pandas-UDF kernels, UTC timestamps for oracle comparison).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32
# Arrow batch size: the span-scoring UDF amortizes scorer setup per batch; the
# reference batches 8 sentences/GPU step (legal_ner/main.py:610-614) — CPU
# vectorized kernels want far larger batches.
ARROW_MAX_RECORDS = 4096


def get_spark(
    app_name: str = "spanluke_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or ``local[*]``.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    # Ship this package to executor Python workers. Local mode inherits
    # PYTHONPATH; on a real cluster the same is done with
    # ``spark-submit --py-files spanluke_spark.zip`` (north_rule deployment).
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}{os.pathsep}{existing}" if existing else pkg_parent
        )
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
        )

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime coalescing + skew-join splitting; the north_rule demands
        # explicit skew handling, AQE is the safety net under it.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for every pandas-UDF kernel (input_hint: no per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_MAX_RECORDS))
        # r6 (guide §3.1): join-strategy stability for mid-size dims. The
        # default 10 MB estimate threshold leaves e.g. the 2-column orders
        # projection (~26 MB file estimate at sf1) right at the flip point,
        # so the plan oscillates between broadcast and SMJ run-to-run.
        # Parameterized: local default 64m (plenty for a 32 GB driver);
        # production clusters set SPARK_GRAFT_AUTOBROADCAST to taste —
        # the value scales with driver/executor memory, not data size.
        .config(
            "spark.sql.autoBroadcastJoinThreshold",
            os.environ.get("SPARK_GRAFT_AUTOBROADCAST", "64m"),
        )
        # Deterministic timestamps vs the DuckDB oracle (UTC-naive).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # Local mode = driver-only: a small heap GC-thrashes at full task
        # width (measured 2-3x slowdowns at 32 concurrent Arrow tasks on 8g).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
