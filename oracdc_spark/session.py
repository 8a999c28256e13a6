"""SparkSession factory tuned for the CDC engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same settings are
what we would ship on a 1000-executor cluster (AQE on, skew-join handling,
shuffle partitions sized by env, Arrow for the pandas-UDF decode layer).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "oracdc-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Settings rationale (100 TB mindset, verified locally):

    * AQE enabled — runtime coalescing of shuffle partitions and skew-join
      splitting replace hand-tuned partition counts at scale.
    * ``spark.sql.session.timeZone=UTC`` — Oracle DATE/TIMESTAMP are
      zone-less (SURVEY §1.2); pinning UTC makes decode deterministic and
      matches the DuckDB oracle.
    * Arrow execution for pandas UDFs — the Oracle byte decoders (NUMBER,
      DATE, VECTOR) are vectorized; Arrow batch transfer keeps them off the
      row-at-a-time slow path.
    * parquet timestamps read as-is; no rebase surprises on the synthetic
      testdata.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    _allow_shj = os.environ.get("SPARK_GRAFT_ALLOW_SHJ", "0") == "1"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Joins (guide §3.1): SPARK_GRAFT_ALLOW_SHJ=1 lets the planner pick
        # shuffled-hash join where the per-partition build side fits and
        # lets AQE rewrite sort-merge to shuffled-hash below a 64 MB
        # local-map threshold — the guide-§9 cluster baseline.  NOT the
        # local default, on a measurement: at bench scale every declared
        # join is broadcast (or the lone surviving SortMergeJoin is not
        # rewritten), the executed plans are bit-identical under both
        # settings at 8 AND 32 cores, and the apparent A/B "win" reproduced
        # under a null test (both sides identical config) — it was
        # second-position bias in the interleaved protocol, not the conf
        # (r13 notes, "SHJ config A/B").  An effectless conf stays off so
        # the bench remains comparable; flip it on for cluster joins whose
        # post-shuffle partitions exceed the broadcast threshold.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            "false" if _allow_shj else "true",
        )
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            "64m" if _allow_shj else "0",
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def ship_package(spark: SparkSession) -> None:
    """Make ``oracdc_spark`` importable on executor Python workers.

    Python UDF / applyInPandasWithState functions defined inside the
    package are pickled *by reference*; workers must import the module.
    A driver that merely did ``sys.path.insert`` (not PYTHONPATH) would
    otherwise fail with ModuleNotFoundError on the first stateful stage.
    Idempotent; ~50 KB zip shipped once per SparkContext.
    """
    import os
    import tempfile
    import zipfile

    import oracdc_spark

    pkg_dir = os.path.dirname(os.path.abspath(oracdc_spark.__file__))
    marker = f"_oracdc_pyfile_shipped_{spark.sparkContext.applicationId}"
    if getattr(spark, marker, False):
        return
    zpath = os.path.join(
        tempfile.gettempdir(), f"oracdc_spark_pkg_{os.getpid()}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _dirs, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        arc = os.path.join(
                            "oracdc_spark", os.path.relpath(full, pkg_dir)
                        )
                        z.write(full, arc)
    spark.sparkContext.addPyFile(zpath)
    setattr(spark, marker, True)
