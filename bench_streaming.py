#!/usr/bin/env python3
"""Streaming CDC throughput: feed → per-XID stateful assembly → MERGE
replica, micro-batched. Prints one JSON line with rows/s (the
reference's ParsePerSecond figure, measured, not just defined)."""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_chunks = int(os.environ.get("SPARK_GRAFT_STREAM_CHUNKS", "4"))

    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from oracdc_spark.feed import change_feed
    from oracdc_spark.metrics import CdcQueryListener
    from oracdc_spark.session import get_spark
    from oracdc_spark.streaming.pipeline import run_pipeline

    spark = get_spark("oracdc-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as d:
        feed = change_feed(spark, sf_dir)
        n_rows = feed.count()
        chunked = feed.withColumn(
            "chunk", F.ntile(n_chunks).over(Window.orderBy("scn", "ssn"))
        )
        feed_dir = f"{d}/feed"
        os.makedirs(feed_dir)
        for i in range(1, n_chunks + 1):
            tmp = f"{d}/s{i}"
            chunked.filter(F.col("chunk") == i).drop("chunk").coalesce(4).write.parquet(tmp)
            for j, part in enumerate(sorted(glob.glob(f"{tmp}/part-*.parquet"))):
                shutil.move(part, f"{feed_dir}/c{i:02d}_{j}.parquet")
            shutil.rmtree(tmp)

        listener = CdcQueryListener()
        spark.streams.addListener(listener)
        t0 = time.time()
        q = run_pipeline(spark, feed_dir, f"{d}/replica", f"{d}/ckpt", max_files_per_trigger=4)
        q.processAllAvailable()
        q.stop()
        elapsed = time.time() - t0
        from oracdc_spark.sinks.merge import replica_state

        replica_rows = replica_state(spark, f"{d}/replica").count()

    print(
        json.dumps(
            {
                "metric": "streaming CDC end-to-end (assembly+merge) throughput",
                "value": round(n_rows / elapsed, 1),
                "unit": "rows/sec",
                "feed_rows": n_rows,
                "replica_rows": replica_rows,
                "elapsed_sec": round(elapsed, 2),
                "micro_batches": listener.batches,
                "sf_dir": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
