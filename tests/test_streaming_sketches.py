"""Incrementally maintained sketches must converge to the batch sketch
of everything seen — the O(batch)-per-trigger property."""

import glob
import os
import shutil
import tempfile

import pytest

from oracdc_spark.catalog import load_table

SF = "/root/testdata/sf0.001"


def _chunked_docs(spark, d, n_chunks=3):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    out = f"{d}/docs"
    os.makedirs(out)
    for i in range(n_chunks):
        tmp = f"{d}/s{i}"
        docs.filter(f"doc_id % {n_chunks} = {i}").coalesce(1).write.parquet(tmp)
        shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], f"{out}/c{i:02d}.parquet")
        shutil.rmtree(tmp)
    return out


@pytest.mark.slow
def test_streamed_sketches_equal_batch(spark):
    import pyspark.sql.functions as F

    from oracdc_spark.operators.textops import _gram_hash, _tokens, cms_sketch, hll_registers
    from oracdc_spark.streaming.sketches import run_sketch_pipeline

    with tempfile.TemporaryDirectory() as d:
        docs_dir = _chunked_docs(spark, d)
        cms_path, hll_path = f"{d}/cms_state", f"{d}/hll_state"
        q = run_sketch_pipeline(spark, docs_dir, cms_path, hll_path, f"{d}/ckpt")
        q.processAllAvailable()
        q.stop()

        docs = load_table(spark, SF, "documents").select("doc_id", "text")
        expect_cms = cms_sketch(docs)
        got_cms = spark.read.parquet(cms_path)
        assert got_cms.exceptAll(expect_cms).count() == 0
        assert expect_cms.exceptAll(got_cms).count() == 0

        hashes = docs.select(F.explode(_tokens()).alias("tok")).select(
            _gram_hash(F.lower("tok")).alias("h")
        )
        expect_hll = hll_registers(hashes)
        got_hll = spark.read.parquet(hll_path)
        assert got_hll.exceptAll(expect_hll).count() == 0
        assert expect_hll.exceptAll(got_hll).count() == 0

        # fixed-size state: a few KB regardless of stream volume
        sz = sum(
            os.path.getsize(os.path.join(cms_path, f)) for f in os.listdir(cms_path)
        )
        assert sz < 1_000_000
