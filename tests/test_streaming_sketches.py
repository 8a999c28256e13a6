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


def test_dedup_gate_emits_first_occurrences_only(spark):
    """After any prefix of micro-batches, the union of emitted rows must
    equal exact_dedup_keep over the concatenation of those batches."""
    import tempfile

    from oracdc_spark.operators.dedup import exact_dedup_keep
    from oracdc_spark.streaming.sketches import dedup_gate_batch

    b1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "alpha text")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(4, "alpha text"), (5, "gamma text"), (6, "gamma text")],
        "doc_id long, text string",
    )
    b3 = spark.createDataFrame(
        [(7, "beta text"), (8, "delta text")],
        "doc_id long, text string",
    )
    with tempfile.TemporaryDirectory() as d:
        state = f"{d}/digests"
        emitted = []
        seen_batches = None
        for b in (b1, b2, b3):
            out = dedup_gate_batch(spark, b, state)
            emitted.extend((r.doc_id, r.text) for r in out.collect())
            out.unpersist()
            seen_batches = b if seen_batches is None else seen_batches.unionAll(b)
            want = {
                (r.doc_id, r.text)
                for r in exact_dedup_keep(seen_batches).collect()
            }
            assert set(emitted) == want
        # final: exactly one doc per distinct text, the lowest doc_id
        assert dict(emitted) == {1: "alpha text", 2: "beta text",
                                 5: "gamma text", 8: "delta text"}
