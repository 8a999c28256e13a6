"""Multimodal plumbing + LOB reassembly tests."""

import pyspark.sql.functions as F
import pytest

from oracdc_spark.catalog import load_table
from oracdc_spark.operators import lob, multimodal

SF = "/root/testdata/sf0.001"


class TestLob:
    def test_roundtrip_byte_exact(self, spark):
        out = lob.lob_roundtrip(spark, SF)
        assert out.filter(~F.col("match")).count() == 0
        assert out.count() == 500

    def test_chunking_sizes(self, spark):
        docs = load_table(spark, SF, "documents")
        chunks = lob.lob_chunks(docs, 100)
        # every non-final chunk is exactly 100 chars
        w = chunks.groupBy("lob_id").agg(F.max("chunk_idx").alias("last"))
        j = chunks.join(w, "lob_id").filter(F.col("chunk_idx") < F.col("last"))
        assert j.filter(F.length("chunk") != 100).count() == 0


class TestMultimodal:
    def test_features_schema_and_determinism(self, spark):
        media = multimodal.synthetic_media(load_table(spark, SF, "documents"))
        feats = multimodal.extract_features(media)
        rows = {r.media_id: r for r in feats.collect()}
        assert len(rows) == 500
        r0 = rows[0]
        assert r0.kind == "image" and r0.width and 1 <= r0.width <= 1920
        # audio/video rows have no dimensions
        r1 = rows[1]
        assert r1.kind == "audio" and r1.width is None
        # digest matches the payload bytes
        import hashlib

        doc0 = (
            load_table(spark, SF, "documents").filter("doc_id = 0").first()
        )
        assert r0.digest == hashlib.sha256(doc0.text.encode()).hexdigest()
        assert r0.n_bytes == len(doc0.text.encode())

    def test_frame_sample_plan(self, spark):
        media = multimodal.synthetic_media(load_table(spark, SF, "documents"))
        plan = multimodal.frame_sample_plan(media, every_n=10)
        got = plan.filter("media_id = 2").collect()  # doc 2 → video
        assert got and all(r.frame_idx % 10 == 0 for r in got)

    def test_resize_stub_raises_on_execution(self, spark):
        media = multimodal.synthetic_media(load_table(spark, SF, "documents"))
        plan = multimodal.resize_stub(media, 224, 224)
        assert plan.schema == multimodal.MEDIA_SCHEMA  # plan is real
        with pytest.raises(Exception, match="NotImplementedError|resize"):
            plan.count()  # execution hits the stub
