"""G5 fusion / G6 expansion semantics + metrics observation."""

import pytest

import pyspark.sql.functions as F

from oracdc_spark.metrics import CdcQueryListener, observe_emission
from oracdc_spark.operators import fusion

SF = "/root/testdata/sf0.001"


class TestFusion:
    def test_two_fragments_fuse_to_one_event(self, spark):
        out = fusion.row_fusion(spark, SF)
        rows = out.collect()
        assert rows and all(r.n_fragments == 2 for r in rows)
        # both columns resolved from their respective fragments
        assert all(r.totalprice is not None and r.status == "F2" for r in rows)

    def test_fragment_order_resolution(self, spark):
        # first non-null wins: add a third fragment with a conflicting
        # price at frag=2 — fused price must stay the frag-0 value
        frags = fusion.fragment_feed(spark, SF)
        extra = frags.filter("frag = 0").withColumn("frag", F.lit(2).cast("bigint")).withColumn(
            "totalprice", F.col("totalprice") + 999
        )
        fused = fusion.fuse_fragments(frags.unionAll(extra))
        base = {r.pk: r.totalprice for r in fusion.row_fusion(spark, SF).collect()}
        got = {r.pk: r.totalprice for r in fused.collect()}
        assert got == base  # frag-2 conflict ignored


class TestChainedFusion:
    """G5b full-matrix semantics (RowChangeHolder restatement)."""

    def _pieces(self, spark, rows):
        from pyspark.sql.types import (
            DoubleType, IntegerType, LongType, StringType, StructField, StructType,
        )

        schema = StructType([
            StructField("scn", LongType()),
            StructField("xid", StringType()),
            StructField("row_id", StringType()),
            StructField("pk", LongType()),
            StructField("op", IntegerType()),
            StructField("fb", IntegerType()),
            StructField("part_no", LongType()),
            StructField("totalprice", DoubleType()),
            StructField("status", StringType()),
            StructField("clerk", StringType()),
        ])
        return spark.createDataFrame(rows, schema)

    def _p(self, op, fb, part, price=None, status=None, clerk=None, pk=1):
        return (100, "X1", f"R{pk}", pk, op, fb, part, price, status, clerk)

    def test_urp_irp_mix_is_update(self, spark):
        F_, L_, H_ = fusion.FB_FIRST, fusion.FB_LAST, fusion.FB_HEAD
        df = self._pieces(spark, [
            self._p(fusion.OP_URP, H_ | F_, 0, price=10.0),
            self._p(fusion.OP_URP, 0, 1, status="C2"),
            self._p(fusion.OP_IRP, L_, 2, clerk="CLK"),
        ])
        [r] = fusion.fuse_pieces(df).collect()
        assert (r.lm_op, r.totalprice, r.status, r.clerk, r.n_pieces) == (2, 10.0, "C2", "CLK", 3)

    def test_orp_overwrites_earlier_piece(self, spark):
        F_, L_, H_ = fusion.FB_FIRST, fusion.FB_LAST, fusion.FB_HEAD
        df = self._pieces(spark, [
            self._p(fusion.OP_URP, H_ | F_, 0, price=10.0),
            self._p(fusion.OP_URP, L_, 1, status="C2"),
            self._p(fusion.OP_ORP, 0, 2, price=99.0),
        ])
        [r] = fusion.fuse_pieces(df).collect()
        # ORP image replaces the URP value; op stays UPDATE
        assert (r.lm_op, r.totalprice) == (2, 99.0)

    def test_orp_upgrades_insert_to_update(self, spark):
        F_, L_, H_ = fusion.FB_FIRST, fusion.FB_LAST, fusion.FB_HEAD
        df = self._pieces(spark, [
            self._p(fusion.OP_IRP, H_ | F_, 0, price=10.0),
            self._p(fusion.OP_ORP, L_, 1, status="C2"),
        ])
        [r] = fusion.fuse_pieces(df).collect()
        assert r.lm_op == 2  # not all-IRP => UPDATE (completeRow upgrade)

    def test_insert_needs_head_first_last(self, spark):
        F_, L_ = fusion.FB_FIRST, fusion.FB_LAST
        df = self._pieces(spark, [
            self._p(fusion.OP_IRP, F_, 0, price=10.0),   # no HEAD anywhere
            self._p(fusion.OP_IRP, L_, 1, clerk="CLK"),
        ])
        assert fusion.fuse_pieces(df).count() == 0
        held = fusion.fuse_pieces(df, complete_only=False).collect()
        assert len(held) == 1 and not held[0].complete

    def test_update_without_last_held_back(self, spark):
        F_, H_ = fusion.FB_FIRST, fusion.FB_HEAD
        df = self._pieces(spark, [
            self._p(fusion.OP_URP, H_ | F_, 0, price=10.0),
            self._p(fusion.OP_URP, 0, 1, status="C2"),
        ])
        assert fusion.fuse_pieces(df).count() == 0

    def test_single_piece_delete(self, spark):
        fb = fusion.FB_HEAD | fusion.FB_FIRST | fusion.FB_LAST
        df = self._pieces(spark, [self._p(fusion.OP_DRP, fb, 0)])
        [r] = fusion.fuse_pieces(df).collect()
        assert (r.lm_op, r.n_pieces) == (3, 1)


class TestMultirow:
    def test_expansion_fan_and_ssn(self, spark):
        qmi = fusion.multirow_feed(spark, SF)
        out = fusion.expand_multirow(qmi)
        n_records = qmi.count()
        assert out.count() == n_records * fusion.MULTIROW_FAN
        one = sorted(
            out.filter(out.scn == out.agg(F.min("scn")).first()[0]).collect(),
            key=lambda r: r.ssn,
        )
        assert [r.ssn for r in one] == [0, 1, 2]
        assert one[1].totalprice == one[0].totalprice + 1.0


class TestMetrics:
    def test_observe_emission_counts(self, spark):
        from oracdc_spark.feed import change_feed
        from oracdc_spark.operators.cdc import commit_ordered

        stamped = commit_ordered(change_feed(spark, SF))
        observed, m = observe_emission(stamped)
        n = observed.count()
        vals = m.results()
        assert vals["SentRecordsCount"] == n
        assert vals["CommittedTransactionsCount"] > 0
        assert vals["LastCommitScn"] >= vals["LastScn"] - 10**6
        assert vals["ParsePerSecond"] > 0

    @pytest.mark.slow
    def test_streaming_listener(self, spark):
        import tempfile

        from tests.test_streaming import _write_feed_chunks
        from oracdc_spark.streaming.assembly import assemble_transactions

        listener = CdcQueryListener()
        spark.streams.addListener(listener)
        try:
            with tempfile.TemporaryDirectory() as d:
                feed_dir = _write_feed_chunks(spark, d, n_chunks=2)
                stream = (
                    spark.readStream.schema(
                        "scn bigint, ssn bigint, rba string, xid string, op int, "
                        "rollback boolean, owner string, table_name string, "
                        "row_id string, pk bigint, totalprice double, status string, "
                        "before_totalprice double, before_status string"
                    )
                    .option("maxFilesPerTrigger", 1)
                    .parquet(feed_dir)
                )
                q = (
                    assemble_transactions(stream)
                    .writeStream.format("noop")
                    .option("checkpointLocation", f"{d}/ck")
                    .start()
                )
                q.processAllAvailable()
                q.stop()
            import time

            for _ in range(20):  # listener events deliver asynchronously
                if listener.snapshot()["SentBatchesCount"] >= 1:
                    break
                time.sleep(0.5)
            snap = listener.snapshot()
            assert snap["SentBatchesCount"] >= 1
            assert snap["SentRecordsCount"] > 0
        finally:
            spark.streams.removeListener(listener)


class TestDirectLoad:
    """G7 — 19.1 COLB block dumps are NOT a QMI alias: in-place block
    rewrites mean only the final block image applies."""

    def test_stale_block_image_superseded(self, spark):
        from oracdc_spark.operators.fusion import direct_load, direct_load_feed

        feed = direct_load_feed(spark, "/root/testdata/sf0.001")
        # the fixture really contains superseded duplicates
        assert feed.count() > feed.select("bdba").distinct().count()

        out = direct_load(spark, "/root/testdata/sf0.001")
        rows = out.collect()
        # one emission per (block, slot); no stale -1000 images survive
        assert len(rows) == feed.select("bdba").distinct().count() * 2
        assert all(r.totalprice > 0 for r in rows)
        # slot order becomes ssn
        assert {r.ssn for r in rows} == {0, 1}


class TestSeqNotifier:
    """§2.8 last-seq notifier (LastProcessedSeqNotifier.java:34-39)."""

    def test_file_notifier_appends_lines(self, tmp_path):
        import time as _time

        from oracdc_spark.metrics import FileSeqNotifier

        f = tmp_path / "seq.txt"
        n = FileSeqNotifier(str(f))
        n.notify(_time.time(), 1042)
        n.notify(_time.time(), 1043, "log switch")
        lines = f.read_text().strip().splitlines()
        assert len(lines) == 2
        assert lines[0].endswith(":1042")
        assert lines[1].endswith(":1043:log switch")
        assert "T" in lines[0]  # ISO instant

    def test_configure_from_config_map(self, tmp_path):
        import time as _time

        from oracdc_spark.metrics import FileSeqNotifier

        n = FileSeqNotifier()
        n.configure({"a2.last.sequence.notifier.file": str(tmp_path / "s.txt")})
        n.notify(_time.time(), 7)
        assert (tmp_path / "s.txt").read_text().strip().endswith(":7")

    def test_streaming_listener_fires_notifier(self, spark, tmp_path):
        import tempfile

        from oracdc_spark.metrics import FileSeqNotifier, SeqNotifyingListener
        from oracdc_spark.streaming.assembly import assemble_transactions

        f = tmp_path / "seq.txt"
        listener = SeqNotifyingListener(notifier=FileSeqNotifier(str(f)))
        spark.streams.addListener(listener)
        try:
            with tempfile.TemporaryDirectory() as d:
                from tests.test_streaming import _write_feed_chunks

                feed_dir = _write_feed_chunks(spark, d, n_chunks=2)
                from oracdc_spark.streaming.pipeline import FEED_DDL

                stream = (
                    spark.readStream.schema(FEED_DDL)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(feed_dir)
                )
                q = (
                    assemble_transactions(stream)
                    .writeStream.format("memory")
                    .queryName("notif_test")
                    .option("checkpointLocation", f"{d}/ck")
                    .outputMode("append")
                    .start()
                )
                q.processAllAvailable()
                q.stop()
            lines = f.read_text().strip().splitlines()
            assert lines  # at least one batch boundary notified
        finally:
            spark.streams.removeListener(listener)
