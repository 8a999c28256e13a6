"""Source operator tests (S6-S9)."""

import pyspark.sql.functions as F

from oracdc_spark.sources.initial_load import (
    DEFAULT_CUT,
    initial_load_union,
    snapshot_at_cut,
    stream_after_cut,
)
from oracdc_spark.sources.mvlog import mvlog_batch, poll_mvlog, simulated_mvlog

SF = "/root/testdata/sf0.001"


class TestMvlog:
    def test_poll_respects_offset_and_batch(self, spark):
        log = simulated_mvlog(spark, SF)
        batch = poll_mvlog(log, last_seq=1000, batch_size=50).collect()
        assert len(batch) == 50
        assert all(r.seq > 1000 for r in batch)
        # seq-ordered: the batch is the *lowest* 50 seqs above the offset
        nxt = poll_mvlog(log, last_seq=max(r.seq for r in batch), batch_size=50).collect()
        assert min(r.seq for r in nxt) > max(r.seq for r in batch)

    def test_lookup_join_delete_has_null_value(self, spark):
        out = mvlog_batch(spark, SF, last_seq=0, batch_size=100)
        deletes = out.filter(F.col("op") == "d").collect()
        assert deletes and all(r.totalprice is None and r.status is None for r in deletes)
        upserts = out.filter(F.col("op") != "d").collect()
        assert upserts and all(r.totalprice is not None for r in upserts)


class TestInitialLoad:
    def test_cut_partitions_rows(self, spark):
        # sf0.001 has 150 customers (scn base+10..base+1500) → cut mid-range
        cut = DEFAULT_CUT - 6_750
        snap = snapshot_at_cut(spark, SF, cut)
        strm = stream_after_cut(spark, SF, cut)
        assert snap.count() > 0 and strm.count() > 0
        assert snap.agg(F.max("scn")).first()[0] < cut
        assert strm.agg(F.min("scn")).first()[0] >= cut

    def test_union_covers_every_key_once(self, spark):
        out = initial_load_union(spark, SF)
        total = out.count()
        assert total == out.select("pk").distinct().count()
        # full customer table reconstructed
        from oracdc_spark.catalog import load_table

        assert total == load_table(spark, SF, "customer").count()


def test_archived_log_discovery_overlap_and_order(spark):
    """S4: only sequences whose [first, next) span overlaps the window
    survive, NEXT_CHANGE# = max(scn)+1, output ordered by sequence."""
    from oracdc_spark.sources.archived_log import discover_sequences

    feed = spark.createDataFrame(
        [(scn, 0, f"1.{scn}.0") for scn in (5, 15, 25, 35, 95, 105)],
        "scn long, ssn long, rba string",
    )
    rows = discover_sequences(feed, first_scn=20, next_scn=100, seq_span=10).collect()
    # spans: seq0=[5,6) seq1=[15,16) seq2=[25,26) seq3=[35,36) seq9=[95,96)
    # seq10=[105,106); window [20,100) keeps 2, 3, 9 only
    assert [(r.thread, r.sequence) for r in rows] == [(1, 2), (1, 3), (1, 9)]
    by_seq = {r.sequence: r for r in rows}
    assert by_seq[9].first_change == 95 and by_seq[9].next_change == 96
    assert all(r.n_records == 1 for r in rows)
