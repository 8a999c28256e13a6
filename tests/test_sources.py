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

    def test_consumption_deletes_exactly_the_committed_prefix(self, spark):
        """S8 offset-commit semantics: after committing offset =
        max(seq) of the batch, the observable log is every row STRICTLY
        above the offset — the committed boundary row itself is gone
        (DELETE ... WHERE SEQUENCE$$ <= :committed).  r12 mutation
        audit: no pytest leg covered mvlog_consumption at all (only the
        DuckDB oracle), so `> commit_seq` → `>=` survived the suite."""
        from oracdc_spark.sources.mvlog import mvlog_consumption

        out = mvlog_consumption(spark, SF, last_seq=1000, batch_size=50)
        rows = out.collect()
        assert rows, "fixture log must extend past the committed batch"
        commit_seq = rows[0].commit_seq
        assert all(r.commit_seq == commit_seq for r in rows)
        assert min(r.seq for r in rows) > commit_seq
        # exact set: everything above the offset survives, nothing below
        log = simulated_mvlog(spark, SF)
        want = {r.seq for r in log.filter(F.col("seq") > commit_seq).collect()}
        assert {r.seq for r in rows} == want

    def test_lookup_join_delete_has_null_value(self, spark):
        out = mvlog_batch(spark, SF, last_seq=0, batch_size=100)
        deletes = out.filter(F.col("op") == "d").collect()
        assert deletes and all(r.totalprice is None and r.status is None for r in deletes)
        upserts = out.filter(F.col("op") != "d").collect()
        assert upserts and all(r.totalprice is not None for r in upserts)


class TestInitialLoad:
    # sf0.001 has 150 customers (scn base+10..base+1500); DEFAULT_CUT
    # (base+7500) sits ABOVE the whole range at this scale, so boundary
    # behavior is only observable with a cut ALIGNED to a row scn —
    # base+750 = customer 75's exact scn (r12 mutation audit: with the
    # old `min(strm.scn) >= cut` assertion, tightening the stream cut
    # from at-or-after to strictly-after dropped the exact-cut change
    # and every test still passed; the sf0.01 driver oracle would catch
    # it but the pytest leg was blind at sf0.001)
    CUT = DEFAULT_CUT - 6_750  # == cust_scn_base + 750, customer 75's scn

    def test_cut_partitions_rows(self, spark):
        snap = snapshot_at_cut(spark, SF, self.CUT)
        strm = stream_after_cut(spark, SF, self.CUT)
        assert snap.count() > 0 and strm.count() > 0
        assert snap.agg(F.max("scn")).first()[0] < self.CUT
        # the EXACT-cut change belongs to the stream half (at-or-after
        # contract) — assert equality, not just >=
        assert strm.agg(F.min("scn")).first()[0] == self.CUT
        assert strm.filter(F.col("scn") == self.CUT).count() == 1

    def test_union_covers_every_key_once(self, spark):
        out = initial_load_union(spark, SF)
        total = out.count()
        assert total == out.select("pk").distinct().count()
        # full customer table reconstructed
        from oracdc_spark.catalog import load_table

        assert total == load_table(spark, SF, "customer").count()

    def test_union_at_aligned_cut_keeps_the_boundary_key(self, spark):
        """With the cut aligned to customer 75's scn, that key's only
        row is the exact-cut stream change — a boundary error on EITHER
        half (snapshot < cut, stream >= cut) loses or duplicates pk 75."""
        out = initial_load_union(spark, SF, self.CUT)
        from oracdc_spark.catalog import load_table

        assert out.count() == load_table(spark, SF, "customer").count()
        boundary = out.filter(F.col("pk") == 75).collect()
        assert len(boundary) == 1 and boundary[0].src == "stream"


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
