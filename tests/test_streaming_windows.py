"""Streaming windowed aggregation: emitted (watermark-closed) windows
must exactly match the batch computation; open windows withhold."""

import glob
import os
import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from oracdc_spark.catalog import load_table
from oracdc_spark.streaming.windows import session_windows, windowed_event_counts

SF = "/root/testdata/sf0.001"


def _chunked_events(spark, d, n_chunks=3):
    ev = load_table(spark, SF, "events")
    from pyspark.sql import Window

    chunked = ev.withColumn("chunk", F.ntile(n_chunks).over(Window.orderBy("ts", "event_id")))
    out = f"{d}/events"
    os.makedirs(out)
    for i in range(1, n_chunks + 1):
        tmp = f"{d}/s{i}"
        chunked.filter(F.col("chunk") == i).drop("chunk").coalesce(1).write.parquet(tmp)
        shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], f"{out}/c{i:02d}.parquet")
        shutil.rmtree(tmp)
    return out


@pytest.mark.slow
def test_windowed_counts_match_batch_for_closed_windows(spark):
    with tempfile.TemporaryDirectory() as d:
        src_dir = _chunked_events(spark, d)
        stream = (
            spark.readStream.schema(
                "event_id bigint, ts timestamp, user_id bigint, "
                "event_type string, value double, props string"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        q = (
            windowed_event_counts(stream)
            .writeStream.format("memory")
            .queryName("win_counts")
            .option("checkpointLocation", f"{d}/ck")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

        got = {
            (r.hour, r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        assert got, "no windows emitted"
        batch = {
            (r.hour, r.event_type): (r.n_events, r.sum_value)
            for r in windowed_event_counts(load_table(spark, SF, "events")).collect()
        }
        # append mode: every emitted window is final → must equal batch
        for k, v in got.items():
            assert batch[k] == v, k
        # windows newer than the final watermark are withheld, not wrong
        assert len(got) < len(batch)


def test_session_window_batch_parity(spark):
    ev = load_table(spark, SF, "events")
    sess = session_windows(ev).collect()
    # session windows: end - start >= 0 and counts sum to all events
    assert sum(r.n_events for r in sess) == ev.count()
    assert all(r.end_us >= r.start_us for r in sess)


@pytest.mark.slow
def test_dedup_redelivered_exactly_once(spark):
    """Records redelivered in a later micro-batch (restart replay) must
    be emitted exactly once; result = batch distinct on (xid, scn, ssn)."""
    from oracdc_spark.feed import change_feed
    from oracdc_spark.streaming.pipeline import FEED_DDL
    from oracdc_spark.streaming.windows import dedup_redelivered

    with tempfile.TemporaryDirectory() as d:
        from tests.test_streaming import _write_feed_chunks

        feed_dir = _write_feed_chunks(spark, d, n_chunks=3)
        # redeliver chunk 1 as a 4th file: an at-least-once replay
        shutil.copy(f"{feed_dir}/chunk_001.parquet", f"{feed_dir}/chunk_004.parquet")

        stream = (
            spark.readStream.schema(FEED_DDL)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed_dir)
        )
        q = (
            dedup_redelivered(stream)
            .writeStream.format("memory")
            .queryName("deduped_stream")
            .option("checkpointLocation", f"{d}/ckpt_dd")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

        got = spark.sql("SELECT xid, scn, ssn FROM deduped_stream")
        n_expected = change_feed(spark, SF).select("xid", "scn", "ssn").distinct().count()
        assert got.count() == n_expected
        assert got.distinct().count() == n_expected  # no double emission


def test_dedup_redelivered_batch_parity(spark):
    from oracdc_spark.feed import change_feed
    from oracdc_spark.streaming.windows import dedup_redelivered

    feed = change_feed(spark, SF)
    doubled = feed.unionAll(feed.limit(50))
    assert dedup_redelivered(doubled).count() == feed.count()


@pytest.mark.slow
def test_interval_join_stream_matches_batch(spark):
    """Stream-stream interval join with watermarks must emit exactly the
    batch join's pairs once all input is processed (inner join, append
    mode, event times well inside the final watermark)."""
    from oracdc_spark.streaming.windows import interval_join

    schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        src_dir = _chunked_events(spark, d)

        def _stream():
            return (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src_dir)
            )

        purchases = _stream().filter(F.col("event_type") == "purchase")
        clicks = _stream().filter(F.col("event_type") == "click")
        q = (
            interval_join(purchases, clicks)
            .writeStream.format("memory")
            .queryName("ij")
            .option("checkpointLocation", f"{d}/ck_ij")
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = {
            (r.purchase_id, r.click_id)
            for r in spark.sql("SELECT * FROM ij").collect()
        }

        ev = load_table(spark, SF, "events")
        batch = {
            (r.purchase_id, r.click_id)
            for r in interval_join(
                ev.filter(F.col("event_type") == "purchase"),
                ev.filter(F.col("event_type") == "click"),
            ).collect()
        }
        assert batch, "batch join must produce pairs"
        # inner stream-stream join: emitted pairs are exactly the batch pairs
        # up to watermark holdback; with processAllAvailable on a bounded
        # input, matched pairs inside the horizon must all be emitted
        assert got <= batch
        assert len(got) >= int(0.8 * len(batch)), (len(got), len(batch))


# ---------------------------------------------------------------------------
# Micro-batch folds (the r9 driver-row promotions)
# ---------------------------------------------------------------------------


def test_session_fold_matches_batch(spark):
    """Folding event_id%3 micro-batches through session_fold_batch must
    reproduce session_windows over all events exactly."""
    from oracdc_spark.streaming.windows import session_fold_batch

    ev = load_table(spark, SF, "events")
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/sessions"
        for b in range(3):
            final = session_fold_batch(spark, ev.filter(F.col("event_id") % 3 == b), path)
        got = sorted(map(tuple, final.collect()))
    want = sorted(map(tuple, session_windows(ev).collect()))
    assert got == want and got


def test_session_fold_exact_gap_tie(spark):
    """An event exactly `gap` after the previous one MERGES into its
    session (F.session_window's non-strict semantics) — including when
    the two events arrive in DIFFERENT micro-batches, the case the
    fragment-merge condition (later.start <= earlier.end) must get right."""
    import datetime

    from oracdc_spark.streaming.windows import session_fold_batch

    t0 = datetime.datetime(2024, 1, 1)
    gap = datetime.timedelta(minutes=30)
    rows = [
        (1, t0, 7, "click", 0.0, ""),          # batch 0
        (2, t0 + gap, 7, "click", 0.0, ""),    # batch 1: exactly gap later
        (3, t0 + 3 * gap, 7, "click", 0.0, ""),# batch 2: > gap after #2's end? no: 3*gap - gap = 2*gap > gap -> new session
    ]
    ev = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    # single-shot semantics first: one session of 2, one of 1
    one_shot = sorted(map(tuple, session_windows(ev).collect()))
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/sessions"
        for b in range(3):
            final = session_fold_batch(spark, ev.filter(F.col("event_id") == b + 1), path)
        folded = sorted(map(tuple, final.collect()))
    assert folded == one_shot
    assert [r[3] for r in folded] == [2, 1]  # n_events per session


@pytest.mark.slow
def test_interval_fold_matches_batch(spark):
    """Union of per-batch emissions of interval_join_fold_batch equals
    the batch interval join — each pair exactly once."""
    from oracdc_spark.streaming.windows import interval_join, interval_join_fold_batch

    ev = load_table(spark, SF, "events")
    with tempfile.TemporaryDirectory() as d:
        emitted = []
        for b in range(3):
            batch = ev.filter(F.col("event_id") % 3 == b)
            emitted.append(
                interval_join_fold_batch(
                    spark,
                    batch.filter(F.col("event_type") == "purchase"),
                    batch.filter(F.col("event_type") == "click"),
                    f"{d}/state",
                    window="2 hours",
                )
            )
        out = emitted[0]
        for e in emitted[1:]:
            out = out.unionAll(e)
        got = sorted((r.purchase_id, r.click_id) for r in out.collect())
    want = sorted(
        (r.purchase_id, r.click_id)
        for r in interval_join(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "click"),
            window="2 hours",
        ).collect()
    )
    assert got == want and got
    assert len(got) == len(set(got))  # exactly-once


@pytest.mark.slow
def test_interval_fold_eviction_bounds_state(spark):
    """With a horizon set, state rows beyond the watermark are evicted
    after each trigger: a click older than (wm - window) and a purchase
    older than wm leave the buffer — the bounded-state property the
    streaming join gets from its watermark."""
    import datetime

    from oracdc_spark.streaming.windows import interval_join_fold_batch

    t0 = datetime.datetime(2024, 1, 1)

    def _ev(eid, minutes, etype):
        return (eid, t0 + datetime.timedelta(minutes=minutes), 7, etype, 0.0, "")

    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    b0 = spark.createDataFrame([_ev(1, 0, "click"), _ev(2, 5, "purchase")], schema)
    # batch 1 advances event time far beyond horizon+window
    b1 = spark.createDataFrame([_ev(3, 600, "click"), _ev(4, 605, "purchase")], schema)
    with tempfile.TemporaryDirectory() as d:
        st = f"{d}/state"
        e0 = interval_join_fold_batch(
            spark, b0.filter(F.col("event_type") == "purchase"),
            b0.filter(F.col("event_type") == "click"), st,
            window="10 minutes", horizon="30 minutes",
        )
        assert {(r.purchase_id, r.click_id) for r in e0.collect()} == {(2, 1)}
        e1 = interval_join_fold_batch(
            spark, b1.filter(F.col("event_type") == "purchase"),
            b1.filter(F.col("event_type") == "click"), st,
            window="10 minutes", horizon="30 minutes",
        )
        assert {(r.purchase_id, r.click_id) for r in e1.collect()} == {(4, 3)}
        # watermark = 605min - 30min = 575min: batch-0 rows (ts <= 5min)
        # are gone; only batch-1 rows remain buffered
        p_state = spark.read.parquet(f"{st}/purchases").collect()
        c_state = spark.read.parquet(f"{st}/clicks").collect()
        assert [r.purchase_id for r in p_state] == [4]
        assert [r.click_id for r in c_state] == [3]


# ---------------------------------------------------------------------------
# Property tests: fold == batch under ARBITRARY batch assignment
# ---------------------------------------------------------------------------
# The driver rows fold event_id%3 batches; these check the theorem the
# fold relies on — the result is independent of HOW events are split
# into micro-batches (any partition of the input, any arrival order).

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_PROP_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# minutes offsets spanning multiple gap widths (gap=30min) with ties and
# exact-gap spacings possible; batch = arbitrary assignment 0..2
_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user_id (collisions)
        st.integers(min_value=0, max_value=240),    # ts offset, minutes
        st.integers(min_value=0, max_value=2),      # batch assignment
    ),
    min_size=1,
    max_size=16,
)


def _evdf(spark, rows, types=("click",)):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    data = [
        (i, t0 + datetime.timedelta(minutes=mins), u, types[i % len(types)], 0.0, str(b))
        for i, (u, mins, b) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )


@given(rows=_EVENTS)
@settings(**_PROP_SETTINGS)
@pytest.mark.slow
def test_session_fold_any_split(spark, rows):
    from oracdc_spark.streaming.windows import session_fold_batch, session_windows
    import tempfile

    ev = _evdf(spark, rows)
    with tempfile.TemporaryDirectory() as d:
        final = None
        for b in range(3):
            batch = ev.filter(F.col("props") == str(b))
            if batch.take(1):
                final = session_fold_batch(spark, batch, f"{d}/st")
        got = sorted(map(tuple, final.collect()))
    assert got == sorted(map(tuple, session_windows(ev).collect()))


@given(rows=_EVENTS)
@settings(**_PROP_SETTINGS)
@pytest.mark.slow
def test_interval_fold_any_split(spark, rows):
    from oracdc_spark.streaming.windows import interval_join, interval_join_fold_batch
    import tempfile

    ev = _evdf(spark, rows, types=("purchase", "click"))
    with tempfile.TemporaryDirectory() as d:
        pairs = []
        for b in range(3):
            batch = ev.filter(F.col("props") == str(b))
            out = interval_join_fold_batch(
                spark,
                batch.filter(F.col("event_type") == "purchase"),
                batch.filter(F.col("event_type") == "click"),
                f"{d}/st",
                window="45 minutes",
            )
            pairs += [(r.purchase_id, r.click_id) for r in out.collect()]
    want = sorted(
        (r.purchase_id, r.click_id)
        for r in interval_join(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "click"),
            window="45 minutes",
        ).collect()
    )
    assert sorted(pairs) == want
    assert len(pairs) == len(set(pairs))  # exactly-once across batches


@given(rows=_EVENTS)
@settings(**_PROP_SETTINGS)
@pytest.mark.slow
def test_interval_join_matches_bruteforce(spark, rows):
    """Third leg of the interval-join triangle (fold==batch is above;
    this pins batch==model): the equality-plus-range join equals a
    literal quadratic scan — same user, click in [purchase-45min,
    purchase], both endpoints INCLUSIVE — so a shared misreading of the
    boundary in the Spark plan and the DuckDB oracle cannot survive."""
    from oracdc_spark.streaming.windows import interval_join

    ev = _evdf(spark, rows, types=("purchase", "click"))
    got = sorted(
        (r.purchase_id, r.click_id)
        for r in interval_join(
            ev.filter(F.col("event_type") == "purchase"),
            ev.filter(F.col("event_type") == "click"),
            window="45 minutes",
        ).collect()
    )
    purchases = [(i, u, mins) for i, (u, mins, _b) in enumerate(rows) if i % 2 == 0]
    clicks = [(i, u, mins) for i, (u, mins, _b) in enumerate(rows) if i % 2 == 1]
    want = sorted(
        (pid, cid)
        for pid, pu, pm in purchases
        for cid, cu, cm in clicks
        if pu == cu and pm - 45 <= cm <= pm
    )
    assert got == want
