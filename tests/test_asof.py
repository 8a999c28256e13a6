"""AS-OF join semantics: latest right row at-or-before each left time,
deterministic tie-break, NULL when no match, single-shuffle plan."""

from datetime import datetime

import pyspark.sql.functions as F

from oracdc_spark.operators.asof import asof_join, events_asof_orders


def _ts(s):
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("2024-01-05 00:00:00")),  # after two orders
            (2, 10, _ts("2024-01-02 00:00:00")),  # exactly at order 101
            (3, 10, _ts("2023-12-31 00:00:00")),  # before any order
            (4, 20, _ts("2024-01-05 00:00:00")),  # tie: two orders same ts
            (5, 30, _ts("2024-01-05 00:00:00")),  # key with no right rows
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100, 10, _ts("2024-01-01 00:00:00")),
            (101, 10, _ts("2024-01-02 00:00:00")),
            (102, 10, _ts("2024-01-09 00:00:00")),  # future: never matched
            (200, 20, _ts("2024-01-03 00:00:00")),
            (201, 20, _ts("2024-01-03 00:00:00")),  # same ts as 200
        ],
        "o_orderkey bigint, user_id bigint, o_orderdate timestamp",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "user_id", "ts", "o_orderdate", "o_orderkey")
    got = {r["event_id"]: r["asof_o_orderkey"] for r in out.collect()}
    assert got == {
        1: 101,  # latest at-or-before 01-05
        2: 101,  # order at exactly the event time IS matched (<= semantics)
        3: None,  # no order yet
        4: 201,  # tie on o_orderdate -> larger key, deterministically
        5: None,  # key absent from right side
    }


def test_asof_preserves_left_columns_and_count(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, "user_id", "ts", "o_orderdate", "o_orderkey")
    assert out.count() == left.count()
    assert {"event_id", "user_id", "ts"} <= set(out.columns)


def test_asof_single_shuffle_plan(spark):
    """The whole as-of is ONE exchange (hash on the join key) + window —
    no join operator, no pair explosion."""
    left, right = _frames(spark)
    out = asof_join(left, right, "user_id", "ts", "o_orderdate", "o_orderkey")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_events_asof_orders_testdata(spark):
    from oracdc_spark.catalog import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    out = events_asof_orders(ev, orders)
    rows = out.collect()
    assert len(rows) == ev.count()
    matched = [r for r in rows if r["asof_orderkey"] is not None]
    assert matched, "overlapping keys must produce matches"
    # every match must be at or before the event time
    assert all(r["asof_orderdate"] <= r["ts"] for r in matched)


def test_asof_property_random_vs_bruteforce(spark):
    """Randomized adversarial check (small key/time domains force ties
    and collisions) against a brute-force per-row reference."""
    import random

    rng = random.Random(20260813)
    for trial in range(4):
        n_l, n_r = rng.randint(1, 40), rng.randint(0, 40)
        lefts = [
            (i, rng.randint(0, 4), _ts("2024-01-01 00:00:00").replace(second=rng.randint(0, 5)))
            for i in range(n_l)
        ]
        rights = [
            (100 + j, rng.randint(0, 4), _ts("2024-01-01 00:00:00").replace(second=rng.randint(0, 5)))
            for j in range(n_r)
        ]
        left = spark.createDataFrame(lefts, "event_id bigint, user_id bigint, ts timestamp")
        right = spark.createDataFrame(
            rights, "o_orderkey bigint, user_id bigint, o_orderdate timestamp"
        )
        got = {
            r.event_id: r.asof_o_orderkey
            for r in asof_join(left, right, "user_id", "ts", "o_orderdate", "o_orderkey").collect()
        }
        for eid, u, ts in lefts:
            cands = [(ots, ok) for ok, ou, ots in rights if ou == u and ots <= ts]
            want = max(cands)[1] if cands else None
            assert got[eid] == want, (trial, eid, got[eid], want)


class TestDirectionalAsof:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, 1, 100), (2, 1, 205), (3, 2, 50)],
            "event_id long, k long, t long",
        ).withColumn("ts", __import__("pyspark.sql.functions", fromlist=["F"]).timestamp_micros("t"))
        right = spark.createDataFrame(
            [(10, 1, 90), (11, 1, 200), (12, 1, 210), (13, 2, 400)],
            "rid long, k long, rt long",
        ).withColumn("rts", __import__("pyspark.sql.functions", fromlist=["F"]).timestamp_micros("rt"))
        return left, right

    def _run(self, spark, direction, tol=None):
        from oracdc_spark.operators.asof import asof_join_directional

        left, right = self._frames(spark)
        out = asof_join_directional(
            left.select("event_id", "k", "ts"),
            right.select("k", "rts", "rid"),
            on="k", left_ts="ts", right_ts="rts", right_key="rid",
            direction=direction, tolerance_micros=tol,
        )
        return {r.event_id: (r.asof_rid, r.asof_rts_micros) for r in out.collect()}

    def test_backward(self, spark):
        got = self._run(spark, "backward")
        # e1@100: latest <=100 is rid10@90; e2@205: rid11@200; e3@50: none
        assert got == {1: (10, 90), 2: (11, 200), 3: (None, None)}

    def test_forward(self, spark):
        got = self._run(spark, "forward")
        # e1@100: earliest >=100 is rid11@200; e2@205: rid12@210; e3@50: rid13@400
        assert got == {1: (11, 200), 2: (12, 210), 3: (13, 400)}

    def test_nearest_ties_backward(self, spark):
        got = self._run(spark, "nearest")
        # e2@205: gap_b=5 (rid11@200) == gap_f=5 (rid12@210) -> backward wins
        assert got[2] == (11, 200)
        # e1@100: gap_b=10 < gap_f=100 -> backward; e3: only forward exists
        assert got[1] == (10, 90) and got[3] == (13, 400)

    def test_tolerance_cuts(self, spark):
        got = self._run(spark, "nearest", tol=20)
        # e1@100: backward gap 10 ok; forward gap 100 cut -> backward
        assert got[1] == (10, 90)
        # e3@50: forward gap 350 > 20 -> no match
        assert got[3] == (None, None)

    def test_inclusive_bounds(self, spark):
        from oracdc_spark.operators.asof import asof_join_directional
        import pyspark.sql.functions as F

        left = spark.createDataFrame(
            [(1, 1, 200)], "event_id long, k long, t long"
        ).withColumn("ts", F.timestamp_micros("t"))
        right = spark.createDataFrame(
            [(11, 1, 200)], "rid long, k long, rt long"
        ).withColumn("rts", F.timestamp_micros("rt"))
        for d in ("backward", "forward", "nearest"):
            out = asof_join_directional(
                left.select("event_id", "k", "ts"),
                right.select("k", "rts", "rid"),
                on="k", left_ts="ts", right_ts="rts", right_key="rid",
                direction=d,
            ).collect()[0]
            assert out.asof_rid == 11, d
