"""Property: both sessionizers match a literal gap-fold model.

`analytics.events_sessionize` (lag-window batch form) and
`streaming.windows.session_windows` (F.session_window form) implement
the same semantics — a session extends while the gap to the previous
event of the same user is <= gap (exact-gap MERGES, the non-strict rule
test_session_fold_exact_gap_tie pins for the streaming side).  The
driver oracles replay each against DuckDB SQL *we also wrote*, so a
shared misreading would survive both; this third leg checks each
against a brute-force Python fold of random event streams, and
therefore also proves the two operators agree with EACH OTHER on every
input, ties and duplicate timestamps included.
"""

from __future__ import annotations

import pytest

import datetime

import pyspark.sql.functions as F  # noqa: F401  (parity with sibling files)
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.analytics import events_sessionize
from oracdc_spark.streaming.windows import session_windows

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

GAP_MIN = 30
_T0 = datetime.datetime(2024, 1, 1)

# (user_id, minutes offset) — small user space forces collisions; the
# offset range spans several gap widths and hits exact-gap spacings
_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=180),
    ),
    min_size=1,
    max_size=14,
)


def _evdf(spark, rows):
    data = [
        (i, _T0 + datetime.timedelta(minutes=mins), u, "click", 0.0, "")
        for i, (u, mins) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def _us(minutes):
    return int((_T0 + datetime.timedelta(minutes=minutes)).timestamp() * 1_000_000)


def _model(rows):
    """Brute-force gap fold: per user, sorted events; merge while the
    gap to the previous event is <= GAP_MIN.  Returns
    {user: [(start_min, last_min, n_events), ...]} in session order."""
    by_user = {}
    for u, mins in rows:
        by_user.setdefault(u, []).append(mins)
    out = {}
    for u, ts in by_user.items():
        ts.sort()
        sessions, start, prev, n = [], ts[0], ts[0], 1
        for t in ts[1:]:
            if t - prev <= GAP_MIN:
                prev, n = t, n + 1
            else:
                sessions.append((start, prev, n))
                start, prev, n = t, t, 1
        sessions.append((start, prev, n))
        out[u] = sessions
    return out


# exact-gap boundary examples (r11 mutation audit: flipping the engine's
# split rule from > gap to >= gap survived the random draws — an exact
# 30-minute spacing is a rare draw): exact gap MERGES, gap+1 SPLITS,
# and a chain of exact gaps is ONE session
_GAP_EXAMPLES = (
    [(0, 0), (0, GAP_MIN)],
    [(0, 0), (0, GAP_MIN), (0, 2 * GAP_MIN)],
    [(0, 0), (0, GAP_MIN + 1)],
)


@given(rows=_EVENTS)
@example(rows=_GAP_EXAMPLES[0])
@example(rows=_GAP_EXAMPLES[1])
@example(rows=_GAP_EXAMPLES[2])
@settings(**_SETTINGS)
@pytest.mark.slow
def test_batch_sessionize_matches_gap_fold(spark, rows, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("sess"))
    _evdf(spark, rows).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    got = sorted(
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in events_sessionize(spark, sf, gap_minutes=GAP_MIN).collect()
    )
    want = sorted(
        (u, _us(start), _us(last), n)
        for u, sessions in _model(rows).items()
        for start, last, n in sessions
    )
    assert got == want


@given(rows=_EVENTS)
@settings(**_SETTINGS)
def test_session_window_matches_gap_fold(spark, rows):
    got = sorted(
        (r.user_id, r.start_us, r.end_us, r.n_events)
        for r in session_windows(_evdf(spark, rows), gap=f"{GAP_MIN} minutes").collect()
    )
    # F.session_window's end = last event + gap
    want = sorted(
        (u, _us(start), _us(last + GAP_MIN), n)
        for u, sessions in _model(rows).items()
        for start, last, n in sessions
    )
    assert got == want
