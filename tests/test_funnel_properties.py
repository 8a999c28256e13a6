"""Property: the 3-step funnel equals a literal per-user replay.

`events_funnel` counts users completing signup -> click -> purchase
IN ORDER with earliest-occurrence, STRICTLY-after semantics.  The
strict inequalities are where a plan and an intuition diverge (a click
at exactly the signup timestamp does NOT advance the funnel); random
event streams with heavy timestamp ties pin them against a brute-force
Python replay.
"""

from __future__ import annotations

import pytest

import datetime

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.analytics import events_funnel

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_T0 = datetime.datetime(2024, 1, 1)
_TYPES = ("signup", "click", "purchase", "view")

# (user_id 0-2, type idx, minute 0-5): tiny domains force same-user
# same-timestamp collisions across steps
_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=1,
    max_size=16,
)


def _model(rows):
    by_user = {}
    for u, ti, m in rows:
        by_user.setdefault(u, []).append((_TYPES[ti], m))
    n1 = n2 = n3 = 0
    for evs in by_user.values():
        t1 = min((m for t, m in evs if t == "signup"), default=None)
        if t1 is None:
            continue
        n1 += 1
        t2 = min((m for t, m in evs if t == "click" and m > t1), default=None)
        if t2 is None:
            continue
        n2 += 1
        if any(t == "purchase" and m > t2 for t, m in evs):
            n3 += 1
    return n1, n2, n3


@given(rows=_EVENTS)
# Directed boundary examples (r12 mutation audit: relaxing either strict
# inequality to at-or-after SURVIVED the 6 random examples — ties in a
# DECIDING position are rare draws).  First: click at exactly the first
# signup minute, then a purchase — strict semantics stall the funnel at
# step 1 (n2=n3=0), the >= mutant advances it.  Second: purchase at
# exactly the first qualifying click minute — strict stalls at step 2.
@example(rows=[(0, 0, 2), (0, 1, 2), (0, 2, 3)])
@example(rows=[(0, 0, 1), (0, 1, 2), (0, 2, 2)])
@settings(**_SETTINGS)
def test_funnel_matches_per_user_replay(spark, rows, tmp_path_factory):
    sf = str(tmp_path_factory.mktemp("funnel"))
    data = [
        (i, _T0 + datetime.timedelta(minutes=m), u, _TYPES[ti], 0.0, "")
        for i, (u, ti, m) in enumerate(rows)
    ]
    spark.createDataFrame(
        data,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    [r] = events_funnel(spark, sf).collect()
    n1, n2, n3 = _model(rows)
    assert (r.n_signup, r.n_click_after, r.n_purchase_after) == (n1, n2, n3)
    if n1:
        assert abs(r.conversion_pct - round(n3 / n1 * 100, 4)) < 1e-9


@given(rows=_EVENTS)
# same two strict-boundary examples as the unwindowed test, plus the
# window's UPPER bound: click exactly window hours after signup is IN
# ((t1, t1+3] is right-closed — at-3h must count), click at 4h is out
@example(rows=[(0, 0, 2), (0, 1, 2), (0, 2, 3)])
@example(rows=[(0, 0, 1), (0, 1, 2), (0, 2, 2)])
@example(rows=[(0, 0, 0), (0, 1, 3), (0, 2, 4)])
@example(rows=[(0, 0, 0), (0, 1, 4), (0, 2, 5)])
@settings(**_SETTINGS)
@pytest.mark.slow
def test_windowed_funnel_matches_per_user_replay(spark, rows, tmp_path_factory):
    """Windowed variant: each step must land strictly after AND within
    `window` of the previous step's first occurrence — the half-open
    (t_prev, t_prev + window] bound.  window=3 minutes over a 0-5
    minute domain makes every boundary case reachable."""
    from oracdc_spark.operators.analytics import events_funnel_windowed

    sf = str(tmp_path_factory.mktemp("wfunnel"))
    # window_hours is an int, so scale the 0-5 minute offset domain to
    # hours (1 min -> 1 h) and use a 3-hour window
    data_h = [
        (i, _T0 + datetime.timedelta(hours=m), u, _TYPES[ti], 0.0, "")
        for i, (u, ti, m) in enumerate(rows)
    ]
    spark.createDataFrame(
        data_h,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    [r] = events_funnel_windowed(spark, sf, window_hours=3).collect()

    by_user = {}
    for u, ti, m in rows:
        by_user.setdefault(u, []).append((_TYPES[ti], m))
    n1 = n2 = n3 = 0
    for evs in by_user.values():
        t1 = min((m for t, m in evs if t == "signup"), default=None)
        if t1 is None:
            continue
        n1 += 1
        t2 = min(
            (m for t, m in evs if t == "click" and t1 < m <= t1 + 3),
            default=None,
        )
        if t2 is None:
            continue
        n2 += 1
        if any(t == "purchase" and t2 < m <= t2 + 3 for t, m in evs):
            n3 += 1
    assert (r.n_signup, r.n_click_24h, r.n_purchase_24h) == (n1, n2, n3)
    if n1 == 0:
        assert r.conversion_pct is None
