"""Property: the directional as-of join equals a merge_asof replay.

`asof_join_directional` compresses pandas merge_asof's full knob set
(backward / forward / nearest, tolerance) into one exchange via two
running-max marks — exactly the rewrite where tie rules can drift:
equal-timestamp right rows must win by LARGEST key in both directions
(the sortable-mark max), nearest must tie to backward, and the
tolerance must cut with <= on the micros gap while preserving the left
row (left-outer NULLs).  A literal scalar replay over random colliding
streams pins all four knobs at once.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.asof import asof_join_directional

_SETTINGS = dict(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_T0 = datetime.datetime(2024, 1, 1)

# tiny domains: keys 0-2, seconds 0-5 force equal-ts collisions on
# both sides and cross-side exact-match timestamps
_LEFT = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 5)), min_size=1, max_size=10
)
_RIGHT = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 5)), min_size=0, max_size=10
)


def _model(lefts, rights, direction, tol):
    out = {}
    for eid, (k, t) in enumerate(lefts):
        tm = t * 1_000_000
        b = max(
            (
                (rt * 1_000_000, 100 + rid)
                for rid, (rk, rt) in enumerate(rights)
                if rk == k and rt <= t
            ),
            default=None,
        )
        f_c = [
            (rt * 1_000_000, 100 + rid)
            for rid, (rk, rt) in enumerate(rights)
            if rk == k and rt >= t
        ]
        f = max(((-ts, key) for ts, key in f_c), default=None)
        f = (-f[0], f[1]) if f else None
        vb = b is not None and (tol is None or tm - b[0] <= tol)
        vf = f is not None and (tol is None or f[0] - tm <= tol)
        if direction == "backward":
            out[eid] = b if vb else (None, None)
        elif direction == "forward":
            out[eid] = f if vf else (None, None)
        else:
            if vb and (not vf or tm - b[0] <= f[0] - tm):
                out[eid] = b
            elif vf:
                out[eid] = f
            else:
                out[eid] = (None, None)
    return out


@given(
    lefts=_LEFT,
    rights=_RIGHT,
    direction=st.sampled_from(["backward", "forward", "nearest"]),
    tol=st.sampled_from([None, 0, 2_000_000]),
)
# Directed boundary examples (r12 mutation audit: tightening the
# tolerance cut from <= to < SURVIVED the 4 random examples — a match
# at EXACTLY the tolerance gap in the deciding position is a rare
# draw).  In order: backward gap exactly tol (2 s); forward gap exactly
# tol; gap 0 with tol 0 (exact-ts match must survive a zero tolerance);
# nearest with equal gaps both sides (must tie to backward, key 100).
@example(lefts=[(0, 2)], rights=[(0, 0)], direction="backward", tol=2_000_000)
@example(lefts=[(0, 0)], rights=[(0, 2)], direction="forward", tol=2_000_000)
@example(lefts=[(0, 3)], rights=[(0, 3)], direction="backward", tol=0)
@example(lefts=[(0, 2)], rights=[(0, 1), (0, 3)], direction="nearest", tol=None)
@settings(**_SETTINGS)
def test_directional_asof_matches_merge_asof_replay(
    spark, lefts, rights, direction, tol
):
    left = spark.createDataFrame(
        [
            (i, k, _T0 + datetime.timedelta(seconds=t))
            for i, (k, t) in enumerate(lefts)
        ],
        "event_id bigint, k bigint, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (100 + j, k, _T0 + datetime.timedelta(seconds=t))
            for j, (k, t) in enumerate(rights)
        ],
        "rid bigint, k bigint, rts timestamp",
    )
    got = {
        r.event_id: (r.asof_rts_micros, r.asof_rid)
        for r in asof_join_directional(
            left,
            right,
            on="k",
            left_ts="ts",
            right_ts="rts",
            right_key="rid",
            direction=direction,
            tolerance_micros=tol,
        ).collect()
    }
    base = int(_T0.replace(tzinfo=datetime.timezone.utc).timestamp()) * 1_000_000
    expect = {
        eid: ((ts + base, key) if ts is not None else (None, None))
        for eid, (ts, key) in _model(lefts, rights, direction, tol).items()
    }
    assert got == expect
