"""Property: the SAX time-series index equals a scalar iSAX model.

`sax_words` chains four distributed stages (hourly PAA segment sums,
L1 normalization, sample-trained quartile breakpoints, 2-bit symbol
packing) whose interactions no fixture can sweep; a literal scalar
replay on random event streams pins: segment windows (hour div 4),
exact milli-quantized sums, floor(raw*1e6/l1) normalization with
all-zero profiles at 0, the k = max(1, (n*i) div 4) sample-rank
breakpoints (ties resolved by VALUE, so row_number nondeterminism is
immaterial), little-endian 2-bit packing, and the empty-sample
degenerate (no trained breakpoints -> no words).  sax_candidates is
then the low-prefix bucket pairing of those words.
"""

from __future__ import annotations

import pytest

import datetime
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.tsindex import sax_candidates, sax_words

_SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_T0 = datetime.datetime(2024, 1, 1)
_VALS = (0.0, 0.125, 0.25, 0.5, 1.0, -0.5)

_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # user
        st.integers(min_value=0, max_value=23),  # hour
        st.integers(min_value=0, max_value=5),   # value idx
    ),
    min_size=1,
    max_size=20,
)


def _df(spark, rows):
    data = [
        (i, _T0 + datetime.timedelta(hours=h), u, "click", _VALS[vi], "")
        for i, (u, h, vi) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def _model_words(rows, sample_mod=2, n_seg=6, seg_w=4):
    paa: dict[int, list[int]] = {}
    for u, h, vi in rows:
        paa.setdefault(u, [0] * n_seg)[h // seg_w] += int(round(_VALS[vi] * 1000))
    norm = {}
    for u, segs in paa.items():
        l1 = sum(abs(s) for s in segs)
        norm[u] = [
            math.floor(float(s) * 1_000_000 / l1) if l1 > 0 else 0 for s in segs
        ]
    # sample-trained per-segment quartile breakpoints
    bp = {}
    for seg in range(n_seg):
        vals = sorted(norm[u][seg] for u in norm if u % sample_mod == 0)
        if not vals:
            return {}  # no trained breakpoints -> no words
        n = len(vals)
        bp[seg] = [vals[max(1, (n * i) // 4) - 1] for i in (1, 2, 3)]
    words = {}
    for u, segs in norm.items():
        w = 0
        for seg, v in enumerate(segs):
            sym = sum(1 for b in bp[seg] if v >= b)
            w += sym << (2 * seg)
        words[u] = w
    return words


@given(rows=_EVENTS)
@settings(**_SETTINGS)
def test_sax_words_match_scalar_isax_model(spark, rows):
    got = {r.user_id: r.word for r in sax_words(_df(spark, rows)).collect()}
    assert got == _model_words(rows)


@given(rows=_EVENTS)
@settings(**_SETTINGS)
@pytest.mark.slow
def test_sax_candidates_match_prefix_bucket_model(spark, rows):
    prefix_segs = 2
    got = {
        (r.u1, r.u2, r.bucket)
        for r in sax_candidates(_df(spark, rows), prefix_segs=prefix_segs).collect()
    }
    words = _model_words(rows)
    mask = (1 << (2 * prefix_segs)) - 1
    ids = sorted(words)
    expect = {
        (i, j, words[i] & mask)
        for ai, i in enumerate(ids)
        for j in ids[ai + 1 :]
        if words[i] & mask == words[j] & mask
    }
    assert got == expect
