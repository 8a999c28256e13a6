"""Property-based tests (hypothesis) for the Oracle byte decoders —
the reference relies on oracle.sql.* for these conversions; we prove the
encode/decode pair is a bijection over a wide value domain."""

import struct
from decimal import Decimal

from hypothesis import given, settings, strategies as st

from oracdc_spark.functions.decoders import (
    decode_binary_double,
    decode_binary_float,
    decode_interval_ds,
    decode_interval_ym,
    decode_number,
    decode_ora_date,
    encode_number,
)

decimals = st.decimals(
    min_value=Decimal("-1e30"),
    max_value=Decimal("1e30"),
    allow_nan=False,
    allow_infinity=False,
    places=10,
)


@settings(max_examples=300)
@given(decimals)
def test_number_roundtrip(d):
    assert decode_number(encode_number(d)) == d.normalize() or decode_number(
        encode_number(d)
    ) == d


@settings(max_examples=300)
@given(st.integers(min_value=-(10**37), max_value=10**37))
def test_number_roundtrip_integers(i):
    assert decode_number(encode_number(i)) == i


@settings(max_examples=200)
@given(st.floats(allow_nan=False, allow_infinity=False, width=64))
def test_binary_double_roundtrip(x):
    # encode per the on-disk rule (MSB flip for non-negative, full flip
    # for negative), decode must invert it
    raw = struct.pack(">d", x)
    if not (raw[0] & 0x80):  # IEEE sign bit clear → positive encoding
        enc = bytes([raw[0] ^ 0x80]) + raw[1:]
    else:
        enc = bytes(b ^ 0xFF for b in raw)
    got = decode_binary_double(enc)
    assert got == x or (got == 0.0 and x == 0.0)


@settings(max_examples=200)
@given(st.floats(allow_nan=False, allow_infinity=False, width=32))
def test_binary_float_roundtrip(x):
    raw = struct.pack(">f", x)
    if not (raw[0] & 0x80):
        enc = bytes([raw[0] ^ 0x80]) + raw[1:]
    else:
        enc = bytes(b ^ 0xFF for b in raw)
    got = decode_binary_float(enc)
    assert got == x or (got == 0.0 and x == 0.0)


@settings(max_examples=200)
@given(
    st.integers(min_value=1, max_value=9999),
    st.integers(min_value=1, max_value=12),
    st.integers(min_value=1, max_value=28),
    st.integers(min_value=0, max_value=23),
    st.integers(min_value=0, max_value=59),
    st.integers(min_value=0, max_value=59),
)
def test_date_roundtrip(y, mo, d, h, mi, s):
    b = bytes([y // 100 + 100, y % 100 + 100, mo, d, h + 1, mi + 1, s + 1])
    dt = decode_ora_date(b)
    assert (dt.year, dt.month, dt.day, dt.hour, dt.minute, dt.second) == (
        y, mo, d, h, mi, s,
    )


@settings(max_examples=100)
@given(st.integers(min_value=0, max_value=999), st.integers(min_value=0, max_value=11))
def test_interval_ym_positive(y, m):
    b = struct.pack(">i", y)
    raw = bytes([b[0] ^ 0x80]) + b[1:] + bytes([m + 60])
    assert decode_interval_ym(raw) == f"+{y}-{m}"


@settings(max_examples=100)
@given(
    st.integers(min_value=0, max_value=99999),
    st.integers(min_value=0, max_value=23),
    st.integers(min_value=0, max_value=59),
    st.integers(min_value=0, max_value=59),
)
def test_interval_ds_positive(d, h, m, s):
    b = struct.pack(">i", d)
    raw = bytes([b[0] ^ 0x80]) + b[1:] + bytes([h + 60, m + 60, s + 60])
    raw += bytes([0x80, 0, 0, 0])
    assert decode_interval_ds(raw) == f"+{d} {h:02d}:{m:02d}:{s:02d}.000000000"
