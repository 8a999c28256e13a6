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


# ---------------------------------------------------------------------------
# P13 inflate properties
# ---------------------------------------------------------------------------


@settings(max_examples=200)
@given(st.text(min_size=0, max_size=400))
def test_gzip_inflate_roundtrip_any_text(s):
    import gzip

    from oracdc_spark.functions.compress import _inflate_one

    assert _inflate_one(gzip.compress(s.encode("utf-8"), mtime=0)) == s.encode("utf-8")


@settings(max_examples=200)
@given(st.binary(min_size=0, max_size=400))
def test_zlib_inflate_roundtrip_any_bytes(b):
    import zlib

    from oracdc_spark.functions.compress import _inflate_one

    assert _inflate_one(zlib.compress(b)) == b


@settings(max_examples=200)
@given(st.binary(min_size=0, max_size=400))
def test_inflate_passthrough_uncompressed(b):
    """Bytes without a gzip/zlib header must pass through unchanged
    (GzipUtil.isCompressed semantics)."""
    from oracdc_spark.functions.compress import _GZIP_MAGIC, _inflate_one

    if b[:2] == _GZIP_MAGIC or (len(b) >= 2 and b[0] == 0x78 and ((b[0] << 8) | b[1]) % 31 == 0):
        return  # genuinely looks compressed — detector must try to inflate
    assert _inflate_one(b) == b


def test_inflate_zlib_header_false_positive_passthrough():
    """An UNCOMPRESSED payload starting 0x78 0x20 ("x ") passes the
    RFC1950 FCHECK (0x7820 % 31 == 0) but is not deflate data: the
    inflate attempt must fall back to pass-through instead of raising
    and failing the job."""
    from oracdc_spark.functions.compress import _inflate_one

    payload = b"x is not compressed data at all"
    assert (payload[0] << 8 | payload[1]) % 31 == 0  # the trap case
    assert _inflate_one(payload) == payload


# ---------------------------------------------------------------------------
# SQ8 quantization properties (pure-python mirror of the column exprs)
# ---------------------------------------------------------------------------


@settings(max_examples=200)
@given(st.lists(st.floats(min_value=-100, max_value=100, allow_nan=False), min_size=2, max_size=16))
def test_sq8_code_bounds_and_error(xs):
    """Codes stay in [0,255]; per-dim reconstruction error is bounded by
    half a quantization step."""
    mn, mx = min(xs), max(xs)
    for x in xs:
        c = round((x - mn) * 255 / (mx - mn)) if mx > mn else 0
        assert 0 <= c <= 255
        dec = mn + c * (mx - mn) / 255 if mx > mn else mn
        step = (mx - mn) / 255 if mx > mn else 0.0
        assert abs(dec - x) <= step / 2 + 1e-9


# ---------------------------------------------------------------------------
# ROWID: the JVM-side instr/substring decode inverts the Python encoder
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck  # noqa: E402

_ROWID_FIELDS = st.tuples(
    st.integers(min_value=0, max_value=(1 << 36) - 1),  # data_object_id
    st.integers(min_value=0, max_value=(1 << 18) - 1),  # file_no
    st.integers(min_value=0, max_value=(1 << 36) - 1),  # block_no
    st.integers(min_value=0, max_value=(1 << 18) - 1),  # row_no
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_ROWID_FIELDS, min_size=1, max_size=40))
def test_rowid_components_invert_encoder(spark, rows):
    """rowid_components (pure column arithmetic — the orderable /
    partitionable key form of a2.use.rowid.as.key) recovers exactly the
    fields rowid_encode_py packed, over the full 6/3/6/3-digit domain."""
    import pyspark.sql.functions as F

    from oracdc_spark.functions.decoders import rowid_components, rowid_encode_py

    df = spark.createDataFrame(
        [(i, rowid_encode_py(*t)) for i, t in enumerate(rows)], "i long, rid string"
    )
    got = {
        r.i: (r.data_object_id, r.file_no, r.block_no, r.row_no)
        for r in df.select("i", *rowid_components(F.col("rid"))).collect()
    }
    assert got == {i: t for i, t in enumerate(rows)}
