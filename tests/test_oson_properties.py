"""Property: the OSON reader inverts an independent encoder of its
documented subset.

`decode_oson` (P8) has until now been pinned only by the reference's
fixed fixture (OsonTest.java) — one object shape, one set of scalars.
This file builds OSON images FROM SCRATCH off the same public layout
the reader documents (v1 header, hash/offset segments, len-prefixed
name segment, 0x84 objects with 1-based field ids and u16 BE value
offsets, <=31-byte short strings, NUMBER scalars via the
golden-vector-tested encode_number) and requires decode(encode(x)) ==
x for arbitrary nested objects — including shared field names across
sibling objects (one name-segment entry, many references), empty
objects, and the LobLocator-style junk prefix the magic scan must
skip.
"""

from __future__ import annotations

import struct
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from oracdc_spark.functions.decoders import encode_number
from oracdc_spark.functions.oson import decode_oson

_SETTINGS = dict(max_examples=80, deadline=None)

_NAMES = ["a", "b", "name", "x1", "long_field_name"]
_STR = st.text(
    alphabet="abc XYZ0é",  # incl. a 2-byte UTF-8 char
    min_size=0,
    max_size=12,
)
_NUM = st.sampled_from(
    [Decimal(0), Decimal(20), Decimal(-3), Decimal("1.5"), Decimal("-0.07"), Decimal("123456789")]
)
_SCALAR = st.one_of(_STR, _NUM)
_VALUE = st.recursive(
    _SCALAR,
    lambda children: st.dictionaries(
        st.sampled_from(_NAMES), children, min_size=0, max_size=4
    ),
    max_leaves=8,
)
_DOC = st.dictionaries(st.sampled_from(_NAMES), _VALUE, min_size=0, max_size=4)


def _encode(doc) -> bytes:
    names: list[str] = []

    def collect(x):
        if isinstance(x, dict):
            for k, v in x.items():
                if k not in names:
                    names.append(k)
                collect(v)

    collect(doc)

    tree = bytearray()

    def emit(x) -> int:
        pos = len(tree)
        if isinstance(x, str):
            b = x.encode("utf-8")
            assert len(b) <= 0x1F
            tree.append(len(b))
            tree.extend(b)
        elif isinstance(x, Decimal):
            nb = encode_number(x)
            assert 1 <= len(nb) <= 16
            tree.append(0x20 | (len(nb) - 1))
            tree.extend(nb)
        elif isinstance(x, dict):
            count = len(x)
            tree.append(0x84)
            tree.append(count)
            for k in x:
                tree.append(names.index(k) + 1)
            off_at = len(tree)
            tree.extend(b"\x00\x00" * count)
            for j, v in enumerate(x.values()):
                voff = emit(v)
                tree[off_at + 2 * j : off_at + 2 * j + 2] = struct.pack(">H", voff)
        else:  # pragma: no cover
            raise TypeError(type(x))
        return pos

    emit(doc)
    name_seg = b"".join(
        bytes([len(n.encode("utf-8"))]) + n.encode("utf-8") for n in names
    )
    hdr = (
        b"\xff\x4a\x5a\x01\x00\x00"
        + struct.pack("<H", len(names))
        + struct.pack("<H", len(name_seg))
        + bytes(
            [len(tree) & 0xFF, (len(tree) >> 8) & 0xFF, (len(tree) >> 16) & 0xFF]
        )
        + b"\x00" * len(names)          # hash ids (reader skips)
        + b"\x00\x00" * len(names)      # name offsets (reader skips)
        + name_seg
    )
    return hdr + bytes(tree)


@given(doc=_DOC, junk=st.binary(min_size=0, max_size=6))
@settings(**_SETTINGS)
def test_decode_inverts_independent_encoder(doc, junk):
    payload = _encode(doc)
    if b"\xff\x4a\x5a" in junk:
        junk = b""  # the scan keys on the first magic occurrence
    got = decode_oson(junk + payload)
    assert got == doc
