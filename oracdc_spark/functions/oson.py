"""Minimal pure-Python OSON (Oracle binary JSON) reader — P8.

The reference decodes OSON via Oracle's ``OracleJsonFactory``
(KafkaConnectSchema.java:531-537; golden fixture OsonTest.java).  Here
the common scalar/object encoding is re-derived from the public OSON
papers ("OSON: A Self-Contained Binary JSON Format", Oracle's SODA /
JSON developer docs) and validated against the reference's public test
fixture; unsupported node types raise ``ValueError`` so partial
coverage is explicit, never silent.

Layout (version 1, little-endian sizes, big-endian offsets):

    FF 4A 5A <ver> <flags:2>
    <nfields: u16 LE> <name_seg_size: u16 LE> <tree_seg_size: u24 LE>
    <hash_id: u8 × nfields>          (field-name hash codes — skipped)
    <name_off: u16 BE × nfields>     (offsets into the name segment)
    <name segment: (len u8 + utf8) × nfields>
    <tree segment>

Tree nodes (offsets relative to tree-segment start):

    0x00-0x1F  short UTF-8 string, length = node byte
    0x20-0x2F  Oracle NUMBER scalar, length = (node & 0x0F) + 1
    0x84       object: u8 member count, count × u8 field id (1-based),
               count × u16 BE value offset

The payload may be wrapped in a SecureFile LobLocator (like VECTOR);
the reader scans for the OSON magic.
"""

from __future__ import annotations

import json
import struct
from decimal import Decimal

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from oracdc_spark.functions.decoders import _to_bytes, decode_number

MAGIC = b"\xff\x4a\x5a"


def _parse_names(p: bytes) -> tuple[list[str], bytes]:
    nfields = struct.unpack("<H", p[6:8])[0]
    name_seg_size = struct.unpack("<H", p[8:10])[0]
    tree_seg_size = p[10] | (p[11] << 8) | (p[12] << 16)
    off = 13 + nfields  # skip hash ids
    off += 2 * nfields  # skip name offsets (names are len-prefixed anyway)
    names: list[str] = []
    seg = p[off : off + name_seg_size]
    j = 0
    while j < len(seg) and len(names) < nfields:
        ln = seg[j]
        names.append(seg[j + 1 : j + 1 + ln].decode("utf-8"))
        j += 1 + ln
    off += name_seg_size
    return names, p[off : off + tree_seg_size]


def _parse_node(tree: bytes, pos: int, names: list[str]):
    t = tree[pos]
    if t <= 0x1F:  # short string
        return tree[pos + 1 : pos + 1 + t].decode("utf-8")
    if 0x20 <= t <= 0x2F:  # NUMBER scalar
        ln = (t & 0x0F) + 1
        d = decode_number(tree[pos + 1 : pos + 1 + ln])
        return d
    if t == 0x84:  # object
        count = tree[pos + 1]
        ids = tree[pos + 2 : pos + 2 + count]
        obj: dict[str, object] = {}
        for k in range(count):
            voff = struct.unpack(
                ">H", tree[pos + 2 + count + 2 * k : pos + 4 + count + 2 * k]
            )[0]
            obj[names[ids[k] - 1]] = _parse_node(tree, voff, names)
        return obj
    raise ValueError(f"unsupported OSON node type 0x{t:02x} (partial reader)")


def decode_oson(v: bytes | str | None):
    """OSON image (optionally LobLocator-wrapped) → Python object."""
    b = _to_bytes(v)
    if b is None:
        return None
    i = b.find(MAGIC)
    if i < 0:
        raise ValueError("no OSON magic FF4A5A in value")
    p = b[i:]
    names, tree = _parse_names(p)
    return _parse_node(tree, 0, names)


def _render(x) -> str:
    """Compact JSON matching OracleJsonFactory's serialization (integral
    NUMBERs without a decimal point — OsonTest.java expects 20, not 20.0)."""
    if isinstance(x, Decimal):
        if x == x.to_integral_value():
            return str(int(x))
        return str(x.normalize())
    if isinstance(x, dict):
        return "{" + ",".join(f"{json.dumps(k)}:{_render(v)}" for k, v in x.items()) + "}"
    if isinstance(x, list):
        return "[" + ",".join(_render(v) for v in x) + "]"
    return json.dumps(x, ensure_ascii=False)


def oson_to_json(v: bytes | str | None) -> str | None:
    x = decode_oson(v)
    return None if x is None else _render(x)


@pandas_udf(StringType())
def ora_oson_to_json(col: pd.Series) -> pd.Series:
    """Vectorized OSON → compact JSON text (the reference's Kafka 'V'
    field form)."""
    return col.map(oson_to_json)
