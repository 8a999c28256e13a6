"""Oracle 23ai VECTOR decode (P9, SURVEY §2.4).

Reference semantics: GenericDecoders.java:460-473 decodes LobLocator-
wrapped SecureFile blobs (magic 0xDB, GenericDecoders.java:121) into the
OraVector struct of four optional arrays {B, I, F, D}
(data/OraVector.java:43-73).  Format, reverse-engineered from the public
golden fixtures (VectorTest.java:55-100, FIXTURES.md §3.3):

    ... locator bytes ... | 0xDB 00 00 <flags> <elem_type>
    <count: int32 BE> <l2_norm: BINARY_DOUBLE> <elements>

* elem_type: 2 → FLOAT32, 3 → FLOAT64, 4 → INT8 (1 reserved for BOOL);
* float elements use the BINARY_FLOAT/DOUBLE on-disk encoding (MSB
  flipped for positives, all bits flipped for negatives);
* the 8-byte header value is the vector's L2 norm as BINARY_DOUBLE —
  verified against the decoded elements in tests.

The DataFrame surface normalizes every variant to ``array<double>``
(SURVEY §1.2 recommends normalizing to a single float array for the
similarity operators), with the struct variant available for parity.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType

from oracdc_spark.functions.decoders import (
    _to_bytes,
    decode_binary_double,
    decode_binary_float,
)

MAGIC = 0xDB

ELEM_FLOAT32 = 2
ELEM_FLOAT64 = 3
ELEM_INT8 = 4
ELEM_BOOL = 5


def _find_payload(b: bytes) -> int:
    for i in range(len(b) - 4):
        if b[i] == MAGIC and b[i + 1] == 0 and b[i + 2] == 0:
            return i
    raise ValueError("no VECTOR payload magic 0xDB found in locator blob")


def decode_vector(v: bytes | str | None) -> dict | None:
    """LobLocator-wrapped VECTOR blob → {'type', 'count', 'norm', 'values'}."""
    b = _to_bytes(v)
    if b is None:
        return None
    i = _find_payload(b)
    elem_type = b[i + 4]
    count = struct.unpack(">I", b[i + 5 : i + 9])[0]
    norm = decode_binary_double(b[i + 9 : i + 17])
    data = b[i + 17 :]
    if elem_type == ELEM_FLOAT32:
        vals = [decode_binary_float(data[j * 4 : j * 4 + 4]) for j in range(count)]
    elif elem_type == ELEM_FLOAT64:
        vals = [decode_binary_double(data[j * 8 : j * 8 + 8]) for j in range(count)]
    elif elem_type == ELEM_INT8:
        vals = [float(struct.unpack("b", data[j : j + 1])[0]) for j in range(count)]
    elif elem_type == ELEM_BOOL:
        # BINARY vector (KafkaConnectDecoders.java:704-709, elem type 5):
        # one bit per dimension, 8 per byte, MSB-first — Oracle requires
        # BINARY vector dimensions in multiples of 8.
        vals = [
            bool((data[j // 8] >> (7 - j % 8)) & 1) for j in range(count)
        ]
    else:
        raise ValueError(f"unsupported VECTOR element type {elem_type}")
    return {"type": elem_type, "count": count, "norm": norm, "values": vals}


def decode_vector_struct(v: bytes | str | None) -> dict | None:
    """OraVector parity form: {B, I, F, D} with exactly one non-null."""
    d = decode_vector(v)
    if d is None:
        return None
    out = {"B": None, "I": None, "F": None, "D": None}
    key = {ELEM_FLOAT32: "F", ELEM_FLOAT64: "D", ELEM_INT8: "I", ELEM_BOOL: "B"}[
        d["type"]
    ]
    out[key] = d["values"]
    return out


@pandas_udf(ArrayType(DoubleType()))
def ora_vector(col: pd.Series) -> pd.Series:
    """Vectorized decode → array<double> (normalized form feeding the
    similarity operators; BOOL dims become 0.0/1.0)."""
    return col.map(
        lambda v: None
        if v is None
        else [float(x) for x in decode_vector(v)["values"]]
    )
