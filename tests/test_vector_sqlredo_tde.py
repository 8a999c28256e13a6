"""P9 VECTOR golden vectors, P1 SQL_REDO parsing, P10 TDE compose."""

import math

import pyspark.sql.functions as F
import pytest

from oracdc_spark.functions.sql_redo import parse_sql_redo
from oracdc_spark.functions.vector import decode_vector, decode_vector_struct

# golden fixtures from VectorTest.java:55-100 (hex data constants)
F64_HEX = (
    "00 70 00 01 01 0c 00 80 00 01 00 00 00 01 00 00 00 21 24 b0 00 5b 48 90 00 55 "
    "00 00 51 01 db 00 00 12 03 00 00 00 08 c0 1d 8f d3 14 33 d1 4e c0 00 cc cc cc cc "
    "cc cd c0 06 66 66 66 66 66 66 bf 50 62 4d d2 f1 a9 fc bf 60 62 4d d2 f1 a9 fc c0 "
    "0c 00 00 00 00 00 00 c0 10 7a e1 47 ae 14 7a c0 0c f5 c2 8f 5c 28 f6 bf c9 99 99 "
    "99 99 99 9a"
).replace(" ", "")
F32_HEX = (
    "00 70 00 01 01 0c 00 80 00 01 00 00 00 01 00 00 00 21 24 ad 00 37 48 90 00 31 "
    "00 00 2d 01 db 00 00 12 02 00 00 00 07 c0 1d 8d 0d 89 58 b5 f2 c0 06 66 66 c0 33 "
    "33 33 ba 83 12 6f bb 03 12 6f c0 60 00 00 c0 83 d7 0a c0 67 ae 14"
).replace(" ", "")
I8_HEX = (
    "00 70 00 01 01 0c 00 80 00 01 00 00 00 01 00 00 00 21 24 95 00 20 48 90 00 1a "
    "00 00 16 01 db 00 00 12 04 00 00 00 05 c0 52 8a 5d f5 ca cd 27 0a 14 1e 28 32"
).replace(" ", "")


class TestVector:
    def test_float32_seven_elements(self):
        d = decode_vector(F32_HEX)
        assert d["count"] == 7 and len(d["values"]) == 7
        # L2 norm header must match the decoded elements
        norm = math.sqrt(sum(v * v for v in d["values"]))
        assert abs(norm - d["norm"]) < 1e-5
        assert abs(d["values"][0] - 2.1) < 1e-6

    def test_float64_eight_elements(self):
        d = decode_vector(F64_HEX)
        assert d["count"] == 8 and len(d["values"]) == 8
        norm = math.sqrt(sum(v * v for v in d["values"]))
        assert abs(norm - d["norm"]) < 1e-12

    def test_int8_five_elements(self):
        d = decode_vector(I8_HEX)
        assert d["values"] == [10.0, 20.0, 30.0, 40.0, 50.0]
        assert abs(d["norm"] - math.sqrt(5500)) < 1e-9

    def test_struct_form_one_field_set(self):
        s = decode_vector_struct(F32_HEX)
        assert s["F"] is not None and s["D"] is None and s["I"] is None and s["B"] is None
        s64 = decode_vector_struct(F64_HEX)
        assert s64["D"] is not None and s64["F"] is None


class TestSqlRedo:
    def test_insert(self):
        r = parse_sql_redo(
            """insert into "SCOTT"."DEPT"("DEPTNO","DNAME","RAW_COL") """
            """values ('10','SALES',HEXTORAW('c10b'))"""
        )
        assert r["op"] == 1 and r["owner"] == "SCOTT" and r["table"] == "DEPT"
        assert r["after"] == {"DEPTNO": "10", "DNAME": "SALES", "RAW_COL": "c10b"}

    def test_update_with_null_and_quote(self):
        r = parse_sql_redo(
            """update "SCOTT"."DEPT" set "DNAME" = 'O''BRIEN', "LOC" = NULL """
            """where "DEPTNO" = '10' and "LOC" IS NULL"""
        )
        assert r["op"] == 3
        assert r["after"] == {"DNAME": "O'BRIEN", "LOC": None}
        assert r["before"] == {"DEPTNO": "10", "LOC": None}

    def test_delete(self):
        r = parse_sql_redo(
            """delete from "SCOTT"."DEPT" where "DEPTNO" = '10' and "DNAME" = 'SALES';"""
        )
        assert r["op"] == 2 and r["before"]["DEPTNO"] == "10"

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            parse_sql_redo("merge into t using s on (1=1)")


class TestTde:
    def test_roundtrip_then_decode(self, spark):
        from oracdc_spark.functions.decoders import encode_number
        from oracdc_spark.functions.tde import tde_decrypt, tde_encrypt

        key = "0123456789abcdef"  # 16-byte AES key
        num = encode_number("1234.56")
        df = spark.createDataFrame([(num,)], "payload binary").coalesce(1)
        enc = df.select(tde_encrypt("payload", key).alias("enc"))
        dec = enc.select(tde_decrypt("enc", key).alias("dec"))
        got = dec.first().dec
        assert bytes(got) == num
        # compose with the type decoder (the reference's decrypt→decode chain)
        from oracdc_spark.functions.decoders import ora_number_to_double

        out = dec.select(ora_number_to_double(F.hex("dec")).alias("v")).first()
        assert out.v == 1234.56


class TestVectorBool:
    """BINARY vector (element type 5, KafkaConnectDecoders.java:704-709):
    bit-packed dims, 8 per byte, MSB-first."""

    @staticmethod
    def _payload(bits):
        import struct as _struct

        from oracdc_spark.functions.vector import ELEM_BOOL, MAGIC

        count = len(bits)
        packed = bytearray((count + 7) // 8)
        for j, b in enumerate(bits):
            if b:
                packed[j // 8] |= 1 << (7 - j % 8)
        # L2 norm of a binary vector = sqrt(popcount), as BINARY_DOUBLE
        norm = sum(bits) ** 0.5
        raw = _struct.pack(">d", norm)
        norm_enc = bytes([raw[0] ^ 0x80]) + raw[1:]  # positive: flip MSB
        return (
            bytes([MAGIC, 0, 0, 0, ELEM_BOOL])
            + _struct.pack(">I", count)
            + norm_enc
            + bytes(packed)
        ).hex()

    def test_bool_roundtrip(self):
        bits = [True, False, True, True, False, False, True, False,
                True, True, False, False, True, False, False, True]
        d = decode_vector(self._payload(bits))
        assert d["count"] == 16
        assert d["values"] == bits
        assert abs(d["norm"] - sum(bits) ** 0.5) < 1e-12

    def test_struct_form_sets_B(self):
        s = decode_vector_struct(self._payload([True] * 8))
        assert s["B"] == [True] * 8
        assert s["F"] is None and s["D"] is None and s["I"] is None


class TestTdeColumnLayout:
    """Oracle TDE column image layout (ct || salt-IV || MAC) round-trips
    through the JVM-side restructure decrypt
    (OraCdcTdeColumnDecrypter.java:157-196)."""

    KEY = bytes(range(16))  # AES128 data key

    def test_salted_sha1_roundtrip(self, spark):
        from oracdc_spark.functions.tde import (
            MAC_SHA1,
            tde_decrypt_column,
            tde_encrypt_column,
        )

        df = spark.createDataFrame(
            [(1, b"c1024a153351"), (2, b"hello TDE world")], "id int, v binary"
        )
        enc = df.select("id", tde_encrypt_column("v", self.KEY, MAC_SHA1).alias("e"))
        out = enc.select(
            "id", tde_decrypt_column("e", self.KEY, salt=True, int_alg=MAC_SHA1).alias("p")
        ).collect()
        assert {r.id: bytes(r.p) for r in out} == {
            1: b"c1024a153351", 2: b"hello TDE world"
        }

    def test_salted_nomac_roundtrip(self, spark):
        from oracdc_spark.functions.tde import (
            MAC_NOMAC,
            tde_decrypt_column,
            tde_encrypt_column,
        )

        df = spark.createDataFrame([(1, b"\x00\x01\x02\x03binary")], "id int, v binary")
        enc = df.select("id", tde_encrypt_column("v", self.KEY, MAC_NOMAC).alias("e"))
        out = enc.select(
            "id",
            tde_decrypt_column("e", self.KEY, salt=True, int_alg=MAC_NOMAC).alias("p"),
        ).collect()
        assert bytes(out[0].p) == b"\x00\x01\x02\x03binary"

    def test_wallet_blob_key_extraction(self):
        from oracdc_spark.functions.tde import data_key_from_wallet_blob

        blob = bytes(16) + bytes(range(32)) + b"tail"
        assert data_key_from_wallet_blob(blob, 16) == bytes(range(16))
        assert data_key_from_wallet_blob(blob, 32) == bytes(range(32))
