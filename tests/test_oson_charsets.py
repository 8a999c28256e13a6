"""P6 charset-id mapping + P8 binary OSON reader (round-1 verdict
missing items 2 and 3)."""

import pytest

from oracdc_spark.functions.charsets import (
    decode_with_charset_id,
    ora_charset_to_codec,
)
from oracdc_spark.functions.oson import decode_oson, oson_to_json

# the reference's public OSON fixture (OsonTest.java:56-58)
OSON_HEX = (
    "00700001010c00800001000000010000"
    "0008a48700414890003b000037"
    "01ff4a5a01210602000f0015000091d8"
    "00000006056672756974087175616e74"
    "69747984020102000800120970696e65"
    "6170706c6521c115"
)


class TestCharsetIds:
    def test_id_resolution(self):
        assert ora_charset_to_codec(873) == "utf-8"
        assert ora_charset_to_codec(178) == "cp1252"
        assert ora_charset_to_codec(2000) == "utf-16-be"

    def test_name_resolution(self):
        assert ora_charset_to_codec("AL32UTF8") == "utf-8"
        assert ora_charset_to_codec("ja16sjis") == "shift_jis"

    def test_unknown_id_raises(self):
        with pytest.raises(ValueError):
            ora_charset_to_codec(99999)
        with pytest.raises(ValueError):
            ora_charset_to_codec("NOT_A_CHARSET")

    @pytest.mark.parametrize(
        "cs_id,hx,expected",
        [
            (178, "636166e9", "café"),
            (171, "c4e0", "Да"),
            (832, "93fa967b", "日本"),
            (873, "7468616e6b73", "thanks"),
            (2000, "007400680061006e006b0073", "thanks"),
        ],
    )
    def test_decode_goldens(self, cs_id, hx, expected):
        assert decode_with_charset_id(hx, cs_id) == expected


class TestOson:
    def test_reference_golden(self):
        # exact string the reference asserts (OsonTest.java:71)
        assert oson_to_json(OSON_HEX) == '{"fruit":"pineapple","quantity":20}'

    def test_object_structure(self):
        from decimal import Decimal

        obj = decode_oson(OSON_HEX)
        assert obj == {"fruit": "pineapple", "quantity": Decimal(20)}

    def test_no_magic_raises(self):
        with pytest.raises(ValueError):
            decode_oson("00010203")

    def test_unsupported_node_raises(self):
        # header for 0 fields with an unknown tree node type 0x7F... is a
        # >0x1F string; use 0xC0 (unknown family) instead
        import struct

        p = (
            b"\xff\x4a\x5a\x01\x00\x00"
            + struct.pack("<H", 0)
            + struct.pack("<H", 0)
            + b"\x01\x00\x00"  # tree seg size 1
            + b"\xc0"
        )
        with pytest.raises(ValueError, match="unsupported OSON node"):
            decode_oson(p)

    def test_none_passthrough(self):
        assert decode_oson(None) is None
        assert oson_to_json(None) is None
