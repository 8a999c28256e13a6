"""Oracle charset-id / charset-name → Python codec mapping (P6).

A real LogMiner dictionary hands the decoder Oracle charset IDs
(``NLS_CHARSET_ID``) or names, not IANA codec names (reference:
RdbmsCharsetMapping.java, used by GenericDecoders.java:834-861).  This
module re-derives the mapping from the public NLS registry
(``V$NLS_VALID_VALUES`` / Oracle globalization docs), restricted to
charsets Python's codec registry actually supports; unsupported ids
raise ``ValueError`` like the reference's
``IllegalArgumentException`` (RdbmsCharsetMapping.java:44-49).

ID values are the documented ``NLS_CHARSET_ID()`` constants for the
charsets in common deployment; the name table is the lookup the
dictionary path uses when it has ``NLS_CHARACTERSET`` text instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

# Oracle charset name → Python codec (common deployment subset)
ORA_CHARSET_NAME_TO_CODEC: dict[str, str] = {
    "US7ASCII": "ascii",
    "WE8DEC": "latin-1",  # closest superset available in Python
    "WE8ISO8859P1": "iso8859-1",
    "EE8ISO8859P2": "iso8859-2",
    "SE8ISO8859P3": "iso8859-3",
    "NEE8ISO8859P4": "iso8859-4",
    "CL8ISO8859P5": "iso8859-5",
    "AR8ISO8859P6": "iso8859-6",
    "EL8ISO8859P7": "iso8859-7",
    "IW8ISO8859P8": "iso8859-8",
    "WE8ISO8859P9": "iso8859-9",
    "NE8ISO8859P10": "iso8859-10",
    "TH8TISASCII": "tis-620",
    "WE8ISO8859P15": "iso8859-15",
    "BLT8ISO8859P13": "iso8859-13",
    "EE8MSWIN1250": "cp1250",
    "CL8MSWIN1251": "cp1251",
    "EL8MSWIN1253": "cp1253",
    "IW8MSWIN1255": "cp1255",
    "TR8MSWIN1254": "cp1254",
    "WE8MSWIN1252": "cp1252",
    "BLT8MSWIN1257": "cp1257",
    "AR8MSWIN1256": "cp1256",
    "VN8MSWIN1258": "cp1258",
    "TH8MSWIN874": "cp874",
    "JA16SJIS": "shift_jis",
    "JA16SJISTILDE": "shift_jis",
    "JA16EUC": "euc_jp",
    "JA16EUCTILDE": "euc_jp",
    "KO16KSC5601": "euc_kr",
    "KO16MSWIN949": "cp949",
    "ZHS16CGB231280": "gb2312",
    "ZHS16GBK": "gbk",
    "ZHS32GB18030": "gb18030",
    "ZHT16BIG5": "big5",
    "ZHT16MSWIN950": "cp950",
    "ZHT16HKSCS": "big5hkscs",
    "UTF8": "utf-8",  # CESU-8 strictly; BMP-only data is identical
    "AL24UTFFSS": "utf-8",
    "AL32UTF8": "utf-8",
    "AL16UTF16": "utf-16-be",
    "AL16UTF16LE": "utf-16-le",
}

# Documented NLS_CHARSET_ID values for the same subset
ORA_CHARSET_ID_TO_NAME: dict[int, str] = {
    1: "US7ASCII",
    2: "WE8DEC",
    31: "WE8ISO8859P1",
    32: "EE8ISO8859P2",
    33: "SE8ISO8859P3",
    34: "NEE8ISO8859P4",
    35: "CL8ISO8859P5",
    36: "AR8ISO8859P6",
    37: "EL8ISO8859P7",
    38: "IW8ISO8859P8",
    39: "WE8ISO8859P9",
    40: "NE8ISO8859P10",
    41: "TH8TISASCII",
    46: "WE8ISO8859P15",
    47: "BLT8ISO8859P13",
    170: "EE8MSWIN1250",
    171: "CL8MSWIN1251",
    174: "EL8MSWIN1253",
    175: "IW8MSWIN1255",
    177: "TR8MSWIN1254",
    178: "WE8MSWIN1252",
    179: "BLT8MSWIN1257",
    560: "AR8MSWIN1256",
    45: "VN8MSWIN1258",
    832: "JA16SJIS",
    837: "JA16SJISTILDE",
    830: "JA16EUC",
    838: "JA16EUCTILDE",
    840: "KO16KSC5601",
    846: "KO16MSWIN949",
    850: "ZHS16CGB231280",
    852: "ZHS16GBK",
    854: "ZHS32GB18030",
    865: "ZHT16BIG5",
    867: "ZHT16MSWIN950",
    868: "ZHT16HKSCS",
    871: "UTF8",
    873: "AL32UTF8",
    2000: "AL16UTF16",
    2002: "AL16UTF16LE",
}


def ora_charset_to_codec(charset: int | str) -> str:
    """Oracle charset id or name → Python codec name; raises ValueError
    for unknown/unsupported charsets (reference treatment)."""
    if isinstance(charset, int):
        name = ORA_CHARSET_ID_TO_NAME.get(charset)
        if name is None:
            raise ValueError(f"invalid or unsupported Oracle charset id: {charset}")
    else:
        name = charset.strip().upper()
    codec = ORA_CHARSET_NAME_TO_CODEC.get(name)
    if codec is None:
        raise ValueError(f"invalid or unsupported Oracle character set: {name}")
    return codec


def decode_with_charset_id(v: bytes | str | None, charset: int | str) -> str | None:
    from oracdc_spark.functions.decoders import _to_bytes

    b = _to_bytes(v)
    if b is None:
        return None
    return b.decode(ora_charset_to_codec(charset))


@pandas_udf(StringType())
def ora_decode_by_charset_id(col: pd.Series, ids: pd.Series) -> pd.Series:
    """Two-column form: decode each value with its row's Oracle charset
    id — the dictionary path, where charset varies per column/table."""
    return pd.Series(
        [
            None if v is None else bytes(v).decode(ora_charset_to_codec(int(i)))
            for v, i in zip(col, ids)
        ]
    )


def ora_charset_id_decode(charset: int | str):
    """Pandas-UDF factory: decode a binary column using an Oracle charset
    id (dictionary path) or charset name."""
    codec = ora_charset_to_codec(charset)  # resolve once, driver-side

    @pandas_udf(StringType())
    def _udf(col: pd.Series) -> pd.Series:
        return col.map(lambda v: None if v is None else bytes(v).decode(codec))

    return _udf
