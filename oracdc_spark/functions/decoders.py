"""Oracle on-disk byte-format decoders, Spark-first.

These reproduce the *semantics* of the reference's decoder layer
(GenericDecoders.java:51-61,210-393; golden vectors in
OraDumpDecoderTest.java:52-120) from the publicly documented Oracle
formats (DUMP() output, Oracle docs on NUMBER/DATE internal formats):

* NUMBER: 1 exponent byte + up to 20 base-100 mantissa digits.
  positive: exp = b0-193, digit bytes are d+1;
  negative: exp = 62-b0, digit bytes are 101-d, trailing 0x66 terminator
  when shorter than 21 bytes; 0x80 is zero.
* BINARY_FLOAT / BINARY_DOUBLE: IEEE754 big-endian with the sign-bit
  flipped for positives and all bits flipped for negatives (so byte
  ordering sorts numerically).
* DATE (7 bytes): century+100, year+100, month, day, hour+1, min+1, sec+1.
  TIMESTAMP (11 bytes): + big-endian nanoseconds.
* INTERVAL YEAR TO MONTH (5 bytes): be32(years)+0x80000000, month+60.
  INTERVAL DAY TO SECOND (11 bytes): be32(days)+0x80000000, h/m/s+60,
  be32(nanos)+0x80000000.
* CHAR/VARCHAR2: bytes in the database charset → str.

The scalar decode functions (`decode_*`) are plain Python (unit-testable
against golden vectors); the `ora_*` wrappers are Arrow-vectorized pandas
UDFs for the DataFrame layer.  UDFs are the slow path by design — they
only ever run on the change-feed decode hop, never in analytic queries.
"""

from __future__ import annotations

import datetime as _dt
import struct
from decimal import Decimal, localcontext

# Oracle NUMBER carries up to 40 significant decimal digits (20 base-100
# mantissa bytes); the default Decimal context (prec=28) would silently
# round — every conversion runs under this context.
_PREC = 60

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    DecimalType,
    DoubleType,
    FloatType,
    LongType,
    StringType,
    TimestampNTZType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# scalar decoders (pure Python, golden-tested)
# ---------------------------------------------------------------------------


def _to_bytes(v: bytes | str | None) -> bytes | None:
    if v is None:
        return None
    if isinstance(v, str):
        return bytes.fromhex(v)
    return bytes(v)


def decode_number(v: bytes | str | None) -> Decimal | None:
    """Oracle NUMBER bytes → exact Decimal.

    Special values (oracle.sql.NUMBER public encoding): ``FF 65`` is
    +Infinity and a single ``00`` byte is -Infinity — returned as signed
    ``Decimal('Infinity')`` here; the typed UDF wrappers map them to NULL
    (the reference sink's treatment of unrepresentable float infinities,
    Column.java:95-116) instead of letting them decode as huge finite
    numbers."""
    b = _to_bytes(v)
    if b is None or len(b) == 0:
        return None
    if b == b"\xff\x65":
        return Decimal("Infinity")
    if b == b"\x00":
        return Decimal("-Infinity")
    b0 = b[0]
    if b0 == 0x80:
        return Decimal(0)
    if b0 & 0x80:  # positive
        exp = b0 - 193
        digits = [x - 1 for x in b[1:]]
        sign = 1
    else:  # negative
        exp = 62 - b0
        digits = [101 - x for x in b[1:]]
        if digits and digits[-1] == -1:  # trailing 0x66 terminator (101-102)
            digits = digits[:-1]
        sign = -1
    with localcontext() as ctx:
        ctx.prec = _PREC
        val = Decimal(0)
        scale = Decimal(100) ** exp
        for d in digits:
            val += Decimal(d) * scale
            scale /= 100
        return sign * val


def encode_number(x: Decimal | int | float | str | None) -> bytes | None:
    """Inverse of :func:`decode_number` — used to build test fixtures and
    round-trip checks (the reference relies on oracle.sql.NUMBER for this)."""
    if x is None:
        return None
    with localcontext() as ctx:
        ctx.prec = _PREC
        d = Decimal(str(x))
        if d == 0:
            return b"\x80"
        sign = 1 if d > 0 else -1
        d = abs(d)
        # normalize to base-100 digits: d = d1.d2 d3 ... * 100^exp
        exp = 0
        while d >= 100:
            d /= 100
            exp += 1
        while d < 1:
            d *= 100
            exp -= 1
        digits: list[int] = []
        for _ in range(20):
            intpart = int(d)
            digits.append(intpart)
            d = (d - intpart) * 100
            if d == 0:
                break
        while digits and digits[-1] == 0:
            digits.pop()
    if sign > 0:
        return bytes([193 + exp] + [x + 1 for x in digits])
    out = bytes([62 - exp] + [101 - x for x in digits])
    if len(out) < 21:
        out += b"\x66"
    return out


def decode_binary_float(v: bytes | str | None) -> float | None:
    b = _to_bytes(v)
    if b is None or len(b) != 4:
        return None
    if b[0] & 0x80:
        b = bytes([b[0] ^ 0x80]) + b[1:]
    else:
        b = bytes(x ^ 0xFF for x in b)
    return struct.unpack(">f", b)[0]


def decode_binary_double(v: bytes | str | None) -> float | None:
    b = _to_bytes(v)
    if b is None or len(b) != 8:
        return None
    if b[0] & 0x80:
        b = bytes([b[0] ^ 0x80]) + b[1:]
    else:
        b = bytes(x ^ 0xFF for x in b)
    return struct.unpack(">d", b)[0]


def decode_ora_date(v: bytes | str | None) -> _dt.datetime | None:
    """7-byte Oracle DATE → naive datetime (zone-less, SURVEY §1.2)."""
    b = _to_bytes(v)
    if b is None or len(b) < 7:
        return None
    year = (b[0] - 100) * 100 + (b[1] - 100)
    return _dt.datetime(year, b[2], b[3], b[4] - 1, b[5] - 1, b[6] - 1)


def decode_ora_timestamp(v: bytes | str | None) -> _dt.datetime | None:
    """11-byte Oracle TIMESTAMP (7-byte date + BE nanos) → naive datetime
    with microsecond precision (Python datetime cap)."""
    b = _to_bytes(v)
    if b is None or len(b) < 7:
        return None
    base = decode_ora_date(b[:7])
    if base is None or len(b) < 11:
        return base
    nanos = struct.unpack(">I", b[7:11])[0]
    return base.replace(microsecond=nanos // 1000)


def decode_ora_tstz(v: bytes | str | None) -> _dt.datetime | None:
    """13-byte TIMESTAMP WITH TIME ZONE → aware UTC datetime (the
    instant).

    Public oracle.sql.TIMESTAMPTZ layout (OraTimestamp.java:67-94 via
    TimestampWithTimeZone.toZonedDateTime; Oracle DUMP() docs): bytes
    0-6 are the date/time **in UTC** (century+100, year+100, month, day,
    hour+1, min+1, sec+1), bytes 7-10 big-endian nanoseconds, bytes
    11-12 the zone: offset form (bit7 of byte 11 clear) encodes
    hours+20 / minutes+60; region form (bit7 set) carries an Oracle
    timezone-region id.  The instant is byte-identical either way; the
    zone only affects display — see :func:`decode_ora_tstz_str`.
    """
    b = _to_bytes(v)
    if b is None or len(b) < 13:
        return None
    year = (b[0] - 100) * 100 + (b[1] - 100)
    nanos = struct.unpack(">I", b[7:11])[0]
    return _dt.datetime(
        year, b[2], b[3], b[4] - 1, b[5] - 1, b[6] - 1,
        microsecond=nanos // 1000, tzinfo=_dt.timezone.utc,
    )


def _tstz_offset(b: bytes) -> _dt.timedelta | None:
    """Zone bytes → fixed offset; None for region-id form (resolving a
    region id needs Oracle's timezone file — instant stays correct,
    display falls back to UTC)."""
    if b[11] & 0x80:
        return None
    return _dt.timedelta(hours=b[11] - 20, minutes=b[12] - 60)


def decode_ora_tstz_str(v: bytes | str | None) -> str | None:
    """TSTZ → ISO-8601 string with the original offset — the reference's
    Kafka representation (OraTimestamp.fromLogical returns an ISO_8601
    string, KafkaConnectSchema.java:409-435)."""
    utc = decode_ora_tstz(v)
    if utc is None:
        return None
    off = _tstz_offset(_to_bytes(v))
    if off is None:
        return utc.isoformat()
    return utc.astimezone(_dt.timezone(off)).isoformat()


def decode_ora_tsltz(
    v: bytes | str | None, db_zone: str = "UTC"
) -> _dt.datetime | None:
    """7/11-byte TIMESTAMP WITH LOCAL TIME ZONE → aware UTC datetime.

    TSLTZ stores a plain timestamp normalized to the *database* time
    zone (OraTimestamp.java:76-83: OracleTimestamp.toZonedDateTime with
    dbTimeZone); decoding = interpret the wall-clock bytes in that zone
    and convert to the UTC instant."""
    naive = decode_ora_timestamp(v)
    if naive is None:
        return None
    import zoneinfo

    tz = zoneinfo.ZoneInfo(db_zone)
    return naive.replace(tzinfo=tz).astimezone(_dt.timezone.utc)


def decode_interval_ym(v: bytes | str | None) -> str | None:
    """INTERVALYM bytes → canonical '+YY-MM' string
    (reference: data/OraIntervalYM.java, GenericDecoders.java:386-393)."""
    b = _to_bytes(v)
    if b is None or len(b) != 5:
        return None
    years = struct.unpack(">i", bytes([b[0] ^ 0x80]) + b[1:4])[0]
    months = b[4] - 60
    sign = "-" if (years < 0 or months < 0) else "+"
    return f"{sign}{abs(years)}-{abs(months)}"


def decode_interval_ds(v: bytes | str | None) -> str | None:
    """INTERVALDS bytes → canonical '+DD HH:MM:SS.fffffffff' string."""
    b = _to_bytes(v)
    if b is None or len(b) != 11:
        return None
    days = struct.unpack(">i", bytes([b[0] ^ 0x80]) + b[1:4])[0]
    hours, minutes, secs = b[4] - 60, b[5] - 60, b[6] - 60
    nanos = struct.unpack(">i", bytes([b[7] ^ 0x80]) + b[8:11])[0]
    neg = days < 0 or hours < 0 or minutes < 0 or secs < 0 or nanos < 0
    sign = "-" if neg else "+"
    return (
        f"{sign}{abs(days)} {abs(hours):02d}:{abs(minutes):02d}:"
        f"{abs(secs):02d}.{abs(nanos):09d}"
    )


def decode_charset(v: bytes | str | None, charset: str = "utf-8") -> str | None:
    b = _to_bytes(v)
    if b is None:
        return None
    return b.decode(charset)


# ---------------------------------------------------------------------------
# vectorized pandas UDFs (Arrow batches — the DataFrame-layer surface)
# ---------------------------------------------------------------------------


def _finite_or_none(d: Decimal | None) -> Decimal | None:
    return None if d is None or d.is_infinite() else d


@pandas_udf(DoubleType())
def ora_number_to_double(col: pd.Series) -> pd.Series:
    return col.map(
        lambda v: None if v is None else
        (lambda d: None if d is None else float(d))(_finite_or_none(decode_number(v)))
    )


@pandas_udf(LongType())
def ora_number_to_long(col: pd.Series) -> pd.Series:
    return col.map(
        lambda v: None if v is None else
        (lambda d: None if d is None else int(d))(_finite_or_none(decode_number(v)))
    )


def ora_number_to_decimal_udf(precision: int = 38, scale: int = 10):
    """Decimal-typed decode; precision/scale follow the dictionary column
    (OraCdcColumn.java:497-500)."""

    @pandas_udf(DecimalType(precision, scale))
    def _udf(col: pd.Series) -> pd.Series:
        q = Decimal(1).scaleb(-scale)
        return col.map(
            lambda v: None if v is None else
            (lambda d: None if d is None else d.quantize(q))(
                _finite_or_none(decode_number(v))
            )
        )

    return _udf


@pandas_udf(FloatType())
def ora_binary_float(col: pd.Series) -> pd.Series:
    return col.map(decode_binary_float)


@pandas_udf(DoubleType())
def ora_binary_double(col: pd.Series) -> pd.Series:
    return col.map(decode_binary_double)


@pandas_udf(TimestampNTZType())
def ora_date(col: pd.Series) -> pd.Series:
    return col.map(decode_ora_date)


@pandas_udf(TimestampNTZType())
def ora_timestamp(col: pd.Series) -> pd.Series:
    return col.map(decode_ora_timestamp)


@pandas_udf(TimestampType())
def ora_timestamp_tz(col: pd.Series) -> pd.Series:
    """TSTZ → instant (Spark TimestampType; session tz pinned UTC)."""
    return col.map(decode_ora_tstz)


@pandas_udf(StringType())
def ora_timestamp_tz_str(col: pd.Series) -> pd.Series:
    """TSTZ → ISO-8601 string with original offset (reference's Kafka
    form)."""
    return col.map(decode_ora_tstz_str)


def ora_timestamp_ltz(db_zone: str = "UTC"):
    """TSLTZ decode parameterized by the database time zone."""

    @pandas_udf(TimestampType())
    def _udf(col: pd.Series) -> pd.Series:
        return col.map(lambda v: decode_ora_tsltz(v, db_zone))

    return _udf


def ora_timestamp_ltz_str(db_zone: str = "UTC"):
    """TSLTZ → ISO-8601 UTC string (hash-stable parity form)."""

    @pandas_udf(StringType())
    def _udf(col: pd.Series) -> pd.Series:
        return col.map(
            lambda v: None
            if v is None
            else (lambda d: None if d is None else d.isoformat())(
                decode_ora_tsltz(v, db_zone)
            )
        )

    return _udf


@pandas_udf(StringType())
def ora_interval_ym_str(col: pd.Series) -> pd.Series:
    return col.map(decode_interval_ym)


@pandas_udf(StringType())
def ora_interval_ds_str(col: pd.Series) -> pd.Series:
    return col.map(decode_interval_ds)


def ora_charset_decode(charset: str = "utf-8"):
    @pandas_udf(StringType())
    def _udf(col: pd.Series) -> pd.Series:
        return col.map(lambda v: decode_charset(v, charset))

    return _udf


def register_all(spark) -> None:
    """Expose the decoders to SQL (spark.udf.register — no Catalyst
    extension needed, SURVEY §4 item 4)."""
    spark.udf.register("ora_number_to_double", ora_number_to_double)
    spark.udf.register("ora_number_to_long", ora_number_to_long)
    spark.udf.register("ora_binary_float", ora_binary_float)
    spark.udf.register("ora_binary_double", ora_binary_double)
    spark.udf.register("ora_date", ora_date)
    spark.udf.register("ora_timestamp", ora_timestamp)
    spark.udf.register("ora_timestamp_tz", ora_timestamp_tz)
    spark.udf.register("ora_timestamp_tz_str", ora_timestamp_tz_str)
    spark.udf.register("ora_interval_ym", ora_interval_ym_str)
    spark.udf.register("ora_interval_ds", ora_interval_ds_str)


@pandas_udf(StringType())
def ora_number_encode_hex(col: pd.Series) -> pd.Series:
    """Inverse surface of ora_number_to_double: value → NUMBER byte hex
    (fixture generation + corpus-scale encode∘decode identity checks)."""
    return col.map(lambda v: None if v is None else encode_number(v).hex())


# ---------------------------------------------------------------------------
# ROWID — 18-char base64 representation (public Oracle format)
# ---------------------------------------------------------------------------
# OOOOOOFFFBBBBBBRRR: 6 chars data-object id, 3 relative file, 6 block,
# 3 row slot, each char one 6-bit digit of Oracle's base-64 alphabet.
# The reference keys records by ROWID when no PK exists
# (a2.use.rowid.as.key, OraCdcTableBase.java:186-201) and the mview log
# path joins masters by M_ROW$$ (KafkaSnapshotLogTable.java:228-342);
# decoding the components makes those keys orderable/partitionable.

ROWID_ALPHABET = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
)


def rowid_components(col):
    """JVM-side decode of an 18-char ROWID into
    (data_object_id, file_no, block_no, row_no) — pure instr/substring
    integer arithmetic (no UDF), identical in Spark and DuckDB."""
    import pyspark.sql.functions as F

    def digit(i: int):  # 1-based char position -> 0..63
        return (
            F.instr(F.lit(ROWID_ALPHABET), F.substring(col, i, 1)) - 1
        ).cast("bigint")

    def field(start: int, n: int):
        v = F.lit(0).cast("bigint")
        for k in range(n):
            v = v * 64 + digit(start + k)
        return v

    return (
        field(1, 6).alias("data_object_id"),
        field(7, 3).alias("file_no"),
        field(10, 6).alias("block_no"),
        field(16, 3).alias("row_no"),
    )


def rowid_encode_py(obj: int, fil: int, blk: int, row: int) -> str:
    """Python reference encoder (tests/goldens only — not a Spark path)."""
    out = []
    for v, n in ((obj, 6), (fil, 3), (blk, 6), (row, 3)):
        for k in reversed(range(n)):
            out.append(ROWID_ALPHABET[(v >> (6 * k)) & 63])
    return "".join(out)
