"""TDE column decryption (P10, SURVEY §2.4).

Reference: internals/OraCdcTdeColumnDecrypter.java AES-decrypts
encrypted/salted column bytes with the wallet master key *before* type
decode (wired through GenericDecoders.java:170-207).

Spark-first restatement: `aes_decrypt` is a built-in JVM expression —
the decrypt stays inside WholeStageCodegen and composes with the pandas
UDF type decoders afterwards:

    decrypted = tde_decrypt(F.col("enc_bytes"), key)
    value     = ora_number_to_double(F.hex(decrypted))

Key management (wallet) is deployment plumbing — the key arrives as a
config secret; SALT handling maps to AES-CBC/GCM IV prefixes which
aes_decrypt consumes natively.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def tde_encrypt(col: Column | str, key: str, mode: str = "GCM") -> Column:
    """Test-side helper: encrypt as the wallet would (AES-GCM default)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_encrypt(c, F.lit(key), F.lit(mode))


def tde_decrypt(col: Column | str, key: str, mode: str = "GCM") -> Column:
    """Decrypt an encrypted column payload; compose with the byte
    decoders downstream."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aes_decrypt(c, F.lit(key), F.lit(mode))


# ---------------------------------------------------------------------------
# Oracle TDE column layout (OraCdcTdeColumnDecrypter.java:157-196)
# ---------------------------------------------------------------------------
#
#     [ ciphertext | salt-IV (16B, when salted) | MAC ]
#
# * salted columns carry their AES-CBC IV as the 16 bytes AFTER the
#   ciphertext; no-salt columns use an all-zero IV (:171-174);
# * integrity suffix: SHA-1 MAC = 20 bytes, GCM tag = 16, NOMAC = 0
#   (:175-178);
# * plaintext padding is the PKCS7 scheme (pad byte k repeated k times,
#   `padOrclBytes` :198+);
# * the wallet-decrypted data key carries a 16-byte header before the
#   actual AES key (:103, copyOfRange(decDataKey, 0x10, …)).
#
# The CBC paths (SHA-1 / NOMAC) restructure to Spark's aes_decrypt
# convention (IV-prefixed input, 'CBC'/'PKCS') — staying a JVM
# expression inside WholeStageCodegen.  The GCM path needs a 16-byte IV,
# which Spark's builtin (12-byte IV) cannot express — documented out.

MAC_SHA1 = "SHA1"    # ENC$.INTALG = 1
MAC_NOMAC = "NOMAC"  # ENC$.INTALG = 2

_MAC_LEN = {MAC_SHA1: 20, MAC_NOMAC: 0}

_ZERO_IV = bytes(16)


def data_key_from_wallet_blob(blob: bytes, key_bytes: int = 16) -> bytes:
    """Wallet-decrypted data key blob → AES key: skip the 16-byte header
    (OraCdcTdeColumnDecrypter.java:103). key_bytes: 16/24/32 for
    AES128/192/256 (ENC$.ENCALG 2/3/4)."""
    return blob[0x10 : 0x10 + key_bytes]


def tde_decrypt_column(
    col: Column | str, key: bytes, salt: bool = True, int_alg: str = MAC_SHA1
) -> Column:
    """Decrypt an Oracle TDE column image laid out as above (AES-CBC
    paths).  MAC bytes are stripped, not verified — the reference does
    the same (:186 doFinal over ciphertext only)."""
    c = F.col(col) if isinstance(col, str) else col
    mac_len = _MAC_LEN[int_alg.upper()]
    iv_len = 16 if salt else 0
    ct_len = F.length(c) - F.lit(iv_len + mac_len)
    ct = F.substring(c, 1, ct_len)
    if salt:
        iv = c.substr(ct_len + 1, F.lit(16))
    else:
        iv = F.lit(_ZERO_IV)
    return F.aes_decrypt(
        F.concat(iv, ct), F.lit(key), F.lit("CBC"), F.lit("PKCS")
    )


def tde_encrypt_column(
    col: Column | str, key: bytes, int_alg: str = MAC_SHA1
) -> Column:
    """Test-side inverse: produce the salted Oracle layout
    (ct || iv || mac) from plaintext.  Spark's CBC encrypt emits
    iv || ct; rearrange and append a placeholder MAC (the decrypter
    strips without verifying, like the reference)."""
    c = F.col(col) if isinstance(col, str) else col
    enc = F.aes_encrypt(c, F.lit(key), F.lit("CBC"), F.lit("PKCS"))
    iv = F.substring(enc, 1, 16)
    ct = enc.substr(F.lit(17), F.length(enc) - F.lit(16))
    mac = F.lit(bytes(_MAC_LEN[int_alg.upper()]))
    return F.concat(ct, iv, mac)
