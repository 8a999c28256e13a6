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
