"""Property-based roundtrips for P10 TDE column decryption.

The golden-vector suite pins the reference's published test vectors
(OraCdcTdeColumnDecrypterTest.java); here the INVERSE direction is a
generated theorem: for arbitrary plaintext, key material, algorithm and
layout options, a column encrypted by an INDEPENDENT implementation
(OpenSSL via `cryptography`) into the documented Oracle layout
[ct | mac? | salt-iv?] (OraCdcTdeColumnDecrypter.java:160-178) is
decrypted back to the exact plaintext by the pure-Python decrypter —
across AES-128/192/256 and 3DES-168, SHA1/NOMAC, salted and unsalted,
and the INTALG-3 GCM layout; and any single-bit tag tamper is caught.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

cryptography = pytest.importorskip("cryptography")
from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

try:  # TripleDES moved in cryptography >= 43
    from cryptography.hazmat.decrepit.ciphers.algorithms import TripleDES
except ImportError:  # pragma: no cover - older layout
    TripleDES = algorithms.TripleDES

from oracdc_spark.functions.tde import (
    ENCALG_3DES168,
    ENCALG_AES128,
    ENCALG_AES192,
    ENCALG_AES256,
    INTALG_GCM,
    INTALG_NOMAC,
    INTALG_SHA1,
    _KEY_LEN,
    OraTdeColumnDecrypter,
)

_SETTINGS = dict(max_examples=30, deadline=None)


def _orcl_pad(pt: bytes, block: int) -> bytes:
    """Oracle block padding: pad byte k repeated k times, full block
    when already aligned (the layout the goldens exhibit — 14-byte
    plaintext -> 16-byte ciphertext with k=2)."""
    k = block - (len(pt) % block) or block
    return pt + bytes([k]) * k


def _encrypt_layout(pt, blob, enc_alg, int_alg, salt, iv_seed):
    """Independent (OpenSSL) construction of the Oracle column layout."""
    key = bytes(blob)[0x10 : 0x10 + _KEY_LEN[enc_alg]]
    block = 8 if enc_alg == ENCALG_3DES168 else 16
    iv = bytes((iv_seed + i) % 256 for i in range(block)) if salt else bytes(block)
    alg = TripleDES(key) if enc_alg == ENCALG_3DES168 else algorithms.AES(key)
    enc = Cipher(alg, modes.CBC(iv)).encryptor()
    ct = enc.update(_orcl_pad(pt, block)) + enc.finalize()
    if int_alg == INTALG_SHA1:
        # decrypter strips the 20-byte MAC without verifying (like the
        # reference) — arbitrary bytes exercise exactly that
        ct += bytes((i * 3) % 256 for i in range(20))
    if salt:
        ct += iv
    return ct


@given(
    pt=st.binary(max_size=100),
    enc_alg=st.sampled_from(
        [ENCALG_3DES168, ENCALG_AES128, ENCALG_AES192, ENCALG_AES256]
    ),
    int_alg=st.sampled_from([INTALG_SHA1, INTALG_NOMAC]),
    salt=st.booleans(),
    key_seed=st.integers(min_value=0, max_value=255),
    iv_seed=st.integers(min_value=0, max_value=255),
)
@settings(**_SETTINGS)
def test_cbc_layout_roundtrip(pt, enc_alg, int_alg, salt, key_seed, iv_seed):
    blob = bytes((key_seed + 7 * i) % 256 for i in range(0x10 + 0x20))
    layout = _encrypt_layout(pt, blob, enc_alg, int_alg, salt, iv_seed)
    dec = OraTdeColumnDecrypter(blob, enc_alg, int_alg)
    assert dec.decrypt(layout, salt=salt) == pt


@given(
    pt=st.binary(max_size=100),
    enc_alg=st.sampled_from([ENCALG_AES128, ENCALG_AES192, ENCALG_AES256]),
    salt=st.booleans(),
    key_seed=st.integers(min_value=0, max_value=255),
    iv_seed=st.integers(min_value=0, max_value=255),
    tamper=st.one_of(st.none(), st.integers(min_value=0, max_value=127)),
)
@settings(**_SETTINGS)
def test_gcm_column_layout_roundtrip(pt, enc_alg, salt, key_seed, iv_seed, tamper):
    """INTALG 3 layout [ct | tag 0x10 | salt-iv 0x10]: OpenSSL-encrypted
    columns decrypt back exactly; ANY single-bit tag tamper raises."""
    blob = bytes((key_seed + 7 * i) % 256 for i in range(0x10 + 0x20))
    key = blob[0x10 : 0x10 + _KEY_LEN[enc_alg]]
    iv = bytes((iv_seed + i) % 256 for i in range(16)) if salt else bytes(16)
    enc = Cipher(algorithms.AES(key), modes.GCM(iv)).encryptor()
    ct = enc.update(_orcl_pad(pt, 16)) + enc.finalize()
    tag = bytearray(enc.tag)
    if tamper is not None:
        tag[tamper // 8] ^= 1 << (tamper % 8)
    layout = ct + bytes(tag) + (iv if salt else b"")
    dec = OraTdeColumnDecrypter(blob, enc_alg, INTALG_GCM)
    if tamper is None:
        assert dec.decrypt(layout, salt=salt) == pt
    else:
        with pytest.raises(ValueError, match="tag mismatch"):
            dec.decrypt(layout, salt=salt)
