"""Property-based theorems for the multimodal codec + hash path.

The PPM parser, RIFF chunk walk, nearest-neighbor resize and integer
aHash are REAL implementations (SURVEY's multimodal plumbing stance —
only external codec FORMATS are stubbed), so they get the same
generated-theorem treatment as the text operators:

* the P6 parser inverts construction under arbitrary header whitespace
  runs and interleaved comment lines (the grammar, not one fixture
  header);
* the RIFF walk finds fmt/data regardless of chunk order, unknown
  chunks in between, and ODD-length chunks (the `clen & 1` padding rule
  real encoders emit and fixtures never exercise);
* resize is a valid P6 of the requested size, the identity at the
  source size, and idempotent at a fixed target;
* the vectorized executor-side aHash equals a scalar literal model on
  random images (pixel-loop, no numpy) — decode, block assignment,
  floor means, threshold and bit packing all pinned.
"""

from __future__ import annotations

import pytest

import struct

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracdc_spark.operators.multimodal import (
    ppm_raster,
    resize_ppm,
    wav_pcm,
)

_FAST = dict(max_examples=60, deadline=None)
_SPARK = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WS = st.lists(
    st.sampled_from([b" ", b"\n", b"\t", b"\r"]), min_size=1, max_size=3
).map(b"".join)
_COMMENT = st.sampled_from([b"", b"# a comment\n", b"#x\n# y z\n"])

_IMG = st.tuples(
    st.integers(min_value=1, max_value=9),   # w
    st.integers(min_value=1, max_value=7),   # h
    st.integers(min_value=0, max_value=255), # pixel seed
)


def _raster(w, h, seed):
    return bytes((seed + 11 * j) % 256 for j in range(w * h * 3))


@given(img=_IMG, ws1=_WS, ws2=_WS, ws3=_WS, c1=_COMMENT, c2=_COMMENT)
@settings(**_FAST)
def test_ppm_parser_accepts_the_grammar(img, ws1, ws2, ws3, c1, c2):
    w, h, seed = img
    raster = _raster(w, h, seed)
    payload = (
        b"P6" + ws1 + c1 + str(w).encode() + ws2 + c2
        + str(h).encode() + ws3 + b"255\n" + raster
    )
    assert ppm_raster(payload) == (w, h, raster)


@given(
    img=_IMG,
    pre_junk=st.booleans(),
    odd_junk=st.integers(min_value=1, max_value=5),
    data_first=st.booleans(),
)
@settings(**_FAST)
def test_riff_walk_handles_order_junk_and_padding(img, pre_junk, odd_junk, data_first):
    _w, _h, seed = img
    n = seed + 1
    samples = bytes((seed + 3 * j) % 256 for j in range(2 * n))
    fmt = b"fmt " + struct.pack("<I", 16) + struct.pack(
        "<HHIIHH", 1, 1, 16000, 32000, 2, 16
    )
    data = b"data" + struct.pack("<I", len(samples)) + samples
    junk_body = bytes(odd_junk)  # ODD length exercises the pad rule
    junk = b"junk" + struct.pack("<I", len(junk_body)) + junk_body
    if len(junk_body) & 1:
        junk += b"\x00"
    chunks = [data, fmt] if data_first else [fmt, data]
    if pre_junk:
        chunks.insert(0, junk)
    else:
        chunks.insert(1, junk)
    body = b"".join(chunks)
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    rate, pcm = wav_pcm(payload)
    assert rate == 16000 and pcm == samples


@given(img=_IMG, tw=st.integers(min_value=1, max_value=9),
       th=st.integers(min_value=1, max_value=7))
@settings(**_FAST)
def test_resize_valid_identity_and_idempotent(img, tw, th):
    w, h, seed = img
    payload = b"P6\n%d %d\n255\n" % (w, h) + _raster(w, h, seed)
    out = resize_ppm(payload, tw, th)
    ow, oh, oraster = ppm_raster(out)
    assert (ow, oh, len(oraster)) == (tw, th, tw * th * 3)
    # identity at the source size
    assert ppm_raster(resize_ppm(payload, w, h))[2] == _raster(w, h, seed)
    # idempotent at a fixed target
    assert resize_ppm(out, tw, th) == out


def _model_ahash(payload, grid=4):
    """Scalar literal of the documented aHash definition — no numpy."""
    w, h, raster = ppm_raster(payload)
    grays = [
        (raster[3 * p] + raster[3 * p + 1] + raster[3 * p + 2]) // 3
        for p in range(w * h)
    ]
    blocks = {}
    for y in range(h):
        for x in range(w):
            b = (y * grid // h) * grid + (x * grid // w)
            blocks.setdefault(b, []).append(grays[y * w + x])
    bvs = {b: sum(v) // len(v) for b, v in blocks.items()}
    mean = sum(bvs.values()) // len(bvs)
    return sum((1 << b) for b, v in bvs.items() if v > mean)


@given(imgs=st.lists(_IMG, min_size=1, max_size=6))
@settings(**_SPARK)
def test_ahash_matches_scalar_model(spark, imgs):
    from oracdc_spark.operators.multimodal import _image_hashes

    rows = [
        (i, "image", b"P6\n%d %d\n255\n" % (w, h) + _raster(w, h, seed))
        for i, (w, h, seed) in enumerate(imgs)
    ]
    df = spark.createDataFrame(rows, "media_id bigint, kind string, content binary")
    got = {r.media_id: r.ahash for r in _image_hashes(df).collect()}
    want = {i: _model_ahash(bytes(content)) for i, _k, content in rows}
    assert got == want


def _model_dhash(payload, grid=4):
    """Scalar literal of the documented dHash definition — no numpy:
    (grid+1)*grid block frame, floor-mean block grays (empty blocks 0),
    one bit per horizontal neighbor comparison."""
    w, h, raster = ppm_raster(payload)
    gw = grid + 1
    blocks: dict[int, list[int]] = {}
    for y in range(h):
        for x in range(w):
            p = y * w + x
            gray = (raster[3 * p] + raster[3 * p + 1] + raster[3 * p + 2]) // 3
            b = (y * grid // h) * gw + (x * gw // w)
            blocks.setdefault(b, []).append(gray)
    bv = [0] * (grid * gw)
    for b, vals in blocks.items():
        bv[b] = sum(vals) // len(vals)
    out = 0
    for by in range(grid):
        for bx in range(grid):
            if bv[by * gw + bx] > bv[by * gw + bx + 1]:
                out += 1 << (by * grid + bx)
    return out


@given(imgs=st.lists(_IMG, min_size=1, max_size=6))
@settings(**_SPARK)
@pytest.mark.slow
def test_dhash_matches_scalar_model(spark, imgs):
    from oracdc_spark.operators.multimodal import image_dhash

    rows = [
        (i, "image", b"P6\n%d %d\n255\n" % (w, h) + _raster(w, h, seed))
        for i, (w, h, seed) in enumerate(imgs)
    ]
    df = spark.createDataFrame(rows, "media_id bigint, kind string, content binary")
    got = {r.media_id: r.dhash for r in image_dhash(df).collect()}
    want = {i: _model_dhash(bytes(content)) for i, _k, content in rows}
    assert got == want


_SAMPLES = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=40
)


def _wav(samples):
    data = b"".join(struct.pack("<h", s) for s in samples)
    return (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _model_ehash(samples, segments=8):
    """Scalar literal of the documented energy-hash definition: seg(i)
    = i*S//n, floor-mean s² per nonempty segment, threshold at the
    floor mean of present-segment energies."""
    n = len(samples)
    segs: dict[int, list[int]] = {}
    for i, s in enumerate(samples):
        segs.setdefault(i * segments // n, []).append(s * s)
    evs = {k: sum(v) // len(v) for k, v in segs.items()}
    mean = sum(evs.values()) // len(evs)
    return sum((1 << k) for k, e in evs.items() if e > mean)


def _model_zcr(samples, segments=8):
    """Scalar literal of the documented ZCR definition over sample
    transitions: crossing at i when sign(s_i)!=sign(s_{i+1}) (>=0 rule),
    segment = i*S//n, rate = crossings*1000 // transitions, threshold
    at the floor mean of present-segment rates; <2 samples hash 0."""
    n = len(samples)
    if n < 2:
        return 0
    segs: dict[int, list[int]] = {}
    for i in range(n - 1):
        cross = (samples[i] >= 0) != (samples[i + 1] >= 0)
        segs.setdefault(i * segments // n, []).append(1 if cross else 0)
    zq = {k: (sum(v) * 1000) // len(v) for k, v in segs.items()}
    mv = sum(zq.values()) // len(zq)
    return sum((1 << k) for k, r in zq.items() if r > mv)


@given(clips=st.lists(_SAMPLES, min_size=1, max_size=5))
@settings(**_SPARK)
@pytest.mark.slow
def test_ehash_and_zcr_match_scalar_models(spark, clips):
    from oracdc_spark.operators.multimodal import _audio_hashes, audio_zcr_hash

    rows = [(i, "audio", _wav(s)) for i, s in enumerate(clips)]
    df = spark.createDataFrame(rows, "media_id bigint, kind string, content binary")
    got_e = {r.media_id: r.ehash for r in _audio_hashes(df).collect()}
    got_z = {r.media_id: r.zhash for r in audio_zcr_hash(df).collect()}
    assert got_e == {i: _model_ehash(s) for i, s in enumerate(clips)}
    assert got_z == {i: _model_zcr(s) for i, s in enumerate(clips)}


@given(
    hashes=st.lists(st.integers(min_value=0, max_value=(1 << 16) - 1),
                    min_size=2, max_size=10),
    max_h=st.integers(min_value=0, max_value=3),
)
@settings(**_SPARK)
def test_banded_hamming_pairing_is_pigeonhole_complete(spark, hashes, max_h):
    """_hamming_near_dups with max_hamming < bands equals brute force:
    <= max_h differing bits cannot touch all bands (pigeonhole), so the
    banded self-join loses NO qualifying pair — the exact-completeness
    claim the image/audio near-dup operators rest on."""
    from oracdc_spark.operators.multimodal import _hamming_near_dups

    df = spark.createDataFrame(
        list(enumerate(hashes)), "media_id bigint, hsh bigint"
    )
    got = {
        (r.m1, r.m2, r.hamming)
        for r in _hamming_near_dups(df, "hsh", 16, max_h, 4).collect()
    }
    expect = set()
    for i in range(len(hashes)):
        for j in range(i + 1, len(hashes)):
            ham = bin(hashes[i] ^ hashes[j]).count("1")
            if ham <= max_h:
                expect.add((i, j, ham))
    assert got == expect
