"""Multimodal plumbing + LOB reassembly tests."""

import pyspark.sql.functions as F
import pytest

from oracdc_spark.catalog import load_table
from oracdc_spark.operators import lob, multimodal

SF = "/root/testdata/sf0.001"


class TestLob:
    def test_roundtrip_byte_exact(self, spark):
        out = lob.lob_roundtrip(spark, SF)
        assert out.filter(~F.col("match")).count() == 0
        assert out.count() == 500

    def test_chunking_sizes(self, spark):
        docs = load_table(spark, SF, "documents")
        chunks = lob.lob_chunks(docs, 100)
        # every non-final chunk is exactly 100 chars
        w = chunks.groupBy("lob_id").agg(F.max("chunk_idx").alias("last"))
        j = chunks.join(w, "lob_id").filter(F.col("chunk_idx") < F.col("last"))
        assert j.filter(F.length("chunk") != 100).count() == 0


class TestInflate:
    """P13 — gzip/zlib chunk inflate (GzipUtil + getLob semantics)."""

    def test_detect_and_inflate_scalar(self):
        import gzip
        import zlib

        from oracdc_spark.functions.compress import _inflate_one

        raw = "héllo wörld".encode()
        assert _inflate_one(gzip.compress(raw, mtime=0)) == raw
        assert _inflate_one(zlib.compress(raw)) == raw
        assert _inflate_one(raw) == raw          # pass-through (GzipUtil)
        assert _inflate_one(None) is None

    def test_jvm_side_magic_detection(self, spark):
        import gzip
        import zlib

        import pyspark.sql.functions as F

        from oracdc_spark.functions.compress import is_gzip, is_zlib

        rows = [
            (gzip.compress(b"a", mtime=0), "gzip"),
            (zlib.compress(b"a"), "zlib"),
            (b"plain", "raw"),
        ]
        df = spark.createDataFrame(rows, "payload binary, expect string")
        got = df.select(
            "expect",
            F.when(is_gzip("payload"), "gzip")
            .when(is_zlib("payload"), "zlib")
            .otherwise("raw")
            .alias("got"),
        ).collect()
        assert all(r.expect == r.got for r in got)

    def test_inflate_udf_roundtrip(self, spark):
        from oracdc_spark.functions.compress import gzip_compress, inflate_text

        df = spark.createDataFrame([("some text",), (None,)], "t string")
        out = df.select(inflate_text(gzip_compress("t")).alias("t2")).collect()
        assert {r.t2 for r in out} == {"some text", None}

    def test_cmap_is_documented_stub(self):
        import pytest as _pytest

        from oracdc_spark.functions.compress import cmap_inflate

        with _pytest.raises(NotImplementedError):
            cmap_inflate(b"\x00")


class TestMultimodal:
    def test_features_schema_and_determinism(self, spark):
        media = multimodal.synthetic_media(load_table(spark, SF, "documents"))
        feats = multimodal.extract_features(media)
        rows = {r.media_id: r for r in feats.collect()}
        assert len(rows) == 500
        r0 = rows[0]
        assert r0.kind == "image" and r0.width and 1 <= r0.width <= 1920
        # audio/video rows have no dimensions
        r1 = rows[1]
        assert r1.kind == "audio" and r1.width is None
        # digest matches the payload bytes
        import hashlib

        doc0 = (
            load_table(spark, SF, "documents").filter("doc_id = 0").first()
        )
        assert r0.digest == hashlib.sha256(doc0.text.encode()).hexdigest()
        assert r0.n_bytes == len(doc0.text.encode())

    def test_frame_sample_plan(self, spark):
        media = multimodal.synthetic_media(load_table(spark, SF, "documents"))
        plan = multimodal.frame_sample_plan(media, every_n=10)
        got = plan.filter("media_id = 2").collect()  # doc 2 → video
        assert got and all(r.frame_idx % 10 == 0 for r in got)

    def test_resize_stub_raises_on_execution(self, spark):
        media = multimodal.synthetic_media(load_table(spark, SF, "documents"))
        plan = multimodal.resize_stub(media, 224, 224)
        assert plan.schema == multimodal.MEDIA_SCHEMA  # plan is real
        with pytest.raises(Exception, match="NotImplementedError|resize"):
            plan.count()  # execution hits the stub


class TestRealCodecs:
    """Stdlib PPM/WAV codecs: genuine parse (magic, header walk, chunk
    walk), not digest fakes."""

    def test_ppm_roundtrip(self):
        from oracdc_spark.operators.multimodal import decode_ppm, make_ppm

        for mid in (0, 7, 123, 1000):
            w, h, s = decode_ppm(make_ppm(mid))
            assert w == (mid % 16) + 1 and h == (mid % 8) + 1
            assert s == sum((mid * 7 + j * 13) % 256 for j in range(w * h * 3))

    def test_ppm_with_comment_header(self):
        from oracdc_spark.operators.multimodal import decode_ppm

        payload = b"P6\n# a comment\n2 1\n255\n" + bytes(6)
        assert decode_ppm(payload) == (2, 1, 0)

    def test_ppm_rejects_non_p6(self):
        import pytest as _pytest

        from oracdc_spark.operators.multimodal import decode_ppm

        with _pytest.raises(ValueError):
            decode_ppm(b"P3\n1 1\n255\n000")

    def test_wav_roundtrip(self):
        from oracdc_spark.operators.multimodal import WAV_RATE, decode_wav, make_wav

        for mid in (1, 55, 999):
            rate, n, ssq = decode_wav(make_wav(mid))
            assert rate == WAV_RATE
            assert n == (mid % 100) + 1
            expected = sum(
                (((mid * 31 + i * 17) % 65536) - 32768) ** 2 for i in range(n)
            )
            assert ssq == expected

    def test_wav_parses_standard_file(self):
        # a WAV produced by the stdlib `wave` module (different writer)
        import io
        import wave

        from oracdc_spark.operators.multimodal import decode_wav

        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(16000)
            wf.writeframes(b"\x01\x00\xff\xff\x00\x00")  # samples 1, -1, 0
        rate, n, ssq = decode_wav(buf.getvalue())
        assert (rate, n, ssq) == (16000, 3, 2)

    def test_wav_rejects_garbage(self):
        import pytest as _pytest

        from oracdc_spark.operators.multimodal import decode_wav

        with _pytest.raises(ValueError):
            decode_wav(b"not riff data at all")


class TestResize:
    def test_ppm_nearest_neighbor_resize(self):
        from oracdc_spark.operators.multimodal import decode_ppm, resize_ppm

        # 2x2 image: R G / B W
        raster = bytes([255,0,0, 0,255,0, 0,0,255, 255,255,255])
        src = b"P6\n2 2\n255\n" + raster
        up = resize_ppm(src, 4, 4)
        w, h, _ = decode_ppm(up)
        assert (w, h) == (4, 4)
        # top-left quadrant is all red (nearest neighbor)
        body = up[up.index(b"255\n") + 4:]
        assert body[0:3] == bytes([255, 0, 0]) and body[3:6] == bytes([255, 0, 0])
        down = resize_ppm(src, 1, 1)
        assert down.endswith(bytes([255, 0, 0]))  # (0,0) source pixel

    def test_resize_images_dataframe(self, spark):
        from oracdc_spark.operators.multimodal import (
            decode_ppm, make_ppm, resize_images,
        )

        rows = [(1, "image", make_ppm(1), "x", "{}"), (2, "video", b"vv", "x", "{}")]
        df = spark.createDataFrame(
            rows, "media_id long, kind string, content binary, mime string, meta_json string"
        )
        out = {r.media_id: r for r in resize_images(df, 3, 3).collect()}
        w, h, _ = decode_ppm(bytes(out[1].content))
        assert (w, h) == (3, 3)
        assert bytes(out[2].content) == b"vv"  # non-image untouched


class TestImageAHash:
    def test_exact_duplicates_share_hash(self, spark):
        """make_ppm(id) and make_ppm(id+256) are byte-identical (same
        w/h, pixels mod 256): their aHashes must collide; a structurally
        different image must not join the group."""
        from oracdc_spark.operators.multimodal import image_ahash, make_ppm

        rows = [
            (7, "image", make_ppm(7), "x", "{}"),
            (263, "image", make_ppm(263), "x", "{}"),   # 7 + 256 → dup
            (8, "image", make_ppm(8), "x", "{}"),
            (9, "audio", b"not an image", "x", "{}"),    # skipped
        ]
        df = spark.createDataFrame(
            rows,
            "media_id long, kind string, content binary, mime string, meta_json string",
        )
        out = {r.media_id: (r.ahash, r.n_same_hash) for r in image_ahash(df).collect()}
        assert set(out) == {7, 263, 8}
        assert out[7][0] == out[263][0] and out[7][1] == 2
        assert make_ppm(7) == make_ppm(263)

    def test_ahash_deterministic_integer(self):
        """The hash definition is pure integer arithmetic on the
        raster — byte-equal inputs give equal hashes regardless of
        partitioning (no float anywhere)."""
        from oracdc_spark.operators.multimodal import ppm_raster, make_ppm

        w, h, raster = ppm_raster(make_ppm(12))
        assert (w, h) == ((12 % 16) + 1, (12 % 8) + 1)
        assert len(raster) == w * h * 3


def test_audio_ehash_empty_segments_bit_positions():
    """Regression: with fewer samples than segments, EMPTY segments must
    not shift later segments' bit positions (the vectorized reduceat
    labeling bug caught by the sf0.01 oracle) — checked against the
    scalar definition for several short-sample shapes."""
    import struct

    import numpy as np

    def wav(samples, rate=8000):
        data = struct.pack(f"<{len(samples)}h", *samples)
        fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )

    def scalar_ehash(samples, segments=8):
        n = len(samples)
        segs = {}
        for i, s in enumerate(samples):
            acc = segs.setdefault((i * segments) // n, [0, 0])
            acc[0] += s * s
            acc[1] += 1
        evs = {k: e // c for k, (e, c) in segs.items()}
        mean = sum(evs.values()) // len(evs)
        return sum(1 << k for k, ev in evs.items() if ev > mean)

    from oracdc_spark.operators.multimodal import wav_pcm

    for samples in ([100, -30000, 7], [5], [1, 2], [0, 0, 32000, 1, 2, 3, 4]):
        payload = wav(samples)
        rate, data = wav_pcm(payload)
        sm = np.frombuffer(data, dtype="<i2").astype(np.int64)
        assert list(sm) == samples
        # reproduce the operator's vector path
        segments, n = 8, len(sm)
        s2 = sm * sm
        starts = (np.arange(segments, dtype=np.int64) * n + segments - 1) // segments
        ends = np.append(starts[1:], np.int64(n))
        nonempty = starts < ends
        ks = np.flatnonzero(nonempty)
        ener = np.add.reduceat(s2, starts[nonempty])
        cnts = ends[nonempty] - starts[nonempty]
        evs = ener // cnts
        mean = int(evs.sum()) // len(ks)
        eh = int(((evs > mean).astype(np.int64) << ks).sum())
        assert eh == scalar_ehash(samples), samples


class TestImageNearDups:
    def test_exact_complete_vs_brute_force(self, spark):
        """At max_hamming < bands the banded candidates are EXACT —
        the output must equal the brute-force Hamming-<=3 pair set
        over the decoded hashes (completeness AND soundness)."""
        import itertools

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        media = multimodal.synthetic_codec_media(docs)
        hashes = {
            r.media_id: r.ahash
            for r in multimodal._image_hashes(media).collect()
        }
        want = {}
        for a, b in itertools.combinations(sorted(hashes), 2):
            h = bin(hashes[a] ^ hashes[b]).count("1")
            if h <= 3:
                want[(a, b)] = h
        got = {
            (r.m1, r.m2): r.hamming
            for r in multimodal.image_near_dups(media).collect()
        }
        assert got == want and len(want) > 0

    def test_parameter_validation(self, spark):
        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        media = multimodal.synthetic_codec_media(docs)
        with pytest.raises(ValueError):
            multimodal.image_near_dups(media, grid=4, max_hamming=4, bands=4)
        with pytest.raises(ValueError):
            multimodal.image_near_dups(media, grid=4, max_hamming=2, bands=5)


class TestAudioNearDups:
    def test_exact_complete_vs_brute_force(self, spark):
        import itertools

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        media = multimodal.synthetic_codec_media(docs)
        hashes = {
            r.media_id: r.ehash
            for r in multimodal._audio_hashes(media, 16).collect()
        }
        want = {
            (a, b): bin(hashes[a] ^ hashes[b]).count("1")
            for a, b in itertools.combinations(sorted(hashes), 2)
            if bin(hashes[a] ^ hashes[b]).count("1") <= 3
        }
        got = {
            (r.m1, r.m2): r.hamming
            for r in multimodal.audio_near_dups(media, 16).collect()
        }
        assert got == want and len(want) > 0
