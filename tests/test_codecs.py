import numpy as np
import pytest

from gridfia_ray.codecs import phash
from gridfia_ray.codecs.png16 import decode_png16, encode_png16, psnr
from gridfia_ray.codecs.registry import decode_tile, encode_tile


@pytest.fixture
def tile():
    rng = np.random.RandomState(7)
    a = (rng.rand(64, 64) * 120.0).astype(np.float32)
    a[a < 30] = 0.0
    return a


class TestLossless:
    @pytest.mark.parametrize("fmt", ["raw-f32", "zlib-f32"])
    def test_bit_exact_roundtrip(self, tile, fmt):
        buf, meta = encode_tile(tile, fmt)
        out = decode_tile(buf, fmt, 64, 64, meta)
        assert out.dtype == np.float32
        assert np.array_equal(out, tile)

    def test_nonsquare(self):
        a = np.arange(12, dtype=np.float32).reshape(3, 4)
        buf, _ = encode_tile(a, "raw-f32")
        assert np.array_equal(decode_tile(buf, "raw-f32", 3, 4), a)

    def test_unknown_format(self, tile):
        with pytest.raises(ValueError):
            encode_tile(tile, "jpegxl")
        with pytest.raises(ValueError):
            decode_tile(b"", "jpegxl", 1, 1)


class TestPng16:
    def test_psnr_gate(self, tile):
        buf, vmin, vmax = encode_png16(tile)
        out = decode_png16(buf, vmin, vmax)
        assert psnr(tile, out) >= 40.0  # the input_hint lossy gate

    def test_constant_tile(self):
        a = np.full((16, 16), 3.25, dtype=np.float32)
        buf, vmin, vmax = encode_png16(a)
        out = decode_png16(buf, vmin, vmax)
        assert np.allclose(out, a)

    def test_all_zero(self):
        a = np.zeros((8, 8), dtype=np.float32)
        buf, vmin, vmax = encode_png16(a)
        assert np.array_equal(decode_png16(buf, vmin, vmax), a)

    def test_not_png_rejected(self):
        with pytest.raises(ValueError):
            decode_png16(b"\x00" * 16, 0, 1)

    def test_via_registry_meta(self, tile):
        buf, meta = encode_tile(tile, "png")
        out = decode_tile(buf, "png", 64, 64, meta)
        assert psnr(tile, out) >= 40.0


class TestBmp8:
    def test_psnr_gate(self, tile):
        buf, meta = encode_tile(tile, "bmp")
        out = decode_tile(buf, "bmp", 64, 64, meta)
        assert psnr(tile, out) >= 40.0

    def test_nonsquare_padding(self):
        """Width 5 → stride 8: the 4-byte row padding path."""
        a = np.arange(15, dtype=np.float32).reshape(3, 5)
        buf, meta = encode_tile(a, "bmp")
        out = decode_tile(buf, "bmp", 3, 5, meta)
        assert out.shape == (3, 5)
        assert psnr(a, out) >= 40.0

    def test_golden_bytes(self):
        """Decode a hand-built minimal BMP (2×2, bottom-up): pins the
        header layout and row order against the public spec, not our own
        encoder."""
        import struct

        pix_rows = bytes([10, 20, 0, 0]) + bytes([30, 40, 0, 0])  # bottom row first
        palette = b"".join(bytes([g, g, g, 0]) for g in range(256))
        off = 14 + 40 + len(palette)
        head = struct.pack("<2sIHHI", b"BM", off + len(pix_rows), 0, 0, off)
        info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 8, 0, len(pix_rows), 0, 0, 256, 0)
        out = decode_tile(head + info + palette + pix_rows, "bmp", 2, 2,
                          {"scale_vmin": 0.0, "scale_vmax": 255.0})
        # top row = second chunk (30, 40), bottom = first (10, 20)
        assert np.allclose(out, [[30.0, 40.0], [10.0, 20.0]])

    def test_constant_tile(self):
        a = np.full((4, 4), 7.5, np.float32)
        buf, meta = encode_tile(a, "bmp")
        assert np.allclose(decode_tile(buf, "bmp", 4, 4, meta), 7.5)

    def test_reject_non_bmp(self):
        with pytest.raises(ValueError):
            decode_tile(b"PNG....", "bmp", 2, 2, {})

    def test_reject_non_grayscale_palette(self):
        """An externally produced BMP whose palette is not the identity
        gray ramp must be rejected, not decoded index-as-gray."""
        a = np.arange(16, dtype=np.float32).reshape(4, 4)
        buf, meta = encode_tile(a, "bmp")
        mutated = bytearray(buf)
        # palette entry 1 (B,G,R,0) starts at 14 + 40 + 4: invert it
        mutated[58:61] = bytes([255, 0, 0])
        with pytest.raises(ValueError, match="palette"):
            decode_tile(bytes(mutated), "bmp", 4, 4, meta)


class TestHashes:
    def test_content_hash_sensitivity(self):
        a = phash.content_hash64(b"x" * 1000)
        b = phash.content_hash64(b"x" * 999 + b"y")
        c = phash.content_hash64(b"x" * 1000)
        assert a != b and a == c

    def test_content_hash_order_sensitive(self):
        assert phash.content_hash64(b"ab" * 64) != phash.content_hash64(b"ba" * 64)

    def test_phash_near_tiles_close(self, tile):
        noisy = tile + np.random.RandomState(1).rand(64, 64).astype(np.float32) * 0.01
        h1 = phash.average_phash64(tile)
        h2 = phash.average_phash64(noisy)
        assert phash.hamming64(np.array([h1]), np.array([h2]))[0] <= 2

    def test_phash_distinct_tiles_far(self, tile):
        other = np.flipud(tile).copy()
        h1 = phash.average_phash64(tile)
        h2 = phash.average_phash64(other)
        assert phash.hamming64(np.array([h1]), np.array([h2]))[0] > 4

    def test_hamming_identity_and_known(self):
        assert phash.hamming64(np.array([123]), np.array([123]))[0] == 0
        assert phash.hamming64(np.array([0]), np.array([-1]))[0] == 64


class TestJpegBaseline:
    """Pure-numpy baseline JPEG grayscale (T.81): the genuinely LOSSY
    interchange format the multimodal path was missing (round-3 VERDICT
    #6). PSNR gate on the seeded tile fixture, structural round-trips,
    and spec-shape validation."""

    def test_psnr_gate_seeded_fixture(self):
        from gridfia_ray import fixtures
        from gridfia_ray.codecs.jpeg import decode_jpeg_gray, encode_jpeg_gray

        cube, _ = fixtures.build_cube(fixtures.SCALES["t1"])
        worst = np.inf
        for layer in (0, 1, 3):  # total + two species layers
            a = cube[layer][:64, :64].astype(np.float32)
            buf, vmin, vmax = encode_jpeg_gray(a, quality=95)
            out = decode_jpeg_gray(buf, vmin, vmax)
            worst = min(worst, psnr(a, out))
        assert worst >= 40.0  # the input_hint lossy gate, real DCT loss

    def test_compression_actually_happens(self, tile):
        from gridfia_ray.codecs.jpeg import encode_jpeg_gray

        buf, _, _ = encode_jpeg_gray(tile, quality=85)
        assert len(buf) < 0.5 * tile.nbytes  # lossy DCT+huffman beats raw

    def test_quality_monotone(self, tile):
        from gridfia_ray.codecs.jpeg import decode_jpeg_gray, encode_jpeg_gray

        errs = []
        for q in (50, 75, 95):
            buf, vmin, vmax = encode_jpeg_gray(tile, quality=q)
            out = decode_jpeg_gray(buf, vmin, vmax)
            errs.append(float(np.mean((out - tile) ** 2)))
        assert errs[0] > errs[1] > errs[2]

    def test_odd_dims_and_flat(self):
        from gridfia_ray.codecs.jpeg import decode_jpeg_gray, encode_jpeg_gray

        rng = np.random.RandomState(3)
        a = (rng.rand(50, 37) * 90).astype(np.float32)
        buf, vmin, vmax = encode_jpeg_gray(a)
        out = decode_jpeg_gray(buf, vmin, vmax)
        assert out.shape == a.shape and psnr(a, out) >= 40.0
        flat = np.full((16, 16), 7.0, np.float32)
        buf, vmin, vmax = encode_jpeg_gray(flat)
        assert np.allclose(decode_jpeg_gray(buf, vmin, vmax), flat)

    def test_via_registry_meta(self, tile):
        buf, meta = encode_tile(tile, "jpeg")
        out = decode_tile(buf, "jpeg", 64, 64, meta)
        assert out.dtype == np.float32
        assert psnr(tile, out) >= 40.0

    def test_rejects_non_jpeg_and_unsupported(self):
        from gridfia_ray.codecs.jpeg import decode_jpeg_gray

        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg_gray(b"\x00" * 16)

    def test_decodes_store_tiles_end_to_end(self, ray_session):
        """A jpeg-format tile table flows through the REAL decode stage
        (caption meta → scale) and the multimodal feature actor — the
        PSNR gate holds on what comes out of the distributed path."""
        import ray.data as rd

        from gridfia_ray import fixtures
        from gridfia_ray.stages.multimodal import TileFeatureActor

        from gridfia_ray.pipelines.common import GridSpec, decoded_tiles

        cube, catalog = fixtures.build_cube(fixtures.SCALES["t1"])
        tbl = fixtures.tile_table_from_cube(cube, catalog, tile=64, fmt="jpeg")
        spec = GridSpec(
            origin_x=fixtures.ORIGIN_X, origin_y=fixtures.ORIGIN_Y,
            px=fixtures.PX, tile=64,
        )
        decoded = decoded_tiles(
            rd.from_arrow(tbl), spec, include_total=True, species=["0000"]
        )
        dec = decoded.to_pandas()
        assert len(dec) == 16  # 4x4 grid of total-layer tiles
        assert (dec["status"] == "ok").all()
        feats = (
            decoded.map_batches(
                TileFeatureActor, batch_format="pyarrow", concurrency=(1, 2)
            )
            .to_pandas()
        )
        assert len(feats) == 16
        # spot-check a tile against its source layer through the full
        # distributed decode (caption scale round-trips)
        r = dec[(dec["tile_row"] == 0) & (dec["tile_col"] == 0)].iloc[0]
        got = np.frombuffer(r["pix"], "<f4").reshape(64, 64)
        assert psnr(cube[0][:64, :64].astype(np.float32), got) >= 40.0


class TestWav:
    def test_roundtrip_int16_exact(self):
        import numpy as np

        from gridfia_ray.codecs.wav import decode_wav_pcm16, encode_wav_pcm16

        rng = np.random.RandomState(9)
        x = (rng.rand(3001) * 2 - 1) * 0.9
        buf = encode_wav_pcm16(x, 16000)
        y, rate = decode_wav_pcm16(buf)
        assert rate == 16000 and y.dtype == np.float32 and len(y) == 3001
        # lossless modulo the round-to-nearest int16 quantization
        q = np.clip(np.round(np.asarray(x) * 32768.0), -32768, 32767).astype("<i2")
        assert (y == (q.astype(np.float32) / np.float32(32768.0))).all()

    def test_stereo_means_to_mono_and_chunk_skip(self):
        import struct

        import numpy as np

        from gridfia_ray.codecs.wav import decode_wav_pcm16

        left = np.array([1000, -2000, 400], "<i2")
        right = np.array([3000, 2000, -400], "<i2")
        data = np.column_stack([left, right]).tobytes()
        body = (
            struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 8000, 32000, 4, 16)
            + struct.pack("<4sI", b"LIST", 4) + b"INFO"  # skipped chunk
            + struct.pack("<4sI", b"data", len(data)) + data
        )
        buf = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
        y, rate = decode_wav_pcm16(buf)
        assert rate == 8000
        exp = (left.astype(np.float64) + right) / 2 / 32768.0
        assert np.allclose(y, exp.astype(np.float32))

    def test_malformed_raise(self):
        import struct

        import numpy as np
        import pytest

        from gridfia_ray.codecs.wav import decode_wav_pcm16, encode_wav_pcm16

        with pytest.raises(ValueError):
            decode_wav_pcm16(b"RIFFxxxxJUNK")
        with pytest.raises(ValueError):
            decode_wav_pcm16(b"not a wav at all....")
        # truncated data chunk
        buf = bytearray(encode_wav_pcm16(np.zeros(100), 8000))
        with pytest.raises(ValueError):
            decode_wav_pcm16(bytes(buf[:-10]) )
        with pytest.raises(ValueError):
            encode_wav_pcm16(np.zeros((2, 5)), 8000)

    def test_zero_rate_rejected_not_fatal(self, ray_session):
        """A fmt chunk declaring rate 0 must flag its row, not divide by
        zero inside the actor (review r4)."""
        import struct

        import numpy as np
        import pyarrow as pa
        import pytest

        from gridfia_ray.codecs.wav import decode_wav_pcm16
        from gridfia_ray.stages.multimodal import AudioFeatureActor

        data = np.zeros(8, "<i2").tobytes()
        body = (
            struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 0, 0, 2, 16)
            + struct.pack("<4sI", b"data", len(data)) + data
        )
        bad = struct.pack("<4sI4s", b"RIFF", 4 + len(body), b"WAVE") + body
        with pytest.raises(ValueError):
            decode_wav_pcm16(bad)
        batch = pa.table(
            {"clip_id": pa.array([0], pa.int64()), "bytes": pa.array([bad], pa.binary())}
        )
        out = AudioFeatureActor()(batch)
        assert out["status"].to_pylist() == ["decode_error:wav"]

    def test_media_decoder_handles_wav(self, ray_session):
        """wav graduated from the stub list: the generic media path must
        decode a valid clip (1×n plane), not misreport decode_error."""
        import numpy as np
        import pyarrow as pa

        from gridfia_ray.codecs.wav import encode_wav_pcm16
        from gridfia_ray.stages.multimodal import ExternalMediaDecoder

        buf = encode_wav_pcm16(np.sin(np.linspace(0, 10, 400)), 8000)
        batch = pa.table(
            {
                "image_id": pa.array(["a/0/0", "a/0/1"], pa.string()),
                "bytes": pa.array([buf, b"RIFF\0\0\0\0WAVEbroken"], pa.binary()),
                "fmt": pa.array(["wav", "wav"], pa.string()),
                "h": pa.array([0, 0], pa.int32()),
                "w": pa.array([0, 0], pa.int32()),
            }
        )
        out = ExternalMediaDecoder()(batch)
        assert out["status"].to_pylist() == ["ok", "decode_error:wav"]
        assert out["h"][0].as_py() == 1 and out["w"][0].as_py() == 400

    def test_audio_feature_actor_error_protocol(self, ray_session):
        import numpy as np
        import pyarrow as pa

        from gridfia_ray.codecs.wav import encode_wav_pcm16
        from gridfia_ray.stages.multimodal import AudioFeatureActor

        good = encode_wav_pcm16(np.sin(np.linspace(0, 20, 1600)), 8000)
        batch = pa.table(
            {"clip_id": pa.array([0, 1], pa.int64()),
             "bytes": pa.array([good, b"RIFF\x00\x00\x00\x00WAVEbroken"], pa.binary())}
        )
        out = AudioFeatureActor()(batch)
        assert out["status"].to_pylist() == ["ok", "decode_error:wav"]
        assert out["n_samples"].to_pylist()[0] == 1600


class TestMp4Mjpeg:
    """ISO BMFF container + MJPEG sample codec (codecs/mp4): the video
    frame-sampling path with no external library."""

    @staticmethod
    def _frames(n=6, h=24, w=40):
        y, x = np.mgrid[0:h, 0:w]
        return [
            np.clip(120 + 70 * np.sin(x / 6.0 + i) + 50 * np.cos(y / 4.0 - i), 0, 255)
            for i in range(n)
        ]

    @classmethod
    def _clip(cls, n=6, fps=2.0, h=24, w=40):
        from gridfia_ray.codecs.jpeg import encode_jpeg_gray
        from gridfia_ray.codecs.mp4 import encode_mp4_mjpeg

        frames = cls._frames(n, h, w)
        jpegs = [encode_jpeg_gray(f, quality=95)[0] for f in frames]
        return encode_mp4_mjpeg(jpegs, width=w, height=h, fps=fps), jpegs, frames

    def test_roundtrip_sample_table(self):
        from gridfia_ray.codecs.mp4 import extract_sample, parse_mp4

        buf, jpegs, _ = self._clip(n=6, fps=2.0)
        t = parse_mp4(buf)
        assert t.codec == "jpeg"
        assert (t.width, t.height) == (40, 24)
        assert t.n_samples == 6
        assert t.duration_ms == 3000
        assert t.ts_ms.tolist() == [0, 500, 1000, 1500, 2000, 2500]
        for i, j in enumerate(jpegs):
            assert extract_sample(buf, t, i) == j

    def test_nearest_sample_lookup(self):
        from gridfia_ray.codecs.mp4 import parse_mp4, sample_index_at

        buf, _, _ = self._clip(n=4, fps=1.0)
        t = parse_mp4(buf)
        assert sample_index_at(t, 0) == 0
        assert sample_index_at(t, 999) == 0
        assert sample_index_at(t, 1000) == 1
        assert sample_index_at(t, 10**8) == 3
        assert sample_index_at(t, -5) == 0

    def test_decode_psnr(self):
        from gridfia_ray.codecs.mp4 import decode_frame_mjpeg, parse_mp4

        buf, _, frames = self._clip(n=3)
        t = parse_mp4(buf)
        for i, src in enumerate(frames):
            dec = decode_frame_mjpeg(buf, t, i)
            vmin, vmax = src.min(), src.max()
            g = np.rint((src - vmin) / (vmax - vmin) * 255.0)
            assert psnr(dec, g) >= 40.0

    def test_malformed_rejected(self):
        from gridfia_ray.codecs.mp4 import encode_mp4_mjpeg, parse_mp4

        with pytest.raises(ValueError):
            parse_mp4(b"not an mp4 at all")
        with pytest.raises(ValueError):
            parse_mp4(b"\x00\x00\x00\x08ftyp")  # ftyp only, no moov
        with pytest.raises(ValueError):
            encode_mp4_mjpeg([], 8, 8)
        with pytest.raises(ValueError):
            encode_mp4_mjpeg([b"not-a-jpeg"], 8, 8)
        buf, _, _ = self._clip(n=2)
        with pytest.raises(ValueError):
            parse_mp4(buf[: len(buf) // 2])  # truncated mid-moov... or mdat

    def test_truncated_sample_data_detected(self):
        """moov intact but mdat cut short: sample table points past EOF."""
        from gridfia_ray.codecs.mp4 import parse_mp4

        buf, _, _ = self._clip(n=2)
        # moov is last; splice out 100 bytes of mdat payload and keep moov
        moov_at = buf.rindex(b"moov") - 4
        bad = buf[: moov_at - 100] + buf[moov_at:]
        with pytest.raises(ValueError):
            parse_mp4(bad)


class TestWebpTile:
    """webp as a registry tile format (bmp8-style 8-bit scale)."""

    def test_registry_roundtrip(self):
        rng = np.random.RandomState(13)
        arr = (rng.rand(20, 28) * 340.0 - 20.0).astype(np.float32)
        buf, meta = encode_tile(arr, "webp")
        dec = decode_tile(buf, "webp", 20, 28, meta)
        # 8-bit quantized: within half a bin of the original
        bin_w = (meta["scale_vmax"] - meta["scale_vmin"]) / 255.0
        assert np.abs(dec - arr).max() <= bin_w / 2 + 1e-6
        assert psnr(dec, arr) >= 40.0

    def test_constant_tile(self):
        arr = np.full((8, 8), 7.25, np.float32)
        buf, meta = encode_tile(arr, "webp")
        dec = decode_tile(buf, "webp", 8, 8, meta)
        assert (dec == 7.25).all() or (dec == meta["scale_vmin"]).all()

    def test_nan_encodes_as_vmin(self):
        arr = np.array([[1.0, np.nan], [3.0, 2.0]], np.float32)
        buf, meta = encode_tile(arr, "webp")
        dec = decode_tile(buf, "webp", 2, 2, meta)
        assert dec[0, 1] == meta["scale_vmin"]
        assert abs(dec[1, 0] - 3.0) < 0.01


class TestMp4CraftedTables:
    """Crafted sample tables must fail fast with ValueError — never
    drive gigabyte allocations or return garbage offsets."""

    def test_fixed_stsz_count_bomb(self):
        import struct
        import time

        from gridfia_ray.codecs.jpeg import encode_jpeg_gray
        from gridfia_ray.codecs.mp4 import encode_mp4_mjpeg, parse_mp4

        frames = [np.full((8, 8), 100.0)]
        buf = bytearray(
            encode_mp4_mjpeg([encode_jpeg_gray(f)[0] for f in frames], 8, 8)
        )
        # splice the stsz full box: set sample_size=4, sample_count=50M
        at = bytes(buf).index(b"stsz") + 4
        struct.pack_into(">II", buf, at + 4, 4, 50_000_000)
        t0 = time.time()
        with pytest.raises(ValueError):
            parse_mp4(bytes(buf))
        assert time.time() - t0 < 1.0  # fails fast, no giant allocation

    def test_stsc_gap_and_zero_chunk_rejected(self):
        import struct

        from gridfia_ray.codecs.jpeg import encode_jpeg_gray
        from gridfia_ray.codecs.mp4 import encode_mp4_mjpeg, parse_mp4

        frames = [np.full((8, 8), 50.0), np.full((8, 8), 150.0)]
        base = encode_mp4_mjpeg([encode_jpeg_gray(f)[0] for f in frames], 8, 8)
        for first_chunk in (0, 2):  # 0 = negative index; 2 = chunk 1 uncovered
            buf = bytearray(base)
            at = bytes(buf).index(b"stsc") + 4
            # full box: verflags(4) entry_count(4) then (first, per, sdi)
            struct.pack_into(">I", buf, at + 8, first_chunk)
            with pytest.raises(ValueError):
                parse_mp4(bytes(buf))
