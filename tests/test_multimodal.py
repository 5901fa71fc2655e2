"""Multimodal stage plumbing: resize, features, stubbed external codecs."""

import numpy as np
import pyarrow as pa
import pytest

from gridfia_ray.stages.multimodal import (
    ExternalMediaDecoder,
    ResizeActor,
    TileFeatureActor,
)


def _decoded_batch():
    rng = np.random.RandomState(0)
    arr = (rng.rand(64, 64) * 10).astype("<f4")
    return pa.table(
        {
            "image_id": ["a"],
            "h": pa.array([64], pa.int32()),
            "w": pa.array([64], pa.int32()),
            "pix": pa.array([arr.tobytes()], pa.binary()),
        }
    ), arr


class TestResize:
    def test_block_mean(self):
        batch, arr = _decoded_batch()
        out = ResizeActor(out=8)(batch)
        small = np.frombuffer(out["pix_small"][0].as_py(), dtype="<f4").reshape(8, 8)
        expect = arr.reshape(8, 8, 8, 8).mean(axis=(1, 3))
        assert np.allclose(small, expect, atol=1e-6)


class TestFeatures:
    def test_stats_vector(self):
        batch, arr = _decoded_batch()
        out = TileFeatureActor()(batch)
        f = np.asarray(out["features"][0].as_py())
        a = arr.astype(np.float64)
        assert f[0] == pytest.approx(a.mean())
        assert f[1] == pytest.approx(a.std())
        assert f[4] == pytest.approx(np.count_nonzero(a) / a.size)
        assert f[7] == pytest.approx(np.percentile(a, 50))


class TestExternalStub:
    def test_lossy_webp_raises_not_implemented(self):
        """VP8L is a real decoder now; only lossy VP8 needs libwebp."""
        import struct

        chunk = b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        buf = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        with pytest.raises(NotImplementedError):
            ExternalMediaDecoder().decode(buf, "webp")

    def test_lossless_webp_is_real_now(self):
        from gridfia_ray.codecs.webp import encode_webp_gray

        rng = np.random.RandomState(9)
        a = np.rint(rng.rand(12, 20) * 255)
        batch = pa.table(
            {
                "image_id": ["w"],
                "bytes": pa.array([encode_webp_gray(a)], pa.binary()),
                "h": pa.array([12], pa.int32()),
                "w": pa.array([20], pa.int32()),
                "fmt": ["webp"],
            }
        )
        out = ExternalMediaDecoder(fake=False)(batch)
        assert out["status"].to_pylist() == ["ok"]
        got = np.frombuffer(out["pix"][0].as_py(), "<f4").reshape(12, 20)
        assert np.array_equal(got, a)  # lossless round trip through the pool

    def test_jpeg_is_real_now(self):
        """jpeg graduated from stub to the pure-numpy T.81 codec: a real
        jpeg payload decodes through the media path (raw 0..255)."""
        from gridfia_ray.codecs.jpeg import encode_jpeg_gray

        rng = np.random.RandomState(5)
        a = (rng.rand(24, 24) * 200).astype(np.float32)
        buf, _, _ = encode_jpeg_gray(a)
        batch = pa.table(
            {
                "image_id": ["j"],
                "bytes": pa.array([buf], pa.binary()),
                "h": pa.array([24], pa.int32()),
                "w": pa.array([24], pa.int32()),
                "fmt": ["jpeg"],
            }
        )
        out = ExternalMediaDecoder()(batch)
        assert out["status"].to_pylist() == ["ok"]
        got = np.frombuffer(out["pix"][0].as_py(), "<f4").reshape(24, 24)
        assert got.min() >= 0.0 and got.max() <= 255.0

    def test_unknown_format_rejected(self):
        with pytest.raises(ValueError):
            ExternalMediaDecoder().decode(b"", "tiff-ycbcr")

    def test_fake_mode_deterministic_and_batch_plumbing(self):
        batch = pa.table(
            {
                "image_id": ["x", "y"],
                "bytes": pa.array([b"payload-1", b"payload-2"], pa.binary()),
                "h": pa.array([0, 0], pa.int32()),
                "w": pa.array([0, 0], pa.int32()),
                "fmt": ["mp4", "webp"],
            }
        )
        d1 = ExternalMediaDecoder(fake=True)(batch)
        d2 = ExternalMediaDecoder(fake=True)(batch)
        assert d1["pix"][0].as_py() == d2["pix"][0].as_py()  # seeded by payload
        assert d1["pix"][0].as_py() != d1["pix"][1].as_py()
        assert d1["status"].to_pylist() == ["ok", "ok"]
        assert d1["h"].to_pylist() == [16, 16]

    def test_stub_mode_flags_rows(self):
        batch = pa.table(
            {
                "image_id": ["x", "y"],
                "bytes": pa.array([b"zz", b"zz"], pa.binary()),
                "h": pa.array([0, 0], pa.int32()),
                "w": pa.array([0, 0], pa.int32()),
                "fmt": ["webp", "mp4"],
            }
        )
        out = ExternalMediaDecoder(fake=False)(batch)
        # webp and mp4 are real codecs now: malformed payloads are
        # per-row decode errors, not stubs
        assert out["status"].to_pylist() == ["decode_error:webp", "decode_error:mp4"]

    def test_native_format_passthrough(self):
        from gridfia_ray.codecs.registry import encode_tile

        arr = np.arange(16, dtype=np.float32).reshape(4, 4)
        payload, _ = encode_tile(arr, "raw-f32")
        batch = pa.table(
            {
                "image_id": ["n"],
                "bytes": pa.array([payload], pa.binary()),
                "h": pa.array([4], pa.int32()),
                "w": pa.array([4], pa.int32()),
                "fmt": ["raw-f32"],
            }
        )
        out = ExternalMediaDecoder(fake=True)(batch)
        got = np.frombuffer(out["pix"][0].as_py(), dtype="<f4").reshape(4, 4)
        assert np.array_equal(got, arr)


class TestFrameSample:
    def _video_batch(self, n=2):
        rng = np.random.RandomState(3)
        return pa.table(
            {
                "image_id": [f"vid/{i}" for i in range(n)],
                "bytes": pa.array([rng.bytes(256) for _ in range(n)], pa.binary()),
                "fmt": ["mp4"] * n,
            }
        )

    def test_uniform_stride_times(self):
        from gridfia_ray.stages.multimodal import FrameSampleActor

        a = FrameSampleActor(n_frames=4, duration_ms=8000, fake=True)
        assert a._sample_times().tolist() == [1000, 3000, 5000, 7000]

    def test_fanout_schema_and_determinism(self):
        from gridfia_ray.stages.multimodal import FrameSampleActor

        batch = self._video_batch(2)
        a = FrameSampleActor(n_frames=3, fake=True)
        out = a(batch)
        assert out.num_rows == 6  # 2 videos x 3 frames
        assert out["frame_idx"].to_pylist() == [0, 1, 2, 0, 1, 2]
        assert set(out["status"].to_pylist()) == {"ok"}
        # deterministic: same payload + frame time -> same frame bytes
        out2 = a(batch)
        assert out["pix"].to_pylist() == out2["pix"].to_pylist()
        # distinct frames within one video
        assert out["pix"][0].as_py() != out["pix"][1].as_py()

    def test_stub_mode_flags_rows(self):
        from gridfia_ray.stages.multimodal import FrameSampleActor

        out = FrameSampleActor(n_frames=2, fake=False)(self._video_batch(1))
        assert out["status"].to_pylist() == ["stub:video"] * 2
        assert out["pix"].to_pylist() == [b"", b""]

    def test_frames_feed_downstream_stages(self):
        """Sampled frames flow into the standard tile feature stage."""
        from gridfia_ray.stages.multimodal import FrameSampleActor, TileFeatureActor

        frames = FrameSampleActor(n_frames=2, fake=True)(self._video_batch(2))
        feats = TileFeatureActor()(frames)
        assert feats["features"].to_pylist()  # 4 rows, 15-dim each
        assert all(len(f) == 15 for f in feats["features"].to_pylist())

    def test_corrupt_payload_flags_row_not_task(self):
        """A malformed jpeg/png payload must flag its own row via the
        status column, never kill the actor task (code-review r4)."""
        from gridfia_ray.codecs.jpeg import encode_jpeg_gray

        good, _, _ = encode_jpeg_gray(np.ones((8, 8), np.float32))
        batch = pa.table(
            {
                "image_id": ["bad1", "bad2", "good"],
                "bytes": pa.array(
                    [b"\xff\xd8\xff\xdb junk", b"\x89PNG\r\n\x1a\n junk", good],
                    pa.binary(),
                ),
                "h": pa.array([8, 8, 8], pa.int32()),
                "w": pa.array([8, 8, 8], pa.int32()),
                "fmt": ["jpeg", "png", "jpeg"],
            }
        )
        out = ExternalMediaDecoder()(batch)
        st = out["status"].to_pylist()
        assert st[0].startswith("decode_error:") and st[1].startswith("decode_error:")
        assert st[2] == "ok"


class TestFrameSampleRealMp4:
    """mp4 graduated from the stub list: FrameSampleActor decodes MJPEG
    ISO BMFF payloads for real via codecs/mp4 + the T.81 decoder."""

    @staticmethod
    def _clip_batch():
        from gridfia_ray.codecs.jpeg import encode_jpeg_gray
        from gridfia_ray.codecs.mp4 import encode_mp4_mjpeg

        y, x = np.mgrid[0:16, 0:24]
        frames = [np.clip(100 + 90 * np.sin(x / 5.0 + i), 0, 255) for i in range(8)]
        jpegs = [encode_jpeg_gray(f, quality=95)[0] for f in frames]
        buf = encode_mp4_mjpeg(jpegs, width=24, height=16, fps=4.0)  # 2 s clip
        return (
            pa.table(
                {
                    "image_id": ["clip/real"],
                    "bytes": pa.array([buf], pa.binary()),
                    "fmt": ["mp4"],
                }
            ),
            buf,
            frames,
        )

    def test_real_decode_and_track_duration_times(self):
        from gridfia_ray.codecs.mp4 import (
            decode_frame_mjpeg,
            parse_mp4,
            sample_index_at,
        )
        from gridfia_ray.stages.multimodal import FrameSampleActor

        batch, buf, _ = self._clip_batch()
        out = FrameSampleActor(n_frames=4, fake=False)(batch)
        assert out.num_rows == 4
        assert out["status"].to_pylist() == ["ok"] * 4
        # times follow the TRACK duration (2000 ms), not the default 10 s
        assert out["frame_ts_ms"].to_pylist() == [250, 750, 1250, 1750]
        assert out["h"].to_pylist() == [16] * 4 and out["w"].to_pylist() == [24] * 4
        # each emitted frame equals the sequential parse+decode replay
        track = parse_mp4(buf)
        for j, t in enumerate(out["frame_ts_ms"].to_pylist()):
            exp = decode_frame_mjpeg(buf, track, sample_index_at(track, t))
            got = np.frombuffer(out["pix"][j].as_py(), dtype="<f4").reshape(16, 24)
            assert np.array_equal(got, exp)

    def test_distinct_samples_selected(self):
        from gridfia_ray.stages.multimodal import FrameSampleActor

        batch, _, _ = self._clip_batch()
        out = FrameSampleActor(n_frames=4, fake=False)(batch)
        pix = out["pix"].to_pylist()
        assert len({p for p in pix}) == 4  # 8 samples / 4 picks -> all distinct

    def test_malformed_bmff_flags_row(self):
        from gridfia_ray.stages.multimodal import FrameSampleActor

        batch = pa.table(
            {
                "image_id": ["bad"],
                # valid ftyp probe, garbage after -> parse error per frame
                "bytes": pa.array(
                    [b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00garbage"], pa.binary()
                ),
                "fmt": ["mp4"],
            }
        )
        out = FrameSampleActor(n_frames=2, fake=False)(batch)
        assert all(s.startswith("decode_error:") for s in out["status"].to_pylist())

    def test_poster_frame_via_external_decoder(self):
        from gridfia_ray.codecs.mp4 import decode_frame_mjpeg, parse_mp4
        from gridfia_ray.stages.multimodal import ExternalMediaDecoder

        batch, buf, _ = self._clip_batch()
        full = pa.table(
            {
                "image_id": batch["image_id"],
                "bytes": batch["bytes"],
                "h": pa.array([0], pa.int32()),
                "w": pa.array([0], pa.int32()),
                "fmt": batch["fmt"],
            }
        )
        out = ExternalMediaDecoder(fake=False)(full)
        assert out["status"].to_pylist() == ["ok"]
        exp = decode_frame_mjpeg(buf, parse_mp4(buf), 0)
        got = np.frombuffer(out["pix"][0].as_py(), dtype="<f4").reshape(16, 24)
        assert np.array_equal(got, exp)


class TestSpectrogram:
    def test_pure_tone_concentrates_in_its_bin(self):
        from gridfia_ray.stages.multimodal import (
            _SPEC_NFFT,
            spectrogram_features,
        )

        # bin k corresponds to frequency k/NFFT cycles per sample
        n = 2048
        k = 3
        x = 0.7 * np.sin(2 * np.pi * k * np.arange(n) / _SPEC_NFFT)
        f = spectrogram_features(x)
        energies = [f[f"e{b}"] for b in range(8)]
        assert np.argmax(energies) == k
        # Hann leakage: adjacent bins carry ~1/4 of the center energy,
        # everything further is negligible
        for b in (k - 1, k + 1):
            assert energies[b] == pytest.approx(energies[k] / 4, rel=0.05)
        far = sum(e for b, e in enumerate(energies) if abs(b - k) > 1)
        assert far < energies[k] / 100

    def test_short_and_silent_clips(self):
        from gridfia_ray.stages.multimodal import spectrogram_features

        f = spectrogram_features(np.zeros(10))  # shorter than one frame
        assert f["n_frames"] == 0 and all(f[f"e{b}"] == 0 for b in range(8))
        f = spectrogram_features(np.zeros(1000))
        assert f["n_frames"] == 1 + (1000 - 64) // 32
        assert all(f[f"e{b}"] == 0 for b in range(8))

    def test_full_scale_headroom(self):
        from gridfia_ray.stages.multimodal import spectrogram_features

        # worst case: full-scale DC-ish signal, long clip — no wraparound
        x = np.ones(200_000) * 0.999969482421875  # 32767/32768
        f = spectrogram_features(x)
        assert f["e0"] > 0
        assert all(f[f"e{b}"] >= 0 for b in range(8))

    def test_actor_matches_sequential(self, ray_session):
        import ray.data as rd

        from gridfia_ray.codecs.wav import decode_wav_pcm16, encode_wav_pcm16
        from gridfia_ray.stages.multimodal import (
            SpectrogramActor,
            spectrogram_features,
        )

        rng = np.random.RandomState(5)
        clips = [rng.uniform(-0.9, 0.9, rng.randint(50, 900)) for _ in range(12)]
        bufs = [encode_wav_pcm16(c, 8000) for c in clips]
        ds = rd.from_arrow(
            pa.table(
                {
                    "clip_id": pa.array(range(12), pa.int64()),
                    "bytes": pa.array(bufs, pa.binary()),
                }
            )
        ).repartition(4)
        out = (
            ds.map_batches(SpectrogramActor, batch_format="pyarrow", concurrency=(1, 2))
            .to_pandas()
            .sort_values("clip_id")
            .reset_index(drop=True)
        )
        assert (out["status"] == "ok").all()
        for i, buf in enumerate(bufs):
            samples, _ = decode_wav_pcm16(buf)
            exp = spectrogram_features(samples)
            for k, v in exp.items():
                assert out.loc[i, k] == v, (i, k)


class TestAudioResample:
    def test_filter_properties(self):
        import numpy as np

        from gridfia_ray.stages.multimodal import (
            decimate2_int16,
            resample_taps_q15,
        )

        taps = resample_taps_q15()
        assert len(taps) == 31 and taps[15] == taps.max()
        # DC preserved within quantization (Σtaps/2^15 ≈ 1)
        x = np.full(2000, 12000, np.int16)
        y = decimate2_int16(x)
        assert len(y) == 1000
        assert abs(int(y[100]) - 12000) <= 2
        # sub-Nyquist tone survives; aliased band is crushed
        t = np.arange(8000)
        lo = (10000 * np.sin(2 * np.pi * 500 * t / 16000)).astype(np.int16)
        hi = (10000 * np.sin(2 * np.pi * 7000 * t / 16000)).astype(np.int16)
        lo_rms = float(np.sqrt((decimate2_int16(lo).astype(float) ** 2).mean()))
        hi_rms = float(np.sqrt((decimate2_int16(hi).astype(float) ** 2).mean()))
        assert lo_rms > 6500
        assert hi_rms < 100

    def test_actor_matches_pin_and_rejects_odd_ratio(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from gridfia_ray import oracle_pins
        from gridfia_ray.codecs.wav import encode_wav_pcm16
        from gridfia_ray.contract import build_queries
        from gridfia_ray.stages.multimodal import AudioResampleActor

        got = build_queries()["audio_resample"]("unused")
        import duckdb

        exp = duckdb.sql(
            "SELECT * FROM read_parquet('"
            + oracle_pins.ensure_audpin()["resample_expected"]
            + "') ORDER BY clip_id"
        ).df()
        for c in got.columns:
            assert (got[c].to_numpy() == exp[c].to_numpy()).all(), c
        assert (got["rate"] == 8000).all()
        # unsupported ratio raises
        buf = encode_wav_pcm16(np.zeros(100), 44100)
        bad = rd.from_arrow(
            pa.table({"clip_id": pa.array([0], pa.int64()),
                      "bytes": pa.array([buf], pa.binary())})
        )
        import pytest as _pt

        with _pt.raises(Exception, match="unsupported ratio"):
            bad.map_batches(
                AudioResampleActor, batch_format="pyarrow", concurrency=1
            ).materialize()

    def test_actor_rejects_stereo_downmix_and_types_empty_batch(self):
        # stereo WAVs channel-mean to half-integer samples: the
        # bit-identical passthrough contract is mono-only, so the actor
        # must REJECT (not silently re-quantize via round-half-even)
        import struct

        import pyarrow as pa
        import pytest as _pt

        from gridfia_ray.stages.multimodal import AudioResampleActor

        n = 64
        left = np.full(n, 100, np.int16)
        right = np.full(n, 101, np.int16)  # mean = 100.5 → half-integer
        inter = np.empty(2 * n, np.int16)
        inter[0::2], inter[1::2] = left, right
        data = inter.tobytes()
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
            + b"data" + struct.pack("<I", len(data))
        )
        actor = AudioResampleActor(target_rate=8000)
        stereo = pa.table(
            {"clip_id": pa.array([1], pa.int64()),
             "bytes": pa.array([hdr + data], pa.binary())}
        )
        with _pt.raises(ValueError, match="mono"):
            actor(stereo)
        # zero-row batch keeps the full typed schema (from_pylist([])
        # would otherwise be columnless and break append_column)
        empty = stereo.slice(0, 0)
        out = actor(empty)
        assert out.num_rows == 0
        assert out.column_names == [
            "clip_id", "n_samples", "rate", "duration_ms",
            "rms_u", "peak_u", "zero_crossings", "bytes",
        ]


class TestLossyWebpPermanentStub:
    """Contract for the ONE declared-permanent stub (r4 VERDICT #8):
    lossy-VP8 webp genuinely requires libwebp (boolean-coded
    inter/intra prediction), which is not in this environment. The
    pipeline contract is: such payloads surface as per-row
    ``stub:webp`` status through the media decode pool — never a task
    failure — while sibling rows in the same batch decode normally."""

    def test_vp8_lossy_rows_flag_not_fail(self, ray_session):
        import struct

        import pyarrow as pa
        import ray.data as rd

        from gridfia_ray.codecs.webp import encode_webp_gray

        # a syntactically valid RIFF/WEBP container with a lossy 'VP8 '
        # chunk, and a REAL VP8L sibling that must still decode
        fake_vp8 = b"\x00" * 26
        lossy = (
            b"RIFF" + struct.pack("<I", 4 + 8 + len(fake_vp8)) + b"WEBP"
            + b"VP8 " + struct.pack("<I", len(fake_vp8)) + fake_vp8
        )
        img = np.arange(64, dtype=np.float32).reshape(8, 8) % 255
        lossless = encode_webp_gray(img)
        ds = rd.from_arrow(
            pa.table(
                {
                    "image_id": pa.array(["lossy", "lossless"]),
                    "bytes": pa.array([lossy, lossless], pa.binary()),
                    "fmt": pa.array(["webp", "webp"]),
                    "h": pa.array([0, 8], pa.int32()),
                    "w": pa.array([0, 8], pa.int32()),
                }
            )
        )
        out = (
            ds.map_batches(
                ExternalMediaDecoder, batch_format="pyarrow", concurrency=1
            )
            .to_pandas()
            .set_index("image_id")
        )
        assert out.loc["lossy", "status"] == "stub:webp"
        assert out.loc["lossy", "h"] == 0
        assert out.loc["lossless", "status"] == "ok"
        got = np.frombuffer(
            out.loc["lossless", "pix"], dtype="<f4"
        ).reshape(8, 8)
        np.testing.assert_array_equal(got, img)
