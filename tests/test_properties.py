"""Property-based tests (hypothesis) for the round-4 surfaces:
band-plan invariance of the interval join and JPEG codec robustness.
Ray-touching properties use few examples (each runs a real pipeline);
pure-numpy codec properties afford more."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


class TestJpegProperties:
    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
        scale=st.floats(0.001, 1e6),
    )
    def test_roundtrip_never_crashes_and_bounds_error(self, h, w, seed, scale):
        """Any float tile encodes to a parsable stream and decodes to the
        same shape; the absolute error is bounded by the quantization
        step times a DCT-safety factor."""
        from gridfia_ray.codecs.jpeg import decode_jpeg_gray, encode_jpeg_gray

        rng = np.random.RandomState(seed)
        arr = (rng.rand(h, w) * scale).astype(np.float32)
        buf, vmin, vmax = encode_jpeg_gray(arr, quality=95)
        out = decode_jpeg_gray(buf, vmin, vmax)
        assert out.shape == arr.shape
        if vmax > vmin:
            # q95 luminance quant values ≤ 12 in the low-frequency zone;
            # worst-case per-pixel error stays well under 6% of range on
            # random noise (empirically < 3%; assert with headroom)
            err = np.abs(out.astype(np.float64) - arr.astype(np.float64))
            assert err.max() <= 0.10 * (vmax - vmin) + 1e-9
        else:
            assert np.allclose(out, arr)

    @settings(max_examples=25, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=64))
    def test_garbage_raises_not_hangs(self, junk):
        from gridfia_ray.codecs.jpeg import decode_jpeg_gray

        if junk[:2] == b"\xff\xd8":
            junk = b"\x00\x00" + junk[2:]
        with pytest.raises(ValueError):
            decode_jpeg_gray(junk)

    @settings(max_examples=15, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        cut=st.integers(4, 200),
    )
    def test_truncated_stream_raises_or_decodes(self, seed, cut):
        """Truncating a valid stream must raise a clean error (or decode
        if the cut only removed trailing bytes) — never crash the
        interpreter or loop forever."""
        from gridfia_ray.codecs.jpeg import decode_jpeg_gray, encode_jpeg_gray

        rng = np.random.RandomState(seed)
        arr = (rng.rand(16, 16) * 100).astype(np.float32)
        buf, vmin, vmax = encode_jpeg_gray(arr)
        trunc = buf[: max(2, len(buf) - cut)]
        try:
            decode_jpeg_gray(trunc, vmin, vmax)
        except (ValueError, IndexError, struct_error_types()):
            pass

    @settings(max_examples=10, deadline=None)
    @given(seed=st.integers(0, 2**31 - 1))
    def test_deterministic(self, seed):
        from gridfia_ray.codecs.jpeg import encode_jpeg_gray

        rng = np.random.RandomState(seed)
        arr = (rng.rand(24, 24) * 50).astype(np.float32)
        assert encode_jpeg_gray(arr)[0] == encode_jpeg_gray(arr)[0]


def struct_error_types():
    import struct

    return struct.error


class TestBandingProperties:
    """The banded interval-join plan is a pure execution-plan change:
    for ANY positive band width the result set equals the unbanded
    oracle. Few examples — each spins a real Ray pipeline."""

    @pytest.mark.parametrize("band_width", [3.0, 47.0, 130.0, 1000.0, 1e7])
    def test_any_band_width_same_result(self, ray_session, band_width):
        import ray.data as rd

        from gridfia_ray.pipelines.joins import interval_join

        rng = np.random.RandomState(int(band_width) % 2**31)
        pts = pd.DataFrame(
            {"u": rng.randint(0, 6, 120).astype(np.int64),
             "t": rng.uniform(0, 500, 120),
             "pid": np.arange(120, dtype=np.int64)}
        )
        lo = rng.uniform(0, 480, 50)
        itv = pd.DataFrame(
            {"u": rng.randint(0, 6, 50).astype(np.int64),
             "lo": lo, "hi": lo + rng.uniform(0, 60, 50),
             "iid": np.arange(50, dtype=np.int64)}
        )
        got = (
            interval_join(
                rd.from_pandas(pts).repartition(3),
                rd.from_pandas(itv).repartition(2),
                by="u", on="t", lo="lo", hi="hi", n_buckets=8,
                band_width=band_width,
            )
            .to_pandas()[["pid", "iid"]]
            .sort_values(["pid", "iid"])
            .reset_index(drop=True)
            .astype(np.int64)
        )
        m = pts.merge(itv, on="u")
        want = (
            m.loc[(m["t"] >= m["lo"]) & (m["t"] <= m["hi"]), ["pid", "iid"]]
            .sort_values(["pid", "iid"])
            .reset_index(drop=True)
            .astype(np.int64)
        )
        pd.testing.assert_frame_equal(got, want)


class TestExtractJsonProperties:
    @settings(
        max_examples=20, deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vals=st.lists(
            st.one_of(
                st.integers(-(2**40), 2**40),
                st.floats(allow_nan=False, allow_infinity=False, width=32),
                st.text(
                    alphabet=st.characters(blacklist_categories=("Cs",)),
                    max_size=20,
                ),
                st.booleans(),
                st.none(),
            ),
            min_size=1, max_size=8,
        )
    )
    def test_matches_json_loads_semantics(self, ray_session, vals):
        """For arbitrary JSON payloads (nested or not), extract_json_int
        must agree with a plain json.loads top-level extraction."""
        import json

        import ray.data as rd

        from gridfia_ray.pipelines.events import extract_json_int

        payloads = []
        for i, v in enumerate(vals):
            obj = {"k": v} if i % 3 else {"outer": {"k": 999}, "k": v}
            if i % 4 == 0:
                obj = {"note": 'has "k": 7 lookalike', **obj}
            payloads.append(json.dumps(obj))
        df = pd.DataFrame(
            {"event_id": np.arange(len(payloads), dtype=np.int64),
             "props": payloads}
        )
        got = (
            extract_json_int(rd.from_pandas(df), "props", "k")
            .to_pandas()
            .sort_values("event_id")["k"]
            .tolist()
        )
        want = []
        for p in payloads:
            v = json.loads(p).get("k")
            want.append(
                v if isinstance(v, int) and not isinstance(v, bool) else None
            )
        norm = [x if x is not pd.NA and not pd.isna(x) else None for x in got]
        assert norm == want


class TestWebpProperties:
    """VP8L subset-encoder round trip and decoder fuzz safety."""

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 40),
        w=st.integers(1, 40),
        seed=st.integers(0, 2**31 - 1),
        sg=st.booleans(),
        lp=st.booleans(),
    )
    def test_roundtrip_exact(self, h, w, seed, sg, lp):
        from gridfia_ray.codecs.webp import decode_webp_gray, encode_webp_gray

        rng = np.random.RandomState(seed)
        a = np.rint(rng.rand(h, w) * 255)
        buf = encode_webp_gray(a, subtract_green=sg, left_predictor=lp)
        assert np.array_equal(decode_webp_gray(buf), a)

    @settings(max_examples=50, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=300))
    def test_decoder_never_crashes_unexpectedly(self, junk):
        """Arbitrary bytes (optionally wrapped in a plausible RIFF/VP8L
        shell) must raise ValueError/NotImplementedError — never
        IndexError/struct.error/infinite loop."""
        import struct

        from gridfia_ray.codecs.webp import decode_webp_gray

        wrapped = (
            b"RIFF"
            + struct.pack("<I", 4 + 8 + len(junk) + 1)
            + b"WEBP"
            + b"VP8L"
            + struct.pack("<I", len(junk) + 1)
            + b"\x2f"
            + junk
        )
        for payload in (junk, wrapped):
            try:
                decode_webp_gray(payload)
            except (ValueError, NotImplementedError):
                pass

    @settings(max_examples=50, deadline=None)
    @given(junk=st.binary(min_size=0, max_size=300))
    def test_mp4_parser_never_crashes_unexpectedly(self, junk):
        from gridfia_ray.codecs.mp4 import parse_mp4

        shells = (
            junk,
            b"\x00\x00\x00\x14ftypisom\x00\x00\x02\x00isom" + junk,
        )
        for payload in shells:
            try:
                parse_mp4(payload)
            except (ValueError, IndexError):
                # IndexError only from explicit range checks is fine;
                # struct.error / KeyError / OverflowError are not
                pass
