"""Multimodal payload stages: decode / resize / feature-extract plumbing.

Image-as-binary is the engine's native payload (the ``bytes`` column).
What is real here and runs in tests: the raw-f32/zlib/png16/tiff/bmp
decoders plus the pure-numpy baseline-JPEG grayscale codec, the
RIFF/PCM WAV audio codec, the ISO BMFF (MP4) MJPEG video container and
the VP8L (WebP lossless) decoder (``gridfia_ray.codecs``), block-mean
``ResizeActor``, statistical ``TileFeatureActor``,
``AudioFeatureActor`` and the real-decode ``FrameSampleActor``. Every
format from the original stub list has graduated; the one payload
VARIANT still needing an external library — lossy-VP8 webp — raises
``NotImplementedError`` at decode and surfaces as a ``stub:webp`` row,
and ``fake=True`` still produces deterministic pseudo-frames so
downstream plumbing is testable without building containers.

Lossy-VP8 is declared a PERMANENT stub (round-5 decision, r4 VERDICT
#8): a correct VP8 intra decoder needs the boolean arithmetic coder,
probability-tree-coded modes, 16 predictors, and the normative loop
filter — re-implementing libwebp is out of scope and easy to get
subtly wrong. The row-status contract (never a task failure; sibling
rows decode) is pinned in
tests/test_multimodal.py::TestLossyWebpPermanentStub.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from gridfia_ray.codecs.phash import content_hash64
from gridfia_ray.codecs.registry import FORMATS, decode_tile

# every declared stub has graduated to a real pure-python codec: jpeg
# (T.81 baseline, round-3 VERDICT #6), wav (RIFF/PCM), mp4 (ISO BMFF +
# MJPEG samples), webp (full VP8L lossless decoder). The one remaining
# genuinely-external case is the LOSSY webp payload (VP8 intra-frame
# coding needs libwebp) — those rows surface as stub:webp via
# NotImplementedError, per payload VARIANT rather than per format.
STUB_FORMATS = ()


class ResizeActor:
    """Block-mean downsample of decoded tiles (real, vectorized): emits
    ``pix_small`` (raw f32) of shape (out, out) per row. Rows sharing a
    tile shape (the common case — a store has ONE tile size) reduce as
    a single stacked (n, o, ·, o, ·) mean; mixed shapes just form
    smaller groups."""

    def __init__(self, out: int = 8):
        self.out = int(out)

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = batch["h"].to_numpy()
        ws = batch["w"].to_numpy()
        payloads = batch["pix"].to_pylist()
        small: list[bytes | None] = [None] * len(payloads)
        o = self.out
        for h, w in {(int(h), int(w)) for h, w in zip(hs, ws)}:
            idx = np.nonzero((hs == h) & (ws == w))[0]
            stack = np.frombuffer(
                b"".join(payloads[i] for i in idx), dtype="<f4"
            ).reshape(len(idx), h, w)
            th, tw = (h // o) * o, (w // o) * o
            # f64 accumulation: the block sum of f32 values is exactly
            # representable (24-bit mantissas + log2(block) carry bits
            # ≪ 53) and block counts are powers of two, so the mean is
            # EXACT before the single rounding back to f32 — which makes
            # the stage SQL-oracle-comparable (CAST(AVG(x) AS REAL))
            blk = (
                stack[:, :th, :tw]
                .astype(np.float64)
                .reshape(len(idx), o, th // o, o, tw // o)
                .mean(axis=(2, 4))
                .astype("<f4")
            )
            for j, i in enumerate(idx):
                small[i] = blk[j].tobytes()
        return batch.append_column("pix_small", pa.array(small, pa.binary()))


class TileFeatureActor:
    """Per-tile feature vector (real): mean/std/min/max/nonzero-frac and
    deciles of the decoded pixels — the 'feature extract' stage shape.
    Equal-length payloads (the common case) reduce as one stacked
    axis-1 pass; mixed lengths form smaller groups, empty rows emit
    zeros."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["pix"].to_pylist()
        sizes = np.asarray([len(p) for p in payloads])
        feats: list[list[float] | None] = [None] * len(payloads)
        for sz in np.unique(sizes):
            idx = np.nonzero(sizes == sz)[0]
            if sz == 0:
                for i in idx:
                    feats[i] = [0.0] * 15
                continue
            m = np.frombuffer(b"".join(payloads[i] for i in idx), dtype="<f4").astype(
                np.float64
            ).reshape(len(idx), sz // 4)
            qs = np.percentile(m, [10, 25, 50, 75, 90], axis=1).T
            block = np.column_stack(
                [
                    m.mean(axis=1),
                    m.std(axis=1),
                    m.min(axis=1),
                    m.max(axis=1),
                    np.count_nonzero(m, axis=1) / m.shape[1],
                    qs,
                    np.zeros((len(idx), 5)),
                ]
            )
            for j, i in enumerate(idx):
                feats[i] = block[j].tolist()
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float64(), 15))
        )


class FrameSampleActor:
    """Video frame sampling: one input row (a video payload) →
    ``n_frames`` output rows, uniform-stride policy. The Ray-side
    plumbing is real and the contract is the interesting part: this is
    a row-expanding stage (``flat_map`` semantics expressed as a
    map_batches table rebuild, keeping Arrow vectorization), emitting
    ``(image_id, frame_idx, frame_ts_ms, pix, h, w, status)`` so every
    downstream tile stage (resize, features, phash dedup) applies to
    frames unchanged.

    Decode is REAL for ISO BMFF payloads carrying an MJPEG video
    track (``codecs/mp4`` box parser + the pure-numpy T.81 decoder):
    sample times are uniform-stride over the TRACK's own duration, the
    nearest sample at-or-before each time is extracted from the stbl
    tables and decoded to raw 0..255. Non-BMFF payloads (or non-MJPEG
    sample codecs) need ffmpeg, absent here: they raise
    ``NotImplementedError`` per the build brief. ``fake=True``
    deterministically synthesizes frames from the payload hash +
    frame index so sampling policy, fan-out and schema are testable
    without any container."""

    def __init__(self, n_frames: int = 4, duration_ms: int = 10_000,
                 fake: bool = False, frame_size: int = 16):
        self.n_frames = int(n_frames)
        self.duration_ms = int(duration_ms)
        self.fake = fake
        self.frame_size = int(frame_size)
        self._tracks: dict[int, object] = {}

    def _sample_times(self) -> np.ndarray:
        """Uniform-stride mid-interval sample times (public standard:
        center of each of n equal segments)."""
        return self._sample_times_for(self.duration_ms)

    def _sample_times_for(self, duration_ms: int) -> np.ndarray:
        seg = duration_ms / self.n_frames
        return (np.arange(self.n_frames) * seg + seg / 2).astype(np.int64)

    def _decode_frame(self, payload: bytes, ts_ms: int) -> np.ndarray:
        from gridfia_ray.codecs import mp4 as _mp4

        if _mp4.probe_is_mp4(payload):
            track = self._track(payload)
            return _mp4.decode_frame_mjpeg(
                payload, track, _mp4.sample_index_at(track, int(ts_ms))
            )
        if not self.fake:
            raise NotImplementedError(
                "non-BMFF video decoding requires ffmpeg, not present in "
                "this environment; run with fake=True for plumbing tests"
            )
        seed = (content_hash64(payload) ^ (ts_ms * 0x9E3779B9)) & 0x7FFFFFFF
        rng = np.random.RandomState(seed)
        return rng.rand(self.frame_size, self.frame_size).astype(np.float32)

    def _track(self, payload: bytes):
        """Parse the box tree once per payload (per-actor LRU: a batch
        visits each clip n_frames times). Keyed by (hash, length) — a
        bare 64-bit content hash could collide across clips and silently
        serve another clip's sample table."""
        from gridfia_ray.codecs import mp4 as _mp4

        key = (content_hash64(payload), len(payload))
        t = self._tracks.get(key)
        if t is None:
            t = _mp4.parse_mp4(payload)
            while len(self._tracks) >= 256:
                self._tracks.pop(next(iter(self._tracks)))
            self._tracks[key] = t
        return t

    def __call__(self, batch: pa.Table) -> pa.Table:
        from gridfia_ray.codecs import mp4 as _mp4

        ids, fidx, fts, pix, hs, ws, status = [], [], [], [], [], [], []
        default_times = self._sample_times()
        for i in range(batch.num_rows):
            image_id = batch["image_id"][i].as_py()
            payload = batch["bytes"][i].as_py()
            times = default_times
            if _mp4.probe_is_mp4(payload):
                try:
                    times = self._sample_times_for(
                        max(1, self._track(payload).duration_ms)
                    )
                except (ValueError, IndexError, KeyError):
                    pass  # malformed container: per-frame decode flags it
            for j, t in enumerate(times):
                ids.append(image_id)
                fidx.append(j)
                fts.append(int(t))
                try:
                    arr = self._decode_frame(payload, int(t))
                    pix.append(arr.astype("<f4").tobytes())
                    hs.append(arr.shape[0])
                    ws.append(arr.shape[1])
                    status.append("ok")
                except NotImplementedError:
                    pix.append(b"")
                    hs.append(0)
                    ws.append(0)
                    status.append("stub:video")
                except Exception as exc:  # DecoderActor convention: one
                    pix.append(b"")  # bad payload -> sentinel row, the
                    hs.append(0)  # batch task survives
                    ws.append(0)
                    status.append(f"decode_error:{type(exc).__name__}")
        return pa.table(
            {
                "image_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame_ts_ms": pa.array(fts, pa.int64()),
                "pix": pa.array(pix, pa.binary()),
                "h": pa.array(hs, pa.int32()),
                "w": pa.array(ws, pa.int32()),
                "status": pa.array(status, pa.string()),
            }
        )


class ExternalMediaDecoder:
    """Media-payload decoder: REAL for every ``codecs.FORMATS`` entry
    (incl. baseline JPEG grayscale — decoded as raw 0..255 since media
    payloads carry no float caption scale), for ``wav`` audio (RIFF/PCM
    via ``codecs.wav``, emitted as a 1×n sample plane so the generic
    downstream stages apply), for ``mp4`` MJPEG video (poster-frame
    decode via ``codecs.mp4``) and for ``webp`` lossless (full VP8L
    decoder, ``codecs.webp``).

    Plumbing is real throughout: binary in, (h, w, raw-f32) out,
    actor-pool state in ``__init__``. Lossy-VP8 webp payloads — the one
    variant that genuinely needs libwebp — raise ``NotImplementedError``
    and surface as ``stub:webp`` rows; ``fake=True`` substitutes a
    deterministic pseudo-image for non-container payloads (keeps
    schema/batch-size/actor wiring testable end to end).
    """

    def __init__(self, fake: bool = False, fake_size: int = 16):
        self.fake = fake
        self.fake_size = int(fake_size)

    def decode(self, payload: bytes, fmt: str) -> np.ndarray:
        # webp is both a tile-store format (caption-scaled, via
        # DecoderActor) and a media payload (raw gray, handled here)
        if fmt in FORMATS and fmt != "webp":
            raise ValueError("use DecoderActor for native formats")
        if fmt == "wav":
            from gridfia_ray.codecs.wav import decode_wav_pcm16

            samples, _rate = decode_wav_pcm16(payload)
            return samples[None, :]
        if fmt == "mp4":
            # poster-frame decode: first sample of the MJPEG track
            from gridfia_ray.codecs import mp4 as _mp4

            if not _mp4.probe_is_mp4(payload) and self.fake:
                return self._fake_image(payload)
            track = _mp4.parse_mp4(payload)
            return _mp4.decode_frame_mjpeg(payload, track, 0)
        if fmt == "webp":
            # full VP8L (lossless) decoder; lossy VP8 raises
            # NotImplementedError inside -> per-row stub:webp status
            from gridfia_ray.codecs.webp import decode_webp_gray

            if payload[:4] != b"RIFF" and self.fake:
                return self._fake_image(payload)
            return decode_webp_gray(payload)
        raise ValueError(f"unknown media format {fmt!r}")

    def _fake_image(self, payload: bytes) -> np.ndarray:
        seed = content_hash64(payload) & 0x7FFFFFFF
        rng = np.random.RandomState(seed)
        return rng.rand(self.fake_size, self.fake_size).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct

        pix, hs, ws, status = [], [], [], []
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            try:
                if fmt in FORMATS and fmt != "webp":
                    arr = decode_tile(
                        batch["bytes"][i].as_py(),
                        fmt,
                        int(batch["h"][i].as_py()),
                        int(batch["w"][i].as_py()),
                    )
                else:
                    arr = self.decode(batch["bytes"][i].as_py(), fmt)
                pix.append(arr.astype("<f4").tobytes())
                hs.append(arr.shape[0])
                ws.append(arr.shape[1])
                status.append("ok")
            except NotImplementedError:
                pix.append(b"")
                hs.append(0)
                ws.append(0)
                status.append(f"stub:{fmt}")
            except (ValueError, IndexError, KeyError, struct.error):
                # malformed media payload: one corrupt row must flag
                # itself, not kill the whole actor task — the status
                # column IS the error protocol
                pix.append(b"")
                hs.append(0)
                ws.append(0)
                status.append(f"decode_error:{fmt}")
        return pa.table(
            {
                "image_id": batch["image_id"],
                "h": pa.array(hs, pa.int32()),
                "w": pa.array(ws, pa.int32()),
                "pix": pa.array(pix, pa.binary()),
                "status": pa.array(status, pa.string()),
            }
        )


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Per-clip features from decoded mono float32 samples — THE
    feature math, shared by the distributed ``AudioFeatureActor`` and
    the sequential pin replay (oracle_pins) so both always agree:
    deterministic f64 reductions per clip, independent of batching."""
    x = np.asarray(samples, np.float64)
    n = int(x.size)
    rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
    peak = float(np.max(np.abs(x))) if n else 0.0
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0
    return {
        "n_samples": n,
        "rate": int(rate),
        "duration_ms": n * 1000 // int(rate),
        "rms_u": int(np.floor(rms * 1_000_000 + 0.5)),
        "peak_u": int(np.floor(peak * 1_000_000 + 0.5)),
        "zero_crossings": zc,
    }


_SPEC_NFFT = 64  # frame length (samples)
_SPEC_HOP = 32  # 50% overlap
_SPEC_BINS = 8  # DFT bins 0..7 (energy summary, not full resolution)
_SPEC_Q = 14  # table quantization: floor(v·2^14 + 0.5)


def spectrogram_tables() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantized Hann window + DFT cos/sin tables (int64 at 2^14) — THE
    tables, built identically by the pin replay and every actor (same
    elementwise np.cos call shape, so they are bit-identical)."""
    n = _SPEC_NFFT
    k = np.arange(_SPEC_BINS, dtype=np.float64)[:, None]
    t = np.arange(n, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * k * t / n
    cos_q = np.floor(np.cos(ang) * (1 << _SPEC_Q) + 0.5).astype(np.int64)
    sin_q = np.floor(np.sin(ang) * (1 << _SPEC_Q) + 0.5).astype(np.int64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n, dtype=np.float64) / n)
    w_q = np.floor(w * (1 << _SPEC_Q) + 0.5).astype(np.int64)
    return cos_q, sin_q, w_q


def spectrogram_features(
    samples: np.ndarray,
    tables: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
) -> dict:
    """Per-clip integer STFT energy summary: Hann-windowed 64-sample
    frames at hop 32, 8 DFT bins, per-bin energy summed over frames —
    ALL arithmetic int64 (quantize → multiply → arithmetic shift), so
    the distributed pool reproduces the sequential pin bit-for-bit.

    Headroom: q15 samples (≤2^15) × q14 window >>14 ≤ 2^15; a 64-term
    dot with q14 tables ≤ 2^35, >>14 ≤ 2^21; squared ≤ 2^43; summed
    over ≤2^20 frames ≤ 2^63 — no wraparound inside any supported clip.
    """
    cos_q, sin_q, w_q = tables if tables is not None else spectrogram_tables()
    x = np.asarray(samples, np.float64)
    xq = np.floor(x * 32768.0 + 0.5).astype(np.int64)
    n = int(xq.size)
    out = {"n_frames": 0, **{f"e{b}": 0 for b in range(_SPEC_BINS)}}
    if n < _SPEC_NFFT:
        return out
    nf = 1 + (n - _SPEC_NFFT) // _SPEC_HOP
    idx = np.arange(nf)[:, None] * _SPEC_HOP + np.arange(_SPEC_NFFT)[None, :]
    wx = (xq[idx] * w_q[None, :]) >> _SPEC_Q  # (nf, 64)
    re = (wx @ cos_q.T) >> _SPEC_Q  # (nf, 8) — exact int64 matmul
    im = (wx @ sin_q.T) >> _SPEC_Q
    tot = (re * re + im * im).sum(axis=0)
    out["n_frames"] = nf
    for b in range(_SPEC_BINS):
        out[f"e{b}"] = int(tot[b])
    return out


class SpectrogramActor:
    """Audio spectrogram stage (actor pool): WAV/PCM rows → per-clip
    frame count + 8 integer bin energies. Tables build once per actor
    (``__init__``), decode errors flag their row via ``status``."""

    def __init__(self):
        self.tables = spectrogram_tables()

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct

        from gridfia_ray.codecs.wav import decode_wav_pcm16

        keys = ["n_frames", *[f"e{b}" for b in range(_SPEC_BINS)]]
        cols: dict[str, list] = {k: [] for k in keys}
        status = []
        for i in range(batch.num_rows):
            try:
                samples, _rate = decode_wav_pcm16(batch["bytes"][i].as_py())
                f = spectrogram_features(samples, self.tables)
                for k in keys:
                    cols[k].append(f[k])
                status.append("ok")
            except (ValueError, struct.error):
                for k in keys:
                    cols[k].append(0)
                status.append("decode_error:wav")
        return pa.table(
            {
                "clip_id": batch["clip_id"],
                **{k: pa.array(v, pa.int64()) for k, v in cols.items()},
                "status": pa.array(status, pa.string()),
            }
        )


class AudioFeatureActor:
    """Audio-column feature extraction (REAL — wav graduated from the
    stub list): WAV/PCM payload rows (clip_id, bytes) → per-clip
    n_samples / rate / duration_ms / scaled RMS / scaled peak /
    zero-crossing count. Decode is ``codecs.wav`` (pure-numpy RIFF
    parser); malformed payloads flag their own row via ``status``
    instead of killing the task — the same error protocol as the tile
    and media decoders."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import struct

        from gridfia_ray.codecs.wav import decode_wav_pcm16

        cols: dict[str, list] = {
            "n_samples": [], "rate": [], "duration_ms": [],
            "rms_u": [], "peak_u": [], "zero_crossings": [],
        }
        status = []
        for i in range(batch.num_rows):
            try:
                samples, rate = decode_wav_pcm16(batch["bytes"][i].as_py())
                f = audio_features(samples, rate)
                for k in cols:
                    cols[k].append(f[k])
                status.append("ok")
            except (ValueError, struct.error):
                for k in cols:
                    cols[k].append(0)
                status.append("decode_error:wav")
        return pa.table(
            {
                "clip_id": batch["clip_id"],
                **{k: pa.array(v, pa.int64()) for k, v in cols.items()},
                "status": pa.array(status, pa.string()),
            }
        )


# --- integer audio resampling (2:1 decimation) ------------------------------

_RS_TAPS_N = 31
_RS_Q = 15  # Q15 tap quantization


def resample_taps_q15() -> np.ndarray:
    """31-tap Hamming-windowed sinc lowpass at half the input Nyquist
    (the 2:1 anti-alias filter), unity-DC-normalized then quantized to
    Q15 int64 — THE filter, shared by the distributed actor and the
    sequential pin replay (module-level pure function of constants, so
    the bits cannot drift)."""
    m = (_RS_TAPS_N - 1) / 2.0
    k = np.arange(_RS_TAPS_N) - m
    h = 0.5 * np.sinc(k / 2.0) * np.hamming(_RS_TAPS_N)
    h = h / h.sum()
    return np.floor(h * (1 << _RS_Q) + 0.5).astype(np.int64)


def decimate2_int16(i16: np.ndarray) -> np.ndarray:
    """Exact integer 2:1 decimation: zero-padded Q15 FIR at even
    positions, round-half-up via ``(acc + 2^14) >> 15`` (arithmetic
    shift = floor on negatives — identical in any int64 runtime),
    clipped to int16."""
    taps = resample_taps_q15()
    n = int(i16.size)
    if n == 0:
        return np.zeros(0, np.int16)
    pad = _RS_TAPS_N // 2
    xp = np.zeros(n + 2 * pad, np.int64)
    xp[pad : pad + n] = i16.astype(np.int64)
    n_out = (n + 1) // 2
    idx = 2 * np.arange(n_out)[:, None] + np.arange(_RS_TAPS_N)[None, :]
    acc = (xp[idx] * taps[None, :]).sum(axis=1)
    out = (acc + (1 << (_RS_Q - 1))) >> _RS_Q
    return np.clip(out, -32768, 32767).astype(np.int16)


class AudioResampleActor:
    """Normalize a mixed-rate WAV corpus to ``target_rate``: clips
    already at the target pass through bit-identically; clips at
    exactly 2× decimate through :func:`decimate2_int16`; any other
    ratio raises (integer-exactness is the contract — arbitrary-ratio
    polyphase would need float phases). Emits the resampled WAV bytes
    plus the standard feature row of the result."""

    def __init__(self, target_rate: int = 8000):
        self.target = int(target_rate)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from gridfia_ray.codecs.wav import decode_wav_pcm16, encode_wav_pcm16

        ids = batch["clip_id"].to_numpy()
        bufs = batch["bytes"].to_pylist()
        rows = []
        out_bufs = []
        for i in range(batch.num_rows):
            x, rate = decode_wav_pcm16(bufs[i])
            # MONO-ONLY contract: decode_wav_pcm16 channel-MEANS stereo
            # to half-integer samples, so "recover the int16 losslessly"
            # only holds for mono input. Verify by round-trip instead of
            # trusting the header: anything np.rint would re-quantize
            # (round-half-even) is rejected, not silently altered.
            xf = np.asarray(x, np.float64) * 32768.0
            i16 = np.rint(xf).astype(np.int64)
            if not np.array_equal(i16.astype(np.float64), xf):
                raise ValueError(
                    "audio_resample: samples are not exact int16 "
                    "multiples (stereo downmix?) — the bit-identical "
                    "passthrough contract is mono 16-bit PCM only"
                )
            if rate == self.target:
                out = i16.astype(np.int16)
            elif rate == 2 * self.target:
                out = decimate2_int16(i16)
            else:
                raise ValueError(
                    f"audio_resample: unsupported ratio {rate} → "
                    f"{self.target} (integer 2:1 or passthrough only)"
                )
            out_bufs.append(
                encode_wav_pcm16(out.astype(np.float64) / 32768.0, self.target)
            )
            rows.append(
                {
                    "clip_id": int(ids[i]),
                    **audio_features(
                        out.astype(np.float64) / 32768.0, self.target
                    ),
                }
            )
        schema = pa.schema(
            [
                ("clip_id", pa.int64()),
                ("n_samples", pa.int64()),
                ("rate", pa.int64()),
                ("duration_ms", pa.int64()),
                ("rms_u", pa.int64()),
                ("peak_u", pa.int64()),
                ("zero_crossings", pa.int64()),
            ]
        )
        # explicit schema: from_pylist([]) on an empty batch would emit
        # a COLUMNLESS table and break the appended-bytes layout
        t = pa.Table.from_pylist(rows, schema=schema)
        return t.append_column("bytes", pa.array(out_bufs, pa.binary()))
