"""Pure-numpy WAV (RIFF / PCM) codec — the audio-column decode path.

Public format (Microsoft/IBM RIFF WAVE, the canonical PCM container):
``RIFF`` header → ``fmt `` chunk (PCM, mono/stereo, 16-bit) → ``data``
chunk of little-endian samples. No external audio library needed — the
same situation as the BMP/TIFF/JPEG tile codecs, so audio graduates
from a declared stub to a real codec.

Decode returns float32 samples in [-1, 1) plus the sample rate; encode
writes 16-bit PCM. Stereo decodes to the channel-mean mono track (the
feature stages are mono). Unknown chunks (LIST/fact/cue) are skipped by
size, as the spec requires.
"""

from __future__ import annotations

import struct

import numpy as np

_SCALE = 32768.0


def encode_wav_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """float array in [-1, 1] (mono) → 16-bit PCM WAV bytes."""
    if samples.ndim != 1:
        raise ValueError(f"mono encoder expects 1-D samples, got {samples.shape}")
    if rate < 1:
        raise ValueError(f"sample rate must be ≥ 1, got {rate}")
    # round-to-nearest (canonical PCM quantization), not truncation
    pcm = np.clip(np.round(np.asarray(samples, np.float64) * _SCALE), -32768, 32767)
    data = pcm.astype("<i2").tobytes()
    n = len(data)
    hdr = b"".join(
        [
            struct.pack("<4sI4s", b"RIFF", 36 + n, b"WAVE"),
            struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16),
            struct.pack("<4sI", b"data", n),
        ]
    )
    return hdr + data


def decode_wav_pcm16(buf: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (float32 mono samples in [-1, 1), sample rate)."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(buf):
        cid, size = struct.unpack_from("<4sI", buf, pos)
        pos += 8
        if pos + size > len(buf):
            raise ValueError(f"truncated {cid!r} chunk ({size} B past end)")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too short ({size} B)")
            fmt_tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", buf, pos
            )
            if fmt_tag != 1:
                raise ValueError(f"only PCM (format 1) supported, got {fmt_tag}")
            if bits != 16:
                raise ValueError(f"only 16-bit PCM supported, got {bits}")
            if channels not in (1, 2):
                raise ValueError(f"only mono/stereo supported, got {channels}")
            if rate < 1:
                raise ValueError(f"invalid sample rate {rate}")
        elif cid == b"data":
            data = buf[pos : pos + size]
        pos += size + (size & 1)  # chunks are word-aligned
    if rate is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    pcm = np.frombuffer(data, dtype="<i2")
    if channels == 2:
        if len(pcm) % 2:
            raise ValueError("stereo data chunk with odd sample count")
        pcm = pcm.reshape(-1, 2).mean(axis=1)
    return (np.asarray(pcm, np.float32) / np.float32(_SCALE)), int(rate)
