"""Pure-python ISO BMFF (MP4) container codec — the video-column path.

Public format (ISO/IEC 14496-12 "ISO base media file format", the MP4
box structure): ``ftyp`` → ``mdat`` (concatenated coded samples) →
``moov`` (``mvhd`` + one video ``trak`` whose ``stbl`` sample tables —
``stsd``/``stts``/``stsc``/``stsz``/``stco|co64`` — map every sample to
its file offset, byte size and decode timestamp). With Motion-JPEG as
the sample codec (``stsd`` fourcc ``jpeg``; each sample is a complete
baseline-JPEG image, decodable by ``codecs/jpeg.py``), the whole video
frame-sampling path needs no external library: video graduates from the
declared stub list the same way wav/jpeg did.

Reference parity: the reference delegates all media decode to
GDAL/rasterio (`gridfia/core/processors/base_processor.py` reads
rasters only; it has no video path at all) — this module exists for the
multimodal-column story the build brief requires, not as a port.

Writer emits one self-contained chunk (offsets known up front: samples
start right after the 8-byte ``mdat`` header). The parser is general
over what the spec allows for progressive/streamed files: 64-bit box
sizes, ``co64``, multi-chunk ``stsc`` runs, multi-run ``stts``, unknown
boxes skipped by size.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

_U32 = struct.Struct(">I")
_U64 = struct.Struct(">Q")


# ---------------------------------------------------------------- boxes


def _box(fourcc: bytes, payload: bytes) -> bytes:
    return _U32.pack(8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, _U32.pack((version << 24) | flags) + payload)


_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


def encode_mp4_mjpeg(
    samples: list[bytes], width: int, height: int, fps: float = 4.0
) -> bytes:
    """Complete-JPEG frame payloads → a valid single-track MJPEG MP4.

    Timescale is fixed at 1000 (1 tick = 1 ms); every sample gets the
    same ``round(1000/fps)`` duration. Layout ``ftyp mdat moov`` so the
    one ``stco`` chunk offset is known before the tables are built.
    """
    if not samples:
        raise ValueError("encode_mp4_mjpeg: need at least one sample")
    for s in samples:
        if s[:2] != b"\xff\xd8":
            raise ValueError("encode_mp4_mjpeg: sample is not a JPEG stream")
    n = len(samples)
    delta = max(1, round(1000.0 / float(fps)))
    duration = n * delta

    ftyp = _box(b"ftyp", b"isom" + _U32.pack(512) + b"isomiso2mp41")
    mdat = _box(b"mdat", b"".join(samples))
    first_sample_off = len(ftyp) + 8  # mdat header is 8 bytes

    # VisualSampleEntry 'jpeg' (14496-12 §12.1.3): no codec-specific
    # extension boxes — each sample is a self-describing JPEG.
    entry = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + struct.pack(">HH", 0, 0)
        + b"\x00" * 12  # pre_defined[3]
        + struct.pack(">HH", width, height)
        + _U32.pack(0x00480000) * 2  # 72 dpi
        + _U32.pack(0)
        + struct.pack(">H", 1)  # frame_count
        + bytes([4]) + b"mjpg" + b"\x00" * 27  # compressorname (32 B)
        + struct.pack(">Hh", 24, -1)  # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, _U32.pack(1) + _box(b"jpeg", entry))
    stts = _full(b"stts", 0, 0, _U32.pack(1) + struct.pack(">II", n, delta))
    stsc = _full(b"stsc", 0, 0, _U32.pack(1) + struct.pack(">III", 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        _U32.pack(0) + _U32.pack(n) + b"".join(_U32.pack(len(s)) for s in samples),
    )
    stco = _full(b"stco", 0, 0, _U32.pack(1) + _U32.pack(first_sample_off))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)

    url = _full(b"url ", 0, 1, b"")  # flag 1: media in this file
    dref = _full(b"dref", 0, 0, _U32.pack(1) + url)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(
        b"hdlr", 0, 0,
        _U32.pack(0) + b"vide" + b"\x00" * 12 + b"VideoHandler\x00",
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, duration) + struct.pack(">HH", 0x55C4, 0),
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0, 3,
        struct.pack(">IIII", 0, 0, 1, 0)
        + _U32.pack(duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + _MATRIX
        + _U32.pack(width << 16)
        + _U32.pack(height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, 1000, duration)
        + _U32.pack(0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + _MATRIX
        + b"\x00" * 24  # pre_defined[6]
        + _U32.pack(2),  # next_track_ID
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# --------------------------------------------------------------- parser


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end); handles 64-bit sizes
    and size==0 (box extends to the end), skipping nothing silently."""
    pos = start
    while pos + 8 <= end:
        size = _U32.unpack_from(buf, pos)[0]
        fourcc = buf[pos + 4 : pos + 8]
        head = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("mp4: truncated 64-bit box header")
            size = _U64.unpack_from(buf, pos + 8)[0]
            head = 16
        elif size == 0:
            size = end - pos
        if size < head or pos + size > end:
            raise ValueError(f"mp4: box {fourcc!r} overruns container")
        yield fourcc, pos + head, pos + size
        pos += size


def _find(buf: bytes, start: int, end: int, fourcc: bytes):
    for fc, a, b in _iter_boxes(buf, start, end):
        if fc == fourcc:
            return a, b
    return None


@dataclass
class Mp4Track:
    """Flattened sample table of the first video track."""

    codec: str  # stsd entry fourcc, e.g. 'jpeg'
    width: int
    height: int
    timescale: int
    duration_ms: int
    offsets: np.ndarray  # int64 absolute file offsets, one per sample
    sizes: np.ndarray  # int64
    ts_ms: np.ndarray  # int64 decode timestamps

    @property
    def n_samples(self) -> int:
        return len(self.sizes)


def probe_is_mp4(buf: bytes) -> bool:
    return len(buf) >= 12 and buf[4:8] == b"ftyp"


def parse_mp4(buf: bytes) -> Mp4Track:
    """Walk the box tree and flatten the stbl tables of the first
    ``vide`` track into per-sample (offset, size, timestamp)."""
    if not probe_is_mp4(buf):
        raise ValueError("not an ISO BMFF stream (missing ftyp)")
    moov = _find(buf, 0, len(buf), b"moov")
    if moov is None:
        raise ValueError("mp4: no moov box")
    for fc, a, b in _iter_boxes(buf, *moov):
        if fc != b"trak":
            continue
        mdia = _find(buf, a, b, b"mdia")
        if mdia is None:
            continue
        hdlr = _find(buf, *mdia, b"hdlr")
        if hdlr is None or buf[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        return _parse_video_trak(buf, mdia)
    raise ValueError("mp4: no video track")


def _parse_video_trak(buf: bytes, mdia: tuple[int, int]) -> Mp4Track:
    try:
        return _parse_video_trak_inner(buf, mdia)
    except (KeyError, IndexError, struct.error) as exc:
        # crafted/corrupt sample tables surface as one error type
        raise ValueError(f"mp4: malformed sample tables ({exc})") from exc


def _parse_video_trak_inner(buf: bytes, mdia: tuple[int, int]) -> Mp4Track:
    mdhd = _find(buf, *mdia, b"mdhd")
    if mdhd is None:
        raise ValueError("mp4: no mdhd")
    version = buf[mdhd[0]]
    if version == 1:
        timescale = _U32.unpack_from(buf, mdhd[0] + 20)[0]
        duration = _U64.unpack_from(buf, mdhd[0] + 24)[0]
    else:
        timescale = _U32.unpack_from(buf, mdhd[0] + 12)[0]
        duration = _U32.unpack_from(buf, mdhd[0] + 16)[0]
    minf = _find(buf, *mdia, b"minf")
    stbl = _find(buf, *minf, b"stbl") if minf else None
    if stbl is None:
        raise ValueError("mp4: no stbl")

    tables: dict[bytes, tuple[int, int]] = {}
    for fc, a, b in _iter_boxes(buf, *stbl):
        tables[fc] = (a, b)

    # stsd → codec fourcc + dimensions
    a, _ = tables[b"stsd"]
    codec = buf[a + 12 : a + 16].decode("latin1")
    # entry box payload starts at a+16; width/height sit 24 bytes in
    # (reserved[6] + dri + pre_defined/reserved + pre_defined[3])
    width = struct.unpack_from(">H", buf, a + 16 + 24)[0]
    height = struct.unpack_from(">H", buf, a + 16 + 26)[0]

    # stsz → sizes
    a, _ = tables[b"stsz"]
    fixed = _U32.unpack_from(buf, a + 4)[0]
    n = _U32.unpack_from(buf, a + 8)[0]
    if fixed:
        # bound n by the file before allocating anything n-sized: the
        # samples must physically fit in the file (variable-size path
        # is bounded the same way by frombuffer's own length check)
        if n * fixed > len(buf):
            raise ValueError("mp4: stsz sample count exceeds file size")
        sizes = np.full(n, fixed, dtype=np.int64)
    else:
        sizes = np.frombuffer(buf, dtype=">u4", count=n, offset=a + 12).astype(np.int64)

    # stts runs → per-sample decode timestamps
    a, _ = tables[b"stts"]
    n_runs = _U32.unpack_from(buf, a + 4)[0]
    runs = np.frombuffer(buf, dtype=">u4", count=2 * n_runs, offset=a + 8).astype(
        np.int64
    ).reshape(-1, 2)
    if int(runs[:, 0].sum()) != n:  # check BEFORE materializing the
        # expansion: a crafted run count must not drive a huge allocation
        raise ValueError("mp4: stts sample count disagrees with stsz")
    deltas = np.repeat(runs[:, 1], runs[:, 0])
    dts = np.concatenate(([0], np.cumsum(deltas[:-1])))

    # stco/co64 → chunk offsets; stsc runs → sample-to-chunk
    if b"stco" in tables:
        a, _ = tables[b"stco"]
        n_chunks = _U32.unpack_from(buf, a + 4)[0]
        chunk_off = np.frombuffer(buf, dtype=">u4", count=n_chunks, offset=a + 8).astype(
            np.int64
        )
    elif b"co64" in tables:
        a, _ = tables[b"co64"]
        n_chunks = _U32.unpack_from(buf, a + 4)[0]
        chunk_off = np.frombuffer(buf, dtype=">u8", count=n_chunks, offset=a + 8).astype(
            np.int64
        )
    else:
        raise ValueError("mp4: no stco/co64")
    a, _ = tables[b"stsc"]
    n_sc = _U32.unpack_from(buf, a + 4)[0]
    sc = np.frombuffer(buf, dtype=">u4", count=3 * n_sc, offset=a + 8).astype(
        np.int64
    ).reshape(-1, 3)  # (first_chunk 1-based, samples_per_chunk, sdi)

    # expand: samples_per_chunk for every chunk. Validate run structure
    # first — 1-based, strictly increasing first_chunk within range —
    # so no chunk is left uncovered (zeros, not np.empty garbage) and
    # no run writes through a negative index.
    if n_sc == 0 or sc[0, 0] != 1:
        raise ValueError("mp4: stsc must start at chunk 1")
    firsts = sc[:, 0]
    if (firsts[1:] <= firsts[:-1]).any() or firsts[-1] > n_chunks:
        raise ValueError("mp4: stsc first_chunk not increasing / out of range")
    if (sc[:, 1] <= 0).any():
        raise ValueError("mp4: non-positive samples_per_chunk")
    per_chunk = np.zeros(n_chunks, dtype=np.int64)
    for i in range(n_sc):
        first = sc[i, 0] - 1
        last = sc[i + 1, 0] - 1 if i + 1 < n_sc else n_chunks
        per_chunk[first:last] = sc[i, 1]
    if per_chunk.sum() < n:
        raise ValueError("mp4: stsc covers fewer samples than stsz")

    # map sample -> chunk via searchsorted on the cumulative chunk fill
    # (allocation bounded by n even for crafted samples_per_chunk)
    chunk_start_sample = np.concatenate(([0], np.cumsum(per_chunk)))[:-1]
    sample_chunk = (
        np.searchsorted(chunk_start_sample, np.arange(n), side="right") - 1
    )
    # sample offset = chunk base + total size of earlier samples in the
    # same chunk (samples are contiguous within a chunk per the spec)
    csum = np.concatenate(([0], np.cumsum(sizes[:-1])))
    offsets = chunk_off[sample_chunk] + (csum - csum[chunk_start_sample[sample_chunk]])

    ts_ms = (dts * 1000) // max(1, timescale)
    end = offsets + sizes
    # co64 values >= 2^63 wrap negative through the int64 cast — check
    # both ends so a crafted offset can't slice from the buffer's tail
    if len(end) and (offsets.min() < 0 or end.max() > len(buf)):
        raise ValueError("mp4: sample table points past end of file")
    return Mp4Track(
        codec=codec,
        width=width,
        height=height,
        timescale=int(timescale),
        duration_ms=int((duration * 1000) // max(1, timescale)),
        offsets=offsets,
        sizes=sizes,
        ts_ms=ts_ms,
    )


def extract_sample(buf: bytes, track: Mp4Track, i: int) -> bytes:
    if not (0 <= i < track.n_samples):
        raise IndexError(f"sample {i} out of range 0..{track.n_samples - 1}")
    o, s = int(track.offsets[i]), int(track.sizes[i])
    return buf[o : o + s]


def sample_index_at(track: Mp4Track, ts_ms: int) -> int:
    """Index of the sample on display at ``ts_ms`` (latest sample whose
    decode timestamp is ≤ ts, clipped to the valid range)."""
    i = int(np.searchsorted(track.ts_ms, ts_ms, side="right")) - 1
    return max(0, min(i, track.n_samples - 1))


def decode_frame_mjpeg(buf: bytes, track: Mp4Track, i: int) -> np.ndarray:
    """Decode sample ``i`` of an MJPEG track to raw 0..255 float32 (the
    media-payload convention: no caption scale)."""
    if track.codec != "jpeg":
        raise NotImplementedError(
            f"mp4 sample codec {track.codec!r} needs an external decoder; "
            "only self-describing MJPEG ('jpeg') tracks decode here"
        )
    from gridfia_ray.codecs.jpeg import decode_jpeg_gray

    return decode_jpeg_gray(extract_sample(buf, track, i), 0.0, 0.0)
