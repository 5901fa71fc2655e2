"""WebP-lossless (VP8L) codec: subset-encoder round trips plus
handcrafted bitstreams for every decoder path the subset encoder does
not produce (LZ77 backrefs, color cache, meta prefix-code groups,
color transform, color-indexing/palette with sub-byte bundling)."""

import numpy as np
import pytest

from gridfia_ray.codecs import webp as W


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _code_for(vals, green=False):
    """Complete canonical code over an explicit symbol set; None code
    means single-symbol (emit via the simple form)."""
    n = 256 + (24 if green else 0)
    lengths = [0] * n
    if len(vals) == 1:
        return None, vals[0]
    bits = int(np.ceil(np.log2(len(vals))))
    short = (1 << bits) - len(vals)
    for k, v in enumerate(sorted(vals)):
        lengths[v] = bits - 1 if (k < short and bits > 1) else bits
    return lengths, None


def _emit_code(bw, vals, green=False):
    lengths, const = _code_for(vals, green=green)
    if lengths is None:
        W._write_simple_code(bw, const)
        return None
    W.write_code_lengths(bw, lengths)
    return W.canonical_codes(lengths)


class TestRoundTrip:
    @pytest.mark.parametrize("subtract_green", [True, False])
    @pytest.mark.parametrize("left_predictor", [True, False])
    def test_exact(self, subtract_green, left_predictor):
        rng = np.random.RandomState(11)
        for h, w in [(1, 1), (3, 5), (16, 16), (33, 47)]:
            y, x = np.mgrid[0:h, 0:w]
            for a in (
                np.clip(120 + 70 * np.sin(x / 6.0) + 50 * np.cos(y / 4.0), 0, 255),
                rng.rand(h, w) * 255,
            ):
                buf = W.encode_webp_gray(
                    a, subtract_green=subtract_green, left_predictor=left_predictor
                )
                dec = W.decode_webp_gray(buf)
                assert np.array_equal(dec, np.clip(np.rint(a), 0, 255))

    def test_riff_container(self):
        buf = W.encode_webp_gray(np.zeros((4, 4)))
        assert buf[:4] == b"RIFF" and buf[8:12] == b"WEBP" and buf[12:16] == b"VP8L"

    def test_rejects(self):
        with pytest.raises(ValueError):
            W.decode_webp_gray(b"not riff at all....")
        with pytest.raises(ValueError):
            W.decode_vp8l(b"\x00junk")
        good = W.encode_webp_gray(np.ones((8, 8)) * 50)
        with pytest.raises(ValueError):
            W.decode_webp_gray(good[: len(good) - 10] )  # truncated bitstream

    def test_lossy_vp8_flagged_unsupported(self):
        import struct

        chunk = b"VP8 " + struct.pack("<I", 4) + b"\x00" * 4
        buf = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
        with pytest.raises(NotImplementedError):
            W.decode_webp_gray(buf)


class TestHandcraftedPaths:
    def test_lz77_backref(self):
        """lit 10, lit 20, then copy length 4 at distance 2."""
        bw = W.BitWriter()
        _header(bw, 6, 1)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        lengths = [0] * 280
        lengths[10] = 1
        lengths[20] = 2
        lengths[259] = 2  # length-prefix 3 -> value 4
        W.write_code_lengths(bw, lengths)
        gc = W.canonical_codes(lengths)
        for s in (0, 0, 255):
            W._write_simple_code(bw, s)
        W._write_simple_code(bw, 13)  # distance prefix 13: 97..128
        W.write_symbol(bw, gc, 10)
        W.write_symbol(bw, gc, 20)
        W.write_symbol(bw, gc, 259)
        bw.write(25, 5)  # 96 + 25 + 1 = 122 -> plane distance 2
        argb = W.decode_vp8l(bw.flush())
        assert ((argb >> 8) & 0xFF).tolist() == [[10, 20, 10, 20, 10, 20]]

    def test_lz77_2d_distance_map(self):
        """Distance code 1 maps to (dx=0, dy=1): copy the row above."""
        bw = W.BitWriter()
        _header(bw, 3, 2)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        lengths = [0] * 280
        for s in (7, 8, 9):
            lengths[s] = 2
        lengths[258] = 2  # length prefix 2 -> 3
        W.write_code_lengths(bw, lengths)
        gc = W.canonical_codes(lengths)
        for s in (0, 0, 255):
            W._write_simple_code(bw, s)
        W._write_simple_code(bw, 0)  # distance prefix 0 -> value 1 -> map (0,1)
        for s in (7, 8, 9):
            W.write_symbol(bw, gc, s)
        W.write_symbol(bw, gc, 258)
        argb = W.decode_vp8l(bw.flush())
        assert ((argb >> 8) & 0xFF).tolist() == [[7, 8, 9], [7, 8, 9]]

    def test_color_cache(self):
        g = 42
        argb_val = (255 << 24) | (g << 8)
        slot = ((0x1E35A7BD * argb_val) & 0xFFFFFFFF) >> (32 - 4)
        bw = W.BitWriter()
        _header(bw, 4, 1)
        bw.write(0, 1)
        bw.write(1, 1)
        bw.write(4, 4)  # cache bits 4
        bw.write(0, 1)  # no meta
        lengths = [0] * (280 + 16)
        lengths[g] = 1
        lengths[280 + slot] = 1
        W.write_code_lengths(bw, lengths)
        gc = W.canonical_codes(lengths)
        for s in (0, 0, 255):
            W._write_simple_code(bw, s)
        W._write_simple_code(bw, 0)
        W.write_symbol(bw, gc, g)
        for _ in range(3):
            W.write_symbol(bw, gc, 280 + slot)
        argb = W.decode_vp8l(bw.flush())
        assert (((argb >> 8) & 0xFF) == g).all()
        assert ((argb >> 24) == 255).all()

    def test_cache_symbol_without_cache_rejected(self):
        bw = W.BitWriter()
        _header(bw, 1, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        lengths = [0] * 280
        lengths[5] = 1
        lengths[279] = 1  # a length-prefix symbol wanting distance data
        W.write_code_lengths(bw, lengths)
        gc = W.canonical_codes(lengths)
        for s in (0, 0, 255):
            W._write_simple_code(bw, s)
        W._write_simple_code(bw, 0)
        W.write_symbol(bw, gc, 279)  # length prefix 23 -> huge copy at pos 0
        with pytest.raises(ValueError):
            W.decode_vp8l(bw.flush())

    def test_meta_prefix_groups(self):
        """Two prefix-code groups selected by the huffman image."""
        bw = W.BitWriter()
        _header(bw, 8, 1)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no cache
        bw.write(1, 1)  # meta codes present
        bw.write(0, 3)  # meta bits = 2 -> 4-px blocks, meta image 2x1
        bw.write(0, 1)  # sub-image: no cache
        mc = _emit_code(bw, [0, 1], green=True)
        for s in (0, 0, 0):
            W._write_simple_code(bw, s)
        W._write_simple_code(bw, 0)
        W.write_symbol(bw, mc, 0)
        W.write_symbol(bw, mc, 1)
        for const in (100, 200):  # group 0 then group 1
            W._write_simple_code(bw, const)
            for s in (0, 0, 255):
                W._write_simple_code(bw, s)
            W._write_simple_code(bw, 0)
        argb = W.decode_vp8l(bw.flush())  # all codes single-symbol: 0 data bits
        assert ((argb >> 8) & 0xFF).tolist() == [[100] * 4 + [200] * 4]

    def test_color_transform(self):
        """g2r=16 over r=g pixels incl. a value >127 (signed int8)."""
        bw = W.BitWriter()
        _header(bw, 2, 1)
        bw.write(1, 1)
        bw.write(1, 2)  # color transform
        bw.write(7, 3)  # block size 2^9 covers the image -> 1x1 data
        bw.write(0, 1)  # sub-image: no cache
        # transform pixel: blue=green_to_red, green=green_to_blue, red=red_to_blue
        W._write_simple_code(bw, 0)  # green (g2b)
        W._write_simple_code(bw, 0)  # red (r2b)
        W._write_simple_code(bw, 16)  # blue (g2r)
        W._write_simple_code(bw, 0)  # alpha
        W._write_simple_code(bw, 0)
        bw.write(0, 1)  # no more transforms
        bw.write(0, 1)
        bw.write(0, 1)
        gc = _emit_code(bw, [100, 200], green=True)
        # residuals: delta(16, 100) = 50; delta(16, int8(200)=-56) = -28
        rc = _emit_code(bw, [50, 228])
        bc = _emit_code(bw, [100, 200])
        W._write_simple_code(bw, 255)
        W._write_simple_code(bw, 0)
        for g_v, r_resid in ((100, 50), (200, 228)):
            W.write_symbol(bw, gc, g_v)
            W.write_symbol(bw, rc, r_resid)
            W.write_symbol(bw, bc, g_v)  # g2b = r2b = 0: blue stored raw
        argb = W.decode_vp8l(bw.flush())
        assert ((argb >> 16) & 0xFF).tolist() == [[100, 200]]
        assert ((argb >> 8) & 0xFF).tolist() == [[100, 200]]
        assert (argb & 0xFF).tolist() == [[100, 200]]

    def test_palette_with_pixel_bundling(self):
        """3 colors -> width_bits=2 (four 2-bit indices per green byte)."""
        pal = [(255, 10, 10, 10), (255, 77, 77, 77), (255, 200, 200, 200)]
        idx = [0, 1, 2, 2, 1, 0, 0, 1, 2, 0]
        deltas, prev = [], (0, 0, 0, 0)
        for p in pal:
            deltas.append(tuple((p[i] - prev[i]) % 256 for i in range(4)))
            prev = p
        bw = W.BitWriter()
        _header(bw, 10, 1)
        bw.write(1, 1)
        bw.write(3, 2)  # color indexing
        bw.write(2, 8)  # n_colors - 1
        bw.write(0, 1)  # palette sub-image: no cache
        codes = {}
        for name, pos, green in (("g", 2, True), ("r", 1, False), ("b", 3, False), ("a", 0, False)):
            codes[name] = _emit_code(bw, sorted({d[pos] for d in deltas}), green=green)
        W._write_simple_code(bw, 0)
        for d in deltas:
            for name, pos in (("g", 2), ("r", 1), ("b", 3), ("a", 0)):
                if codes[name] is not None:
                    W.write_symbol(bw, codes[name], d[pos])
        bw.write(0, 1)  # no more transforms
        bw.write(0, 1)
        bw.write(0, 1)
        # bundle: 4 indices of 2 bits per green byte, sub-width 3
        packed = []
        for k in range(0, 12, 4):
            chunk = idx[k : k + 4]
            v = 0
            for j, c in enumerate(chunk):
                v |= c << (2 * j)
            packed.append(v)
        pc = _emit_code(bw, sorted(set(packed)), green=True)
        for s in (0, 0, 255):
            W._write_simple_code(bw, s)
        W._write_simple_code(bw, 0)
        for v in packed:
            W.write_symbol(bw, pc, v)
        argb = W.decode_vp8l(bw.flush())
        assert ((argb >> 8) & 0xFF).tolist() == [[pal[i][2] for i in idx]]
        assert ((argb >> 16) & 0xFF).tolist() == [[pal[i][1] for i in idx]]

    def test_palette_plus_predictor_rejected(self):
        bw = W.BitWriter()
        _header(bw, 4, 1)
        bw.write(1, 1)
        bw.write(0, 2)  # predictor
        bw.write(0, 3)  # size bits 2
        bw.write(0, 1)  # sub-image no cache
        for s in (1, 0, 0, 0, 0):
            W._write_simple_code(bw, s)
        bw.write(1, 1)
        bw.write(3, 2)  # then color indexing -> unsupported combination
        bw.write(0, 8)
        with pytest.raises(ValueError):
            W.decode_vp8l(bw.flush() + b"\x00" * 8)

    # hand-computed from the spec (NOT via _predict — a circular test
    # could not catch predictor-math bugs like floor-vs-trunc division):
    #   case A: L=90, T=140, TL=100
    #     mode 11 Select: pT = 3|L-TL| = 30 <= pL = 3|T-TL| = 120 -> T = 140
    #     mode 12: clip(90 + 140 - 100) = 130
    #     mode 13: ave = (90+140)//2 = 115; d = 15; 115 + trunc(15/2) = 122
    #   case B: L=0, T=22, TL=26  (negative ODD delta: trunc != floor)
    #     mode 11: pT = 3|0-26| = 78 > pL = 3|22-26| = 12 -> L = 0
    #     mode 12: clip(0 + 22 - 26) = 0
    #     mode 13: ave = 11; d = -15; 11 + trunc(-15/2) = 11 - 7 = 4
    _PRED_CASES = [
        (90, 140, 100, {11: 140, 12: 130, 13: 122}),
        (0, 22, 26, {11: 0, 12: 0, 13: 4}),
    ]

    @pytest.mark.parametrize("L,T,TL,expected", _PRED_CASES)
    def test_predict_kernel_vs_spec(self, L, T, TL, expected):
        ch = lambda v: np.array([255, v, v, v], dtype=np.uint8)
        for mode, want in expected.items():
            got = W._predict(mode, ch(L), ch(T), ch(TL), ch(0))
            assert int(got[1]) == want, (mode, L, T, TL)

    @pytest.mark.parametrize("L,T,TL,expected", _PRED_CASES)
    def test_select_and_clamp_predictors(self, L, T, TL, expected):
        """Predictor modes 11/12/13 over a 2x2 image, one block —
        expected residuals derived from the hardcoded spec values."""
        for mode in (11, 12, 13):
            pred_val = expected[mode]
            target = 125
            resid11 = (target - pred_val) % 256
            bw = W.BitWriter()
            _header(bw, 2, 2)
            bw.write(1, 1)
            bw.write(0, 2)  # predictor transform
            bw.write(0, 3)  # size_bits=2 -> 4-px blocks -> 1x1 modes
            bw.write(0, 1)
            for s in (mode, 0, 0, 0, 0):
                W._write_simple_code(bw, s)
            bw.write(0, 1)
            bw.write(0, 1)
            bw.write(0, 1)
            # decoded image [[TL, T], [L, 125]]; residuals: (0,0) vs
            # black, (0,1) vs left=TL, (1,0) vs top=TL, (1,1) vs mode
            resid = [TL, (T - TL) % 256, (L - TL) % 256, resid11]
            gc = _emit_code(bw, sorted(set(resid)), green=True)
            rc = _emit_code(bw, sorted(set(resid)))  # red: same residuals
            bc = _emit_code(bw, sorted(set(resid)))  # blue: same residuals
            W._write_simple_code(bw, 0)  # alpha residual (pred alpha = 255)
            W._write_simple_code(bw, 0)  # distance
            for v in resid:
                W.write_symbol(bw, gc, v)
                W.write_symbol(bw, rc, v)
                W.write_symbol(bw, bc, v)
            argb = W.decode_vp8l(bw.flush())
            g = ((argb >> 8) & 0xFF).tolist()
            assert g == [[TL, T], [L, 125]], (mode, g)
            # r and b planes carry the same residuals -> decode identically
            assert ((argb >> 16) & 0xFF).tolist() == g
            assert (argb & 0xFF).tolist() == g
            assert (argb >> 24).tolist() == [[255, 255], [255, 255]]

    def test_top_right_wraps_on_last_column(self):
        """Mode 3 (TR): the rightmost column predicts from the first
        pixel of the CURRENT row (the contiguous-buffer rule)."""
        bw = W.BitWriter()
        _header(bw, 2, 2)
        bw.write(1, 1)
        bw.write(0, 2)
        bw.write(0, 3)
        bw.write(0, 1)
        for s in (3, 0, 0, 0, 0):  # mode 3 = top-right
            W._write_simple_code(bw, s)
        bw.write(0, 1)
        bw.write(0, 1)
        bw.write(0, 1)
        # decoded targets: [[30, 40], [50, ?]]; (1,1) TR -> out[1,0]=50
        target = 60
        resid = [30, 10, 20, (target - 50) % 256]
        gc = _emit_code(bw, sorted(set(resid)), green=True)
        for s in (0, 0, 0):
            W._write_simple_code(bw, s)
        W._write_simple_code(bw, 0)
        for v in resid:
            W.write_symbol(bw, gc, v)
        argb = W.decode_vp8l(bw.flush())
        assert ((argb >> 8) & 0xFF).tolist() == [[30, 40], [50, 60]]
