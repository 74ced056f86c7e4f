"""VP8L (lossless WebP) codec tests — roundtrips through the fixture
encoder plus HAND-BUILT bitstreams for the decoder-only paths the
encoder never emits (subtract-green, palettes with pixel bundling,
color cache, LZ77 plain-distance copies) and the documented
NotImplementedError edges."""

from __future__ import annotations

import random

import pytest

from cmc_knowledge_graph_text2ttl_spark.operators import multimodal as mm
from cmc_knowledge_graph_text2ttl_spark.operators import vp8l as V
from cmc_knowledge_graph_text2ttl_spark.operators.vp8l import (
    _BitWriter,
    _CACHE_MULT,
    _canonical_codes,
    _huffman_lengths,
    _write_tree,
)


def _write_literal_image(bw, argb_pixels, cache_bits=0, is_main=True):
    """Entropy-coded image of plain literals (the encoder's tail,
    reusable after hand-written transform headers)."""
    gs = [(p >> 8) & 0xFF for p in argb_pixels]
    rs = [(p >> 16) & 0xFF for p in argb_pixels]
    bs = [p & 0xFF for p in argb_pixels]
    As = [(p >> 24) & 0xFF for p in argb_pixels]

    def freq(vals):
        f = {}
        for v in vals:
            f[v] = f.get(v, 0) + 1
        return f

    bw.write(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.write(cache_bits, 4)
    if is_main:
        bw.write(0, 1)  # no meta prefix codes
    cache_size = (1 << cache_bits) if cache_bits else 0
    trees = [
        _huffman_lengths(freq(gs), 256 + 24 + cache_size),
        _huffman_lengths(freq(rs), 256),
        _huffman_lengths(freq(bs), 256),
        _huffman_lengths(freq(As), 256),
        [0] * 40,
    ]
    for lens in trees:
        _write_tree(bw, lens)
    codes = [_canonical_codes(t) for t in trees[:4]]
    for i in range(len(argb_pixels)):
        for ch_codes, vals in zip(codes, (gs, rs, bs, As)):
            if len(ch_codes) > 1:
                bw.write_code(*ch_codes[vals[i]])


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


class TestRoundtrip:
    def test_random_images_bit_exact(self):
        random.seed(42)
        for _ in range(15):
            w, h = random.randint(1, 20), random.randint(1, 15)
            ch = random.choice([3, 4])
            px = bytes(random.randrange(256) for _ in range(w * h * ch))
            got = V.decode_webp(V.encode_webp_lossless(w, h, px, ch))
            assert got[:3] == (w, h, 4)
            for i in range(w * h):
                assert got[3][4 * i : 4 * i + 3] == px[ch * i : ch * i + 3]
                a = px[ch * i + 3] if ch == 4 else 255
                assert got[3][4 * i + 3] == a

    def test_constant_image_degenerate_trees(self):
        blob = V.encode_webp_lossless(6, 3, bytes([7, 8, 9] * 18), 3)
        w, h, ch, px = V.decode_webp(blob)
        assert (w, h, ch) == (6, 3, 4)
        assert px == bytes([7, 8, 9, 255]) * 18

    def test_decode_image_dispatch_and_dims(self):
        blob = V.encode_webp_lossless(5, 4, bytes(60), 3)
        assert mm.sniff_media(blob) == ("image", "webp", 5, 4)
        assert mm.decode_image(blob)[:3] == (5, 4, 4)

    def test_dhash_sees_through_png_webp_reencode(self):
        from cmc_knowledge_graph_text2ttl_spark.operators.perceptual import (
            dhash_bands,
        )

        w, h = 16, 11
        px = bytes((j * 17 + (j % 7) * 41) % 256 for j in range(w * h * 3))
        a = dhash_bands(*mm.decode_png(mm.encode_png(w, h, px, 3)))
        b = dhash_bands(*mm.decode_image(V.encode_webp_lossless(w, h, px, 3)))
        assert a == b


class TestHandBuiltStreams:
    def test_subtract_green_inverse(self):
        w, h = 4, 3
        rgb = [(30 + i, 100 + i, 200 - i) for i in range(w * h)]
        bw = _BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)  # a transform follows
        bw.write(2, 2)  # SUBTRACT_GREEN
        bw.write(0, 1)  # no more transforms
        fwd = [
            (0xFF << 24)
            | (((r - g) & 0xFF) << 16)
            | (g << 8)
            | ((b - g) & 0xFF)
            for r, g, b in rgb
        ]
        _write_literal_image(bw, fwd)
        got = V.decode_vp8l(bytes(bw.out))
        assert got[:3] == (w, h, 4)
        for i, (r, g, b) in enumerate(rgb):
            assert got[3][4 * i : 4 * i + 4] == bytes((r, g, b, 255))

    def _palette_stream(self, w, h, palette, indices):
        bw = _BitWriter()
        _header(bw, w, h)
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(len(palette) - 1, 8)
        # palette is delta-coded component-wise vs previous entry
        deltas = []
        prev = 0
        for cur in palette:
            deltas.append(
                (((cur >> 24) - (prev >> 24)) & 0xFF) << 24
                | (((cur >> 16) - (prev >> 16)) & 0xFF) << 16
                | (((cur >> 8) - (prev >> 8)) & 0xFF) << 8
                | ((cur - prev) & 0xFF)
            )
            prev = cur
        _write_literal_image(bw, deltas, is_main=False)
        bw.write(0, 1)  # no more transforms
        n = len(palette)
        wb = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        if wb:
            ppp, bpp = 1 << wb, 8 >> wb
            packed_w = (w + ppp - 1) >> wb
            packed = []
            for y in range(h):
                for xp in range(packed_w):
                    g = 0
                    for k in range(ppp):
                        x = (xp << wb) + k
                        if x < w:
                            g |= indices[y * w + x] << (k * bpp)
                    packed.append((0xFF << 24) | (g << 8))
            _write_literal_image(bw, packed)
        else:
            _write_literal_image(
                bw, [(0xFF << 24) | (i << 8) for i in indices]
            )
        return bytes(bw.out)

    def test_palette_bundled_4_colors(self):
        w, h = 9, 2  # 2-bit indices, 4 px per green byte, ragged edge
        palette = [0xFF102030, 0xFF405060, 0xFF708090, 0xFFA0B0C0]
        indices = [(x + y) % 4 for y in range(h) for x in range(w)]
        got = V.decode_vp8l(self._palette_stream(w, h, palette, indices))
        assert got[:3] == (w, h, 4)
        for i, idx in enumerate(indices):
            p = palette[idx]
            assert got[3][4 * i : 4 * i + 4] == bytes(
                ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF, 255)
            )

    def test_palette_unbundled_20_colors(self):
        w, h = 5, 4
        palette = [0xFF000000 | (i * 12 << 16) | (i * 7 << 8) | i for i in range(20)]
        indices = [(x * y + x) % 20 for y in range(h) for x in range(w)]
        got = V.decode_vp8l(self._palette_stream(w, h, palette, indices))
        for i, idx in enumerate(indices):
            p = palette[idx]
            assert got[3][4 * i : 4 * i + 3] == bytes(
                ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
            )

    def test_lz77_plain_distance_and_color_cache(self):
        # pixels: A B, then copy 4 @ distance 2 -> A B A B A B,
        # then a cache hit on A -> 7 pixels total (w=7, h=1)
        A = 0xFF112233
        B = 0xFF445566
        w, h = 7, 1
        cache_bits = 4
        idxA = ((_CACHE_MULT * A) & 0xFFFFFFFF) >> (32 - cache_bits)
        g_syms = [0x22, 0x55, 256 + 3, 280 + idxA]  # literals, len-4, cache
        bw = _BitWriter()
        _header(bw, w, h)
        bw.write(0, 1)  # no transforms
        bw.write(1, 1)
        bw.write(cache_bits, 4)
        bw.write(0, 1)  # no meta prefix
        freq = lambda vals: {v: vals.count(v) for v in vals}
        g_len = _huffman_lengths(freq(g_syms), 256 + 24 + (1 << cache_bits))
        r_len = _huffman_lengths({0x11: 1, 0x44: 1}, 256)
        b_len = _huffman_lengths({0x33: 1, 0x66: 1}, 256)
        a_len = _huffman_lengths({0xFF: 2}, 256)
        d_len = _huffman_lengths({13: 1}, 40)  # dist value 122 -> code 13
        for lens in (g_len, r_len, b_len, a_len, d_len):
            _write_tree(bw, lens)
        gc = _canonical_codes(g_len)
        rc = _canonical_codes(r_len)
        bc = _canonical_codes(b_len)
        # literal A
        bw.write_code(*gc[0x22])
        bw.write_code(*rc[0x11])
        bw.write_code(*bc[0x33])
        # literal B
        bw.write_code(*gc[0x55])
        bw.write_code(*rc[0x44])
        bw.write_code(*bc[0x66])
        # copy: length 4 = prefix code 3 (no extra bits)
        bw.write_code(*gc[256 + 3])
        # distance value 122: code 13, extra 5 bits = 122-1-96 = 25
        bw.write(25, 5)  # single-symbol distance tree consumes 0 code bits
        # cache reference to A
        bw.write_code(*gc[280 + idxA])
        got = V.decode_vp8l(bytes(bw.out))
        assert got[:3] == (w, h, 4)
        expect = [A, B, A, B, A, B, A]
        for i, p in enumerate(expect):
            assert got[3][4 * i : 4 * i + 4] == bytes(
                ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF, 255)
            )


class TestErrorEdges:
    def test_predictor_transform_raises(self):
        bw = _BitWriter()
        _header(bw, 4, 4)
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        with pytest.raises(NotImplementedError, match="predictor"):
            V.decode_vp8l(bytes(bw.out) + b"\x00" * 8)

    def test_mapped_distance_raises(self):
        # distance code value <= 120 is the neighborhood map
        A = 0xFF010203
        bw = _BitWriter()
        _header(bw, 4, 1)
        bw.write(0, 1)
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta
        g_len = _huffman_lengths({0x02: 1, 256 + 3: 1}, 280)
        for lens in (
            g_len,
            _huffman_lengths({0x01: 1}, 256),
            _huffman_lengths({0x03: 1}, 256),
            _huffman_lengths({0xFF: 1}, 256),
            _huffman_lengths({0: 1}, 40),  # dist code 0 -> value 1 (mapped)
        ):
            _write_tree(bw, lens)
        gc = _canonical_codes(g_len)
        bw.write_code(*gc[0x02])
        bw.write_code(*gc[256 + 3])
        with pytest.raises(NotImplementedError, match="distance"):
            V.decode_vp8l(bytes(bw.out) + b"\x00" * 4)

    def test_lossy_vp8_raises(self):
        body = b"WEBPVP8 " + b"\x00\x00\x00\x00" + b"\x00" * 16
        blob = b"RIFF" + len(body).to_bytes(4, "little") + body
        with pytest.raises(NotImplementedError, match="lossy"):
            V.decode_webp(blob)

    def test_truncated_and_garbage_raise_valueerror(self):
        px = bytes((i * 31) % 256 for i in range(8 * 8 * 3))
        payload = V.encode_vp8l(8, 8, px, 3)
        with pytest.raises(ValueError):
            V.decode_vp8l(payload[: len(payload) // 2])
        with pytest.raises(ValueError):
            V.decode_webp(b"not a webp at all")
        with pytest.raises(ValueError):
            V.decode_vp8l(b"\x00" + payload[1:])  # bad signature

    def test_feature_extract_skips_lossy_rows(self, spark):
        good = V.encode_webp_lossless(3, 3, bytes([5] * 27), 3)
        body = b"WEBPVP8 " + b"\x00\x00\x00\x00" + b"\x00" * 16
        lossy = b"RIFF" + len(body).to_bytes(4, "little") + body
        df = spark.createDataFrame(
            [("ok", bytearray(good)), ("lossy", bytearray(lossy))],
            "media_id string, blob binary",
        )
        got = {r.media_id: r.feature for r in mm.extract_features(df).collect()
               if r.feature in ("width", "decode_unavailable")}
        assert got == {"ok": "width", "lossy": "decode_unavailable"}
