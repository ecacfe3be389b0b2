"""Round-9 TIFF/BMP codec tests (operators/tiff.py, operators/bmp.py)
behind q417/q418: IFD walk, strip/compression/predictor matrix, TIFF-LZW
early change pinned by a hand-built code vector, BMP depth/RLE matrix,
and the honest gates."""

import struct

import pytest

from rust_dataframe_spark.operators.bmp import (
    BmpError,
    decode_bmp,
    encode_bmp,
    encode_bmp8,
    is_bmp,
)
from rust_dataframe_spark.operators.tiff import (
    TiffError,
    decode_tiff,
    encode_tiff,
    is_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
    tiff_pages,
)


def _pack_codes(codes, width=9):
    bits = []
    for c in codes:
        for k in range(width - 1, -1, -1):
            bits.append((c >> k) & 1)
    while len(bits) % 8:
        bits.append(0)
    return bytes(
        sum(b << (7 - k) for k, b in enumerate(bits[i : i + 8]))
        for i in range(0, len(bits), 8)
    )


class TestTiffLzw:
    def test_hand_vector_code_level(self):
        # [7,7,7,8]: Clear, lit 7, code 258 ("77"), lit 8, EOI — pins the
        # MSB-first packing and code assignment independent of round-trip
        vec = _pack_codes([256, 7, 258, 8, 257])
        assert lzw_encode(bytes([7, 7, 7, 8])) == vec
        assert lzw_decode(vec, 4) == bytes([7, 7, 7, 8])

    def test_early_change_boundary_round_trip(self):
        # incompressible bytes force >253 table entries -> the 9->10 bit
        # early change (and beyond); any off-by-one desyncs immediately
        import random

        rng = random.Random(11)
        data = bytes(rng.randrange(256) for _ in range(6000))
        assert lzw_decode(lzw_encode(data), len(data)) == data

    def test_clear_cap_round_trip(self):
        import random

        rng = random.Random(12)
        # enough entropy to hit the 4094-entry clear-and-reset
        data = bytes(rng.randrange(256) for _ in range(30000))
        assert lzw_decode(lzw_encode(data), len(data)) == data

    def test_kwkwk_case(self):
        # aaa..a produces the code==len(table) self-reference chain
        data = b"a" * 100
        assert lzw_decode(lzw_encode(data), 100) == data

    def test_truncated_fails_loud(self):
        enc = lzw_encode(bytes(range(100)))
        with pytest.raises(TiffError, match="yielded"):
            lzw_decode(enc[: len(enc) // 2], 100)

    def test_packbits_matrix(self):
        for d in (b"", b"\x01" * 300, bytes(range(200)), b"aaabccccd" * 40):
            assert packbits_decode(packbits_encode(d), len(d)) == d
        with pytest.raises(TiffError):
            packbits_decode(b"\x05ab", 6)  # truncated literal


class TestTiffReal:
    W, H = 13, 9

    def _gray(self):
        return bytes(
            (3 * x + 5 * y) % 256 for y in range(self.H) for x in range(self.W)
        )

    def test_compression_endian_strip_matrix(self):
        gray = self._gray()
        for comp in (1, 5, 32773):
            for be in (False, True):
                for rps in (0, 4):
                    t = encode_tiff(
                        self.W, self.H, 1, gray,
                        compression=comp, rows_per_strip=rps, big_endian=be,
                    )
                    assert is_tiff(t[:4])
                    assert decode_tiff(t) == (self.W, self.H, 1, gray)

    def test_rgb_predictor_lzw(self):
        rgb = bytes(
            (x * 7 + y * 11 + c * 29) % 256
            for y in range(self.H) for x in range(self.W) for c in range(3)
        )
        t = encode_tiff(
            self.W, self.H, 3, rgb,
            compression=5, predictor=2, rows_per_strip=3,
        )
        assert decode_tiff(t) == (self.W, self.H, 3, rgb)

    def test_multipage_chain_and_census(self):
        gray = self._gray()
        t = encode_tiff(
            self.W, self.H, 1, gray,
            pages=[(5, 4, 3, bytes(60)), (8, 2, 1, bytes(16))],
        )
        assert tiff_pages(t) == [(13, 9), (5, 4), (8, 2)]
        assert decode_tiff(t, page=1) == (5, 4, 3, bytes(60))
        with pytest.raises(TiffError, match="out of range"):
            decode_tiff(t, page=3)

    def test_bilevel_both_photometrics(self):
        # hand-build a 1-bit IFD: 10x3, rows packed MSB-first
        w, h = 10, 3
        rows = [0b1010101010, 0b1111100000, 0b0000011111]
        packed = b"".join(struct.pack(">H", r << 6) for r in rows)
        for photo in (0, 1):
            blob = _raw_tiff_1bit(w, h, packed, photo)
            W, H, C, px = decode_tiff(blob)
            assert (W, H, C) == (w, h, 1)
            for y in range(h):
                for x in range(w):
                    bit = (rows[y] >> (9 - x)) & 1
                    want = 255 * bit if photo == 1 else 255 * (1 - bit)
                    assert px[y * w + x] == want

    def test_palette_colormap(self):
        w, h = 4, 2
        idx = bytes([0, 1, 2, 3, 3, 2, 1, 0])
        blob = _raw_tiff_palette(w, h, idx)
        W, H, C, px = decode_tiff(blob)
        assert (W, H, C) == (w, h, 3)
        # ColorMap word = ((i*mul)%256)<<8 -> scaled >>8 gives (i*mul)%256
        for p, i in zip(range(0, len(px), 3), idx):
            assert px[p : p + 3] == bytes(
                ((i * 40) % 256, (i * 30) % 256, (i * 20) % 256)
            )

    def test_gates_fail_loud(self):
        gray = self._gray()
        t = bytearray(encode_tiff(self.W, self.H, 1, gray))
        with pytest.raises(TiffError, match="magic"):
            decode_tiff(b"ABCD" + bytes(t[4:]))
        # retag compression to CCITT G4 (4): since round 9 this is a real
        # decode path, so an 8-bit-sample file must fail its precondition
        bad = _patch_short_tag(bytes(t), 259, 4)
        with pytest.raises(TiffError, match="CCITT.*1-bit"):
            decode_tiff(bad)
        # retag to JPEG-in-TIFF (6): still an honest gate
        bad = _patch_short_tag(bytes(t), 259, 6)
        with pytest.raises(TiffError, match="compression 6"):
            decode_tiff(bad)
        # planar config 2 on a 3-sample image: the strip table no longer
        # covers spp planes -> loud mismatch (planar 2 itself is real now)
        rgb = encode_tiff(self.W, self.H, 3, bytes(self.W * self.H * 3))
        bad = _add_short_tag_variant(bytes(rgb), 284, 2)
        if bad is not None:
            with pytest.raises(TiffError, match="strips, want"):
                decode_tiff(bad)

    def test_strip_overrun_fails_loud(self):
        # point StripOffsets past EOF (the IFD sits after pixel data, so
        # file truncation would hit the IFD first — aim at the strip walk)
        t = encode_tiff(self.W, self.H, 1, self._gray())
        e = "<"
        off = struct.unpack_from(e + "I", t, 4)[0]
        n = struct.unpack_from(e + "H", t, off)[0]
        out = bytearray(t)
        for i in range(n):
            at = off + 2 + 12 * i
            if struct.unpack_from(e + "H", out, at)[0] == 273:
                struct.pack_into(e + "I", out, at + 8, len(t) - 4)
        with pytest.raises(TiffError, match="overruns"):
            decode_tiff(bytes(out))


def _patch_short_tag(blob: bytes, tag: int, newval: int) -> bytes:
    e = "<" if blob[:2] == b"II" else ">"
    off = struct.unpack_from(e + "I", blob, 4)[0]
    n = struct.unpack_from(e + "H", blob, off)[0]
    out = bytearray(blob)
    for i in range(n):
        at = off + 2 + 12 * i
        if struct.unpack_from(e + "H", out, at)[0] == tag:
            struct.pack_into(e + "H", out, at + 8, newval)
            return bytes(out)
    raise AssertionError(f"tag {tag} not present")


def _add_short_tag_variant(blob: bytes, tag: int, val: int):
    """Rewrite an unused existing tag slot to the given tag (keeps the
    IFD sorted requirement loose — decoder does not enforce order)."""
    try:
        return _patch_tag_id(blob, 282, tag, val)
    except AssertionError:
        return None


def _patch_tag_id(blob: bytes, old: int, new: int, val: int) -> bytes:
    e = "<" if blob[:2] == b"II" else ">"
    off = struct.unpack_from(e + "I", blob, 4)[0]
    n = struct.unpack_from(e + "H", blob, off)[0]
    out = bytearray(blob)
    for i in range(n):
        at = off + 2 + 12 * i
        if struct.unpack_from(e + "H", out, at)[0] == old:
            struct.pack_into(e + "H", out, at, new)
            struct.pack_into(e + "H", out, at + 8, val)
            return bytes(out)
    raise AssertionError(f"tag {old} not present")


def _raw_tiff_1bit(w: int, h: int, packed: bytes, photo: int) -> bytes:
    hdr = b"II*\x00" + struct.pack("<I", 8)
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 1), (259, 3, 1, 1),
        (262, 3, 1, photo), (273, 4, 1, 0), (277, 3, 1, 1),
        (278, 4, 1, h), (279, 4, 1, len(packed)),
    ]
    ifd = struct.pack("<H", len(tags))
    for t, ty, c, v in tags:
        ifd += struct.pack("<HHII", t, ty, c, v)
    ifd += b"\x00" * 4
    data_at = 8 + len(ifd)
    blob = bytearray(hdr + ifd + packed)
    # patch StripOffsets (tag 273 value)
    for i in range(len(tags)):
        at = 8 + 2 + 12 * i
        if struct.unpack_from("<H", blob, at)[0] == 273:
            struct.pack_into("<I", blob, at + 8, data_at)
    return bytes(blob)


def _raw_tiff_palette(w: int, h: int, idx: bytes) -> bytes:
    hdr = b"II*\x00" + struct.pack("<I", 8)
    ntags = 10
    ifd_len = 2 + 12 * ntags + 4
    cmap_at = 8 + ifd_len
    data_at = cmap_at + 3 * 256 * 2
    cmap = b""
    for plane, mul in ((0, 40), (1, 30), (2, 20)):
        cmap += b"".join(
            struct.pack("<H", ((i * mul) % 256) << 8) for i in range(256)
        )
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 8), (259, 3, 1, 1),
        (262, 3, 1, 3), (273, 4, 1, data_at), (277, 3, 1, 1),
        (278, 4, 1, h), (279, 4, 1, len(idx)), (320, 3, 3 * 256, cmap_at),
    ]
    ifd = struct.pack("<H", len(tags))
    for t, ty, c, v in tags:
        ifd += struct.pack("<HHII", t, ty, c, v)
    ifd += b"\x00" * 4
    return hdr + ifd + cmap + idx


class TestBmpReal:
    W, H = 7, 5

    def test_24bit_round_trip(self):
        rgb = bytes((3 * i + c) % 256 for i in range(self.W * self.H)
                    for c in range(3))
        b = encode_bmp(self.W, self.H, rgb)
        assert is_bmp(b[:2])
        assert decode_bmp(b) == (self.W, self.H, 3, rgb)

    def test_palette_and_grayscale_collapse(self):
        idx = bytes((x + y) % 16 for y in range(self.H) for x in range(self.W))
        pal = [((i * 7) % 256, (i * 5) % 256, (i * 3) % 256)
               for i in range(16)]
        b = encode_bmp8(self.W, self.H, idx, pal)
        w, h, c, px = decode_bmp(b)
        assert (w, h, c) == (self.W, self.H, 3)
        assert px == b"".join(bytes(pal[i]) for i in idx)
        gb = encode_bmp8(self.W, self.H, idx, [(i, i, i) for i in range(256)])
        assert decode_bmp(gb) == (self.W, self.H, 1, idx)

    def test_top_down_negative_height(self):
        rgb = bytes((3 * i + c) % 256 for i in range(self.W * self.H)
                    for c in range(3))
        b = bytearray(encode_bmp(self.W, self.H, rgb))
        struct.pack_into("<i", b, 22, -self.H)
        w, h, c, px = decode_bmp(bytes(b))
        flip = b"".join(
            rgb[3 * ((self.H - 1 - y) * self.W):
                3 * ((self.H - 1 - y) * self.W) + 3 * self.W]
            for y in range(self.H)
        )
        assert (w, h, px) == (self.W, self.H, flip)

    def test_rle8_runs_absolute_delta(self):
        # 6x2 bottom-up: bottom row = 4xAA 2xBB, top row = abs(1,2,3,4) 5,6
        enc = bytes([4, 0xAA, 2, 0xBB, 0, 0,
                     0, 4, 1, 2, 3, 4, 1, 5, 1, 6, 0, 1])
        hdrs = bytearray(encode_bmp8(6, 2, bytes(12),
                                     [(i, i, i) for i in range(256)]))
        struct.pack_into("<I", hdrs, 30, 1)  # BI_RLE8
        body_at = struct.unpack_from("<I", hdrs, 10)[0]
        w, h, c, px = decode_bmp(bytes(hdrs[:body_at]) + enc)
        assert (w, h, c) == (6, 2, 1)
        assert px == bytes([1, 2, 3, 4, 5, 6, 0xAA] + [0xAA] * 3 + [0xBB] * 2)

    def test_rle8_missing_eob_fails_loud(self):
        hdrs = bytearray(encode_bmp8(4, 2, bytes(8),
                                     [(i, i, i) for i in range(256)]))
        struct.pack_into("<I", hdrs, 30, 1)
        body_at = struct.unpack_from("<I", hdrs, 10)[0]
        with pytest.raises(BmpError, match="end-of-bitmap"):
            decode_bmp(bytes(hdrs[:body_at]) + bytes([4, 1, 0, 0]))

    def test_gates_fail_loud(self):
        rgb = bytes(105)
        b = bytearray(encode_bmp(self.W, self.H, rgb))
        struct.pack_into("<I", b, 30, 2)  # BI_RLE4
        with pytest.raises(BmpError, match="RLE4"):
            decode_bmp(bytes(b))
        b2 = bytearray(encode_bmp(self.W, self.H, rgb))
        struct.pack_into("<I", b2, 14, 12)  # OS/2 core header
        with pytest.raises(BmpError, match="OS/2"):
            decode_bmp(bytes(b2))
        with pytest.raises(BmpError, match="magic"):
            decode_bmp(b"PNG" + bytes(60))

    def test_decode_image_dispatch(self):
        from rust_dataframe_spark.operators.multimodal import decode_image

        rgb = bytes((3 * i + c) % 256 for i in range(self.W * self.H)
                    for c in range(3))
        assert decode_image(encode_bmp(self.W, self.H, rgb)) == (7, 5)
        t = encode_tiff(self.W, self.H, 3, rgb, compression=5)
        assert decode_image(t) == (7, 5)
