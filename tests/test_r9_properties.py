"""Round-9 property-based tests (hypothesis): randomized round-trip
laws for the new codecs — shapes/values the hand fixtures don't reach."""

from hypothesis import given, settings, strategies as st

from rust_dataframe_spark.operators.bmp import decode_bmp, encode_bmp, \
    encode_bmp8
from rust_dataframe_spark.operators.mkv import decode_mkv, encode_mkv
from rust_dataframe_spark.operators.mp4 import decode_mp4, encode_mp4
from rust_dataframe_spark.operators.ogg import decode_ogg_audio, \
    encode_ogg_flac
from rust_dataframe_spark.operators.pnm import decode_pnm, encode_pnm
from rust_dataframe_spark.operators.tiff import (
    decode_tiff,
    encode_tiff,
    lzw_decode,
    lzw_encode,
    packbits_decode,
    packbits_encode,
)

SMALL = settings(max_examples=25, deadline=None)


@SMALL
@given(st.binary(min_size=0, max_size=4000))
def test_tiff_lzw_round_trip(data):
    assert lzw_decode(lzw_encode(data), len(data)) == data


@SMALL
@given(st.binary(min_size=0, max_size=2000))
def test_packbits_round_trip(data):
    assert packbits_decode(packbits_encode(data), len(data)) == data


@SMALL
@given(
    st.integers(1, 24), st.integers(1, 16),
    st.sampled_from([1, 5, 32773]), st.booleans(),
    st.integers(0, 5), st.randoms(use_true_random=False),
)
def test_tiff_gray_round_trip(w, h, comp, be, rps, rng):
    plane = bytes(rng.randrange(256) for _ in range(w * h))
    t = encode_tiff(w, h, 1, plane, compression=comp,
                    rows_per_strip=rps, big_endian=be)
    assert decode_tiff(t) == (w, h, 1, plane)


@SMALL
@given(st.integers(1, 16), st.integers(1, 12),
       st.randoms(use_true_random=False))
def test_bmp_24_and_palette_round_trip(w, h, rng):
    rgb = bytes(rng.randrange(256) for _ in range(w * h * 3))
    assert decode_bmp(encode_bmp(w, h, rgb)) == (w, h, 3, rgb)
    idx = bytes(rng.randrange(16) for _ in range(w * h))
    pal = [(rng.randrange(256), rng.randrange(256), rng.randrange(256))
           for _ in range(16)]
    ww, hh, c, px = decode_bmp(encode_bmp8(w, h, idx, pal))
    if c == 3:
        assert px == b"".join(bytes(pal[i]) for i in idx)
    else:  # randomly grayscale-identity palette: collapse is legal
        assert px == bytes(pal[i][0] for i in idx)


@SMALL
@given(st.integers(1, 20), st.integers(1, 10), st.booleans(),
       st.booleans(), st.randoms(use_true_random=False))
def test_pnm_round_trip(w, h, rgb_mode, ascii_mode, rng):
    c = 3 if rgb_mode else 1
    px = bytes(rng.randrange(256) for _ in range(w * h * c))
    assert decode_pnm(encode_pnm(w, h, c, px, ascii_mode=ascii_mode)) == (
        w, h, c, px,
    )


@SMALL
@given(st.integers(1, 2), st.integers(50, 600),
       st.integers(1, 255), st.randoms(use_true_random=False))
def test_ogg_flac_round_trip(nch, m, cap, rng):
    inter = [rng.randrange(-2000, 2001) for _ in range(m * nch)]
    blob = encode_ogg_flac(8000, nch, 16, inter, block_size=192,
                           max_segs_per_page=cap)
    rate, ch, bps, out = decode_ogg_audio(blob)
    assert (rate, ch, bps) == (8000, nch, 16)
    assert out == inter


@SMALL
@given(st.integers(1, 7), st.randoms(use_true_random=False))
def test_mp4_mkv_demux_byte_exact(n, rng):
    # arbitrary binary samples: demux must return them byte-exact in
    # order, independent of JPEG validity (demux is pure byte-slicing)
    frames = [
        bytes(rng.randrange(256) for _ in range(rng.randrange(1, 200)))
        for _ in range(n)
    ]
    assert decode_mp4(encode_mp4(16, 8, frames))[4] == frames
    assert decode_mkv(encode_mkv(16, 8, frames))[3] == frames
