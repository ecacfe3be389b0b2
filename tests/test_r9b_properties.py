"""Round-9-continuation property-based tests (hypothesis): randomized
round-trip laws for the session's codecs — compression (zstd/lz4/
snappy), serialization (protobuf/msgpack/cbor), CCITT bilevel planes,
the extended TIFF organizations, APNG full-frame parity, and xxHash
incrementality-free reference identities."""

from hypothesis import given, settings, strategies as st

from rust_dataframe_spark.operators.apng import apng_frames, encode_apng
from rust_dataframe_spark.operators.cbor import cbor_dumps, cbor_loads
from rust_dataframe_spark.operators.ccitt import (
    decode_g3,
    decode_g4,
    decode_mh,
    encode_g3,
    encode_g4,
    encode_mh,
)
from rust_dataframe_spark.operators.lz4 import (
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
)
from rust_dataframe_spark.operators.msgpack_codec import (
    msgpack_dumps,
    msgpack_loads,
)
from rust_dataframe_spark.operators.protowire import (
    decode_message,
    encode_message,
)
from rust_dataframe_spark.operators.snappy import (
    snappy_compress,
    snappy_frame_compress,
    snappy_frame_decompress,
    snappy_uncompress,
)
from rust_dataframe_spark.operators.tiff import decode_tiff, encode_tiff
from rust_dataframe_spark.operators.zstd import (
    zstd_compress,
    zstd_decompress,
)

SMALL = settings(max_examples=25, deadline=None)
TINY = settings(max_examples=12, deadline=None)

# mixed-entropy binary: random segments + repeated segments, the shape
# that drives both literal and match paths
_mixed = st.lists(
    st.one_of(
        st.binary(min_size=0, max_size=200),
        st.tuples(
            st.binary(min_size=1, max_size=12), st.integers(2, 60)
        ).map(lambda t: t[0] * t[1]),
    ),
    min_size=0, max_size=8,
).map(b"".join)


@SMALL
@given(_mixed)
def test_zstd_round_trip(data):
    assert zstd_decompress(zstd_compress(data)) == data


@SMALL
@given(_mixed)
def test_lz4_round_trip(data):
    assert lz4_block_decompress(lz4_block_compress(data), len(data)) == data
    assert lz4_frame_decompress(lz4_frame_compress(data)) == data


@SMALL
@given(_mixed)
def test_snappy_round_trip(data):
    assert snappy_uncompress(snappy_compress(data)) == data
    assert snappy_frame_decompress(snappy_frame_compress(data)) == data


_json_ish = st.recursive(
    st.one_of(
        st.none(),
        st.booleans(),
        st.integers(-(2 ** 63), 2 ** 63 - 1),
        st.text(max_size=20),
        st.binary(max_size=20),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
    ),
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(max_size=8), inner, max_size=4),
    ),
    max_leaves=20,
)


@SMALL
@given(_json_ish)
def test_msgpack_round_trip(obj):
    assert msgpack_loads(msgpack_dumps(obj)) == obj


@SMALL
@given(_json_ish)
def test_cbor_round_trip(obj):
    assert cbor_loads(cbor_dumps(obj)) == obj


@SMALL
@given(st.integers(-(2 ** 200), 2 ** 200))
def test_cbor_bignum_round_trip(n):
    assert cbor_loads(cbor_dumps(n)) == n


_PROTO_SCHEMA = {
    1: ("id", "uint64"),
    2: ("name", "string"),
    3: ("scores", "sint64", "repeated"),
    4: ("meta", {1: ("lang", "string"), 2: ("q", "double")}),
    5: ("flag", "bool"),
}


@SMALL
@given(
    st.integers(0, 2 ** 64 - 1),
    st.text(max_size=16),
    st.lists(st.integers(-(2 ** 40), 2 ** 40), max_size=6),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.booleans(),
)
def test_protobuf_round_trip(rid, name, scores, q, flag):
    vals = {
        "id": rid, "name": name, "scores": scores,
        "meta": {"lang": "xx", "q": q}, "flag": flag,
    }
    got = decode_message(encode_message(vals, _PROTO_SCHEMA), _PROTO_SCHEMA)
    want = {k: v for k, v in vals.items() if v != []}
    assert got == want


@TINY
@given(
    st.integers(1, 40), st.integers(1, 8),
    st.sampled_from(["mh", "g3", "g3_2d", "g4"]),
    st.lists(st.integers(0, 1), min_size=1, max_size=320),
)
def test_ccitt_round_trip(w, h, flavour, bits):
    px = bytes((bits * (w * h // len(bits) + 1))[: w * h])
    if flavour == "mh":
        assert decode_mh(encode_mh(px, w, h), w, h) == px
    elif flavour == "g3":
        assert decode_g3(encode_g3(px, w, h), w, h) == px
    elif flavour == "g3_2d":
        assert decode_g3(
            encode_g3(px, w, h, two_d=True), w, h, two_d=True
        ) == px
    else:
        assert decode_g4(encode_g4(px, w, h), w, h) == px


@TINY
@given(
    st.integers(1, 20), st.integers(1, 12),
    st.integers(1, 6), st.integers(1, 6),
    st.booleans(), st.integers(0, 255),
)
def test_tiff_tiled_round_trip(w, h, tw, th, be, seed):
    px = bytes((seed + 3 * i) % 256 for i in range(w * h * 3))
    blob = encode_tiff(w, h, 3, px, tile=(tw, th), compression=5,
                       predictor=2, big_endian=be)
    assert decode_tiff(blob) == (w, h, 3, px)


@TINY
@given(st.integers(1, 16), st.integers(1, 8), st.booleans(),
       st.lists(st.integers(0, 65535), min_size=1, max_size=8))
def test_tiff_16bit_round_trip(w, h, be, vals):
    samples = [(vals[i % len(vals)] + i) % 65536 for i in range(w * h)]
    blob = encode_tiff(w, h, 1, samples, bits=16, big_endian=be)
    assert decode_tiff(blob) == (w, h, 1, bytes(v >> 8 for v in samples))


@TINY
@given(st.integers(2, 10), st.integers(2, 8), st.integers(0, 255))
def test_apng_full_frame_source_parity(w, h, seed):
    """Full-canvas SOURCE frames composite to exactly the raw frames."""
    f0 = bytes((seed + i) % 256 for i in range(w * h * 4))
    f1 = bytes((seed + 7 * i) % 256 for i in range(w * h * 4))
    _, _, frames = apng_frames(encode_apng(w, h, [
        {"rgba": f0}, {"rgba": f1, "blend": 0},
    ]))
    assert [f["rgba"] for f in frames] == [f0, f1]
