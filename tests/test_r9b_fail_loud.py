"""Round-9-continuation fail-loud certification sweep: every parser
added this session (CCITT/extended TIFF, APNG, zstd, LZ4, Snappy,
protobuf wire, MessagePack, CBOR), fed truncations/corruptions of ITS
OWN valid fixtures and random bytes, must raise its documented error
type — never an undocumented IndexError/KeyError/struct.error, never
hang, never return success on structurally-broken input.  Same sweep
contract as tests/test_r9_fail_loud.py.

Format-specific notes:
* protobuf is genuinely concatenative (a truncation at a field
  boundary IS a shorter valid message, and it carries no magic), so it
  is swept only for undocumented exception types, not for silent
  success;
* single-byte flips may legally decode to different content in
  formats whose spec does not checksum that region — silent success is
  allowed there, undocumented exceptions never are.
"""

import random

import pytest

from rust_dataframe_spark.operators.apng import (
    ApngError,
    apng_frames,
    encode_apng,
)
from rust_dataframe_spark.operators.cbor import (
    CborError,
    cbor_dumps,
    cbor_loads,
)
from rust_dataframe_spark.operators.lz4 import (
    Lz4Error,
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
)
from rust_dataframe_spark.operators.msgpack_codec import (
    MsgpackError,
    msgpack_dumps,
    msgpack_loads,
)
from rust_dataframe_spark.operators.protowire import (
    ProtoError,
    decode_message,
    encode_message,
)
from rust_dataframe_spark.operators.snappy import (
    SnappyError,
    snappy_compress,
    snappy_frame_compress,
    snappy_frame_decompress,
    snappy_uncompress,
)
from rust_dataframe_spark.operators.tiff import (
    TiffError,
    decode_tiff,
    encode_tiff,
)
from rust_dataframe_spark.operators import vorbis as _vorbis
from rust_dataframe_spark.operators.ogg import OggError as _OggError
from rust_dataframe_spark.operators.zstd import (
    ZstdError,
    zstd_compress,
    zstd_decompress,
)

_PROTO_SCHEMA = {
    1: ("id", "uint64"),
    2: ("name", "string"),
    3: ("scores", "sint64", "repeated"),
}


def _fixtures():
    """(name, valid_payload, decode_fn, allowed_exceptions,
    strict_truncation)."""
    text = (b"fail loud certification sweep payload " * 40)
    gray = bytes((3 * i) % 256 for i in range(8 * 6))
    bil = bytes(255 * ((x + y) % 3 == 0) for y in range(6) for x in range(17))
    jblk = bytes((19 * (x // 8) + 23 * (y // 8)) % 256
                 for y in range(16) for x in range(16))
    return [
        ("tiff_tiled",
         encode_tiff(10, 7, 3, bytes(210), tile=(4, 3), compression=5),
         decode_tiff, (TiffError,), True),
        ("tiff_planar",
         encode_tiff(5, 4, 3, bytes(60), planar=2, compression=32773),
         decode_tiff, (TiffError,), True),
        ("tiff_16",
         encode_tiff(8, 6, 1, [1000 * i % 65536 for i in range(48)],
                     bits=16),
         decode_tiff, (TiffError,), True),
        ("tiff_f32",
         encode_tiff(8, 6, 1, [i / 255 for i in range(48)],
                     sample_format=3),
         decode_tiff, (TiffError,), True),
        ("tiff_ccitt_g4", encode_tiff(17, 6, 1, bil, compression=4),
         decode_tiff, (TiffError,), True),
        ("tiff_ccitt_g3_2d",
         encode_tiff(17, 6, 1, bil, compression=3, t4_2d=True,
                     rows_per_strip=3),
         decode_tiff, (TiffError,), True),
        ("tiff_jpeg7",
         encode_tiff(16, 16, 1, jblk, compression=7, rows_per_strip=8,
                     jpeg_tables=True),
         decode_tiff, (TiffError,), True),
        ("apng",
         encode_apng(9, 7, [
             {"rgba": bytes(range(4)) * 63},
             {"rgba": bytes(24), "x": 1, "y": 1, "w": 3, "h": 2,
              "dispose": 2, "blend": 1},
         ]),
         apng_frames, (ApngError,), True),
        ("vorbis",
         _vorbis.encode_vorbis(
             8000, 2,
             [[[((7 + 13 * b + 29 * c + 11 * k) % 31) - 15
                for k in range(128)] for c in range(2)]
              for b in range(3)],
         ),
         _vorbis.decode_vorbis,
         (_vorbis.VorbisError, _OggError), True),
        ("zstd", zstd_compress(text), zstd_decompress,
         (ZstdError,), True),
        ("zstd_predef",
         zstd_compress(text, predefined_sequences=True),
         zstd_decompress, (ZstdError,), True),
        ("zstd_fse_weights",
         zstd_compress(bytes((7 * i * i + 13 * i) % 26 + 97
                             for i in range(2000)),
                       fse_weights=True),
         zstd_decompress, (ZstdError,), True),
        ("lz4_frame", lz4_frame_compress(text, block_checksum=True),
         lz4_frame_decompress, (Lz4Error,), True),
        ("lz4_block", lz4_block_compress(text),
         lambda b: lz4_block_decompress(b, len(text)),
         (Lz4Error,), True),
        ("snappy_block", snappy_compress(text), snappy_uncompress,
         (SnappyError,), True),
        ("snappy_frame", snappy_frame_compress(text),
         snappy_frame_decompress, (SnappyError,), True),
        ("msgpack",
         msgpack_dumps({"k": [1, "two", None, {"n": 3.5}],
                        "b": b"\x00\x01" * 30}),
         msgpack_loads, (MsgpackError,), True),
        ("cbor",
         cbor_dumps({"k": [1, "two", None, {"n": 3.5}],
                     "b": b"\x00\x01" * 30, "big": 1 << 70}),
         cbor_loads, (CborError,), True),
        ("protowire",
         encode_message(
             {"id": 7, "name": "doc", "scores": [1, -2, 3]},
             _PROTO_SCHEMA,
         ),
         lambda b: decode_message(b, _PROTO_SCHEMA),
         (ProtoError,), False),  # concatenative: see module docstring
    ]


class TestR9bFailLoudSweep:
    def test_valid_fixtures_decode(self):
        for name, blob, fn, _exc, _strict in _fixtures():
            fn(blob)

    def test_truncations_raise_typed(self):
        for name, blob, fn, exc, strict in _fixtures():
            for frac in (0.2, 0.5, 0.85):
                cut = blob[: int(len(blob) * frac)]
                try:
                    fn(cut)
                except exc:
                    continue
                except Exception as e:  # noqa: BLE001
                    pytest.fail(
                        f"{name} truncated@{frac}: undocumented "
                        f"{type(e).__name__}: {e}"
                    )
                else:
                    if strict:
                        pytest.fail(
                            f"{name} truncated@{frac}: silent success"
                        )

    def test_single_byte_flips_never_undocumented(self):
        rng = random.Random(1234)
        for name, blob, fn, exc, _strict in _fixtures():
            for _ in range(12):
                i = rng.randrange(len(blob))
                mutated = blob[:i] + bytes([blob[i] ^ 0xFF]) + blob[i + 1:]
                try:
                    fn(mutated)
                except exc:
                    pass
                except Exception as e:  # noqa: BLE001
                    pytest.fail(
                        f"{name} flip@{i}: undocumented "
                        f"{type(e).__name__}: {e}"
                    )

    def test_random_bytes_raise_typed(self):
        rng = random.Random(8)
        junk = bytes(rng.randrange(256) for _ in range(500))
        for name, _blob, fn, exc, _strict in _fixtures():
            if name == "protowire":
                continue  # no magic: junk can be a valid tag walk
            try:
                fn(junk)
            except exc:
                continue
            except Exception as e:  # noqa: BLE001
                pytest.fail(
                    f"{name} junk: undocumented {type(e).__name__}: {e}"
                )
            else:
                pytest.fail(f"{name} junk: silent success")
