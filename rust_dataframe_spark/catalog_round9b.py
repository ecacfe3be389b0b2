"""Catalog round 9 (continuation): TIFF gate closures + CCITT fax.

q441 exercises the four TIFF organizations that were documented gates
until this session — tiled layout, planar configuration 2, 16-bit
samples, float32 SampleFormat — and q442 the CCITT Group 3/4 fax
compressions (TIFF 6.0 compressions 2/3/4) through
``operators/ccitt.py``.  Both follow the q417 discipline: analytic
fixture planes regenerated exactly by the DuckDB oracle, decoded
through the full byte-real encode->decode path on executors, pinned by
position-weighted checksums that catch tile/plane/strip mis-assembly
(not just the value multiset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import query, table
from .sources.lakehouse_util import local_rows_df as _lrd

__all__: list[str] = []


# ---------------------------------------------------------------------------
# q441: TIFF extended-organization matrix (tiles / planar-2 / 16-bit / f32)
# ---------------------------------------------------------------------------
#
# Fixture (analytic in doc_id): w = 6 + d%7, h = 5 + (d//2)%5, byte order
# flips with d%2.  Mode d%4:
#   0: tiled RGB-8 (tile 4x3, LZW + predictor 2), byte (i,c) =
#      (d + 7i + 29c) % 256 at pixel i = y*w + x
#   1: planar-2 RGB-8 (PackBits, 2-row strips), same byte formula
#   2: 16-bit gray (uncompressed), v16 = (31d + 17x + 257y) % 65536,
#      decoded byte = v16 >> 8
#   3: float32 gray, k = (d + 11x + 13y) % 256 stored as k/255,
#      decoded byte = k
# Weighted checksum over the decoded byte plane (weight 1 + byte index)
# pins tile placement, plane interleave and row order.


@query(
    "q441_tiff_ext_matrix",
    oracle="""
    WITH d AS (SELECT doc_id, 6 + doc_id % 7 AS w, 5 + (doc_id // 2) % 5 AS h,
                      doc_id % 4 AS mode
               FROM documents WHERE doc_id < 48),
    gx AS (SELECT doc_id, w, h, mode, unnest(range(0, w)) AS x FROM d),
    g AS (SELECT doc_id, w, h, mode, x, unnest(range(0, h)) AS y FROM gx),
    rgbc AS (SELECT doc_id, w, h, mode, x, y, unnest(range(0, 3)) AS c
             FROM g WHERE mode < 2),
    rgb AS (SELECT doc_id, w, h, mode,
                   (doc_id + 7 * (y * w + x) + 29 * c) % 256 AS v,
                   1 + 3 * (y * w + x) + c AS wt
            FROM rgbc),
    gray AS (SELECT doc_id, w, h, mode,
                    CASE WHEN mode = 2
                         THEN ((31 * doc_id + 17 * x + 257 * y) % 65536) // 256
                         ELSE (doc_id + 11 * x + 13 * y) % 256 END AS v,
                    1 + y * w + x AS wt
             FROM g WHERE mode >= 2),
    allv AS (SELECT * FROM rgb UNION ALL SELECT * FROM gray)
    SELECT doc_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
           CAST(CASE WHEN max(mode) < 2 THEN 3 ELSE 1 END AS INT) AS channels,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(sum(wt * v) AS BIGINT) AS px_wsum
    FROM allv GROUP BY doc_id ORDER BY doc_id
    """,
)
def q441_tiff_ext_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIFF extended organizations (round-9 continuation —
    operators/tiff.py gate closures): each doc synthesizes an analytic
    plane and pushes it through one of the four previously-gated
    layouts — tiled (edge-tile crop + per-tile predictor), planar
    configuration 2 (plane-major strips re-interleaved), 16-bit samples
    (both byte orders, ``>> 8`` byte contract) and float32 SampleFormat
    (clamped [0,1] -> round(v*255)) — then decodes through the full IFD
    walk.  The position-weighted checksum catches any tile placement or
    plane-interleave drift a plain sum would miss.  Arrow-batched
    mapInPandas on executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 48
    )

    def synth_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.tiff import (
            decode_tiff,
            encode_tiff,
        )

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "channels": [],
                    "px_sum": [], "px_wsum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 6 + d % 7, 5 + (d // 2) % 5
                mode = d % 4
                be = bool(d % 2)
                if mode in (0, 1):
                    px = bytes(
                        (d + 7 * (y * w + x) + 29 * c) % 256
                        for y in range(h) for x in range(w)
                        for c in range(3)
                    )
                    if mode == 0:
                        blob = encode_tiff(
                            w, h, 3, px, tile=(4, 3), compression=5,
                            predictor=2, big_endian=be,
                        )
                    else:
                        blob = encode_tiff(
                            w, h, 3, px, planar=2, compression=32773,
                            rows_per_strip=2, big_endian=be,
                        )
                elif mode == 2:
                    vals = [
                        (31 * d + 17 * x + 257 * y) % 65536
                        for y in range(h) for x in range(w)
                    ]
                    blob = encode_tiff(
                        w, h, 1, vals, bits=16, big_endian=be
                    )
                else:
                    ks = [
                        (d + 11 * x + 13 * y) % 256
                        for y in range(h) for x in range(w)
                    ]
                    blob = encode_tiff(
                        w, h, 1, [k / 255 for k in ks],
                        sample_format=3, big_endian=be,
                    )
                W, H, C, out = decode_tiff(blob)
                rows["doc_id"].append(d)
                rows["width"].append(W)
                rows["height"].append(H)
                rows["channels"].append(C)
                rows["px_sum"].append(sum(out))
                rows["px_wsum"].append(
                    sum((1 + k) * v for k, v in enumerate(out))
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, width int, height int, channels int, "
        "px_sum bigint, px_wsum bigint",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q442: CCITT fax matrix (MH / G3-1D / G3-2D / G4 in TIFF)
# ---------------------------------------------------------------------------
#
# Fixture (analytic in doc_id): w = 11 + d%13, h = 6 + d%5; pixel (x,y)
# is black iff (3x + 5y + d) % 11 < 4 (run-structured, exercises pass/
# vertical/horizontal modes).  Compression cycles d%4: MH(2) / G3 1D(3) /
# G3 2D(3 + T4Options bit 0) / G4(4); 3-row strips so multi-strip CCITT
# (per-strip reference reset) is genuinely exercised.  Photometric 0:
# black decodes to gray 0, white to 255.


@query(
    "q442_ccitt_fax",
    oracle="""
    WITH d AS (SELECT doc_id, 11 + doc_id % 13 AS w, 6 + doc_id % 5 AS h
               FROM documents WHERE doc_id < 48),
    gx AS (SELECT doc_id, w, h, unnest(range(0, w)) AS x FROM d),
    g AS (SELECT doc_id, w, h, x, unnest(range(0, h)) AS y FROM gx),
    v AS (SELECT doc_id, w, h,
                 CASE WHEN (3 * x + 5 * y + doc_id) % 11 < 4
                      THEN 0 ELSE 255 END AS v,
                 CASE WHEN (3 * x + 5 * y + doc_id) % 11 < 4
                      THEN 1 ELSE 0 END AS blk,
                 1 + y * w + x AS wt
          FROM g)
    SELECT doc_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
           CAST(sum(blk) AS BIGINT) AS n_black,
           CAST(sum(wt * v) AS BIGINT) AS px_wsum
    FROM v GROUP BY doc_id ORDER BY doc_id
    """,
)
def q442_ccitt_fax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCITT Group 3/4 fax decode inside TIFF (round-9 continuation —
    operators/ccitt.py, ITU-T T.4/T.6): each doc rasterizes an analytic
    bilevel page, encodes it with the compression the doc class selects
    (Modified Huffman RLE / G3 1D with EOLs / G3 2D with tag bits / G4
    MMR) in 3-row strips, and decodes through the TIFF IFD walk.  The
    code tables are additionally pinned against spec-published
    codewords in tests; here the weighted checksum over the decoded
    gray plane pins run reconstruction and strip boundaries.
    Arrow-batched mapInPandas on executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 48
    )

    def synth_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.tiff import (
            decode_tiff,
            encode_tiff,
        )

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [],
                    "n_black": [], "px_wsum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 11 + d % 13, 6 + d % 5
                px = bytes(
                    0 if (3 * x + 5 * y + d) % 11 < 4 else 255
                    for y in range(h) for x in range(w)
                )
                comp = (2, 3, 3, 4)[d % 4]
                blob = encode_tiff(
                    w, h, 1, px, compression=comp,
                    t4_2d=(d % 4 == 2), rows_per_strip=3,
                    big_endian=bool(d % 2),
                )
                W, H, C, out = decode_tiff(blob)
                rows["doc_id"].append(d)
                rows["width"].append(W)
                rows["height"].append(H)
                rows["n_black"].append(sum(1 for v in out if v == 0))
                rows["px_wsum"].append(
                    sum((1 + k) * v for k, v in enumerate(out))
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, width int, height int, "
        "n_black bigint, px_wsum bigint",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q443: APNG compositing matrix — all dispose/blend ops, closed-form law
# ---------------------------------------------------------------------------
#
# Fixture geometry (analytic in doc_id, replayed exactly by the oracle):
# canvas W = 9 + d%6, H = 8 + (d//2)%5, three vertical bands of width
# bw = W // 3 (leftover columns x >= 3*bw are never patched).  Frames:
#   f0: full-canvas base, rgb c = (d + 2x + 3y + 11c) % 256, opaque,
#       blend SOURCE, dispose NONE
#   f1: band-1 patch (d + 5x + 7y + 13c) % 256 opaque, SOURCE,
#       dispose BACKGROUND -> band 1 is transparent black from f2 on
#   f2: band-2 patch (d + 4x + 9y + 17c) % 256, alpha 255 iff
#       (x + y + d) % 3 != 0 else 0, blend OVER (holes show base
#       through), dispose PREVIOUS -> band 2 reverts to base at f3
#   f3: band-0 patch (d + 6x + 8y + 19c) % 256 opaque, OVER, NONE
# Composited-canvas law per (frame, pixel, channel): band 1 shows patch1
# at f1 then transparent; band 2 shows masked patch2 only at f2; band 0
# shows patch3 only at f3; alpha is 255 everywhere except disposed
# band 1.  Weighted checksum (1 + RGBA byte index) pins placement.


@query(
    "q443_apng_composite",
    oracle="""
    WITH d AS (SELECT doc_id, 9 + doc_id % 6 AS w, 8 + (doc_id // 2) % 5 AS h,
                      (9 + doc_id % 6) // 3 AS bw
               FROM documents WHERE doc_id < 40),
    fr AS (SELECT doc_id, w, h, bw, unnest(range(0, 4)) AS f FROM d),
    cx AS (SELECT doc_id, w, h, bw, f, unnest(range(0, w)) AS x FROM fr),
    cy AS (SELECT doc_id, w, bw, f, x, unnest(range(0, h)) AS y FROM cx),
    cc AS (SELECT doc_id, w, bw, f, x, y, unnest(range(0, 4)) AS c FROM cy),
    px AS (SELECT doc_id, f,
                  CASE WHEN x < 3 * bw THEN x // bw ELSE -1 END AS band,
                  x, y, c, w
           FROM cc),
    v AS (SELECT doc_id, f,
                 CASE
                   WHEN c = 3 THEN
                     CASE WHEN f >= 2 AND band = 1 THEN 0 ELSE 255 END
                   WHEN f >= 2 AND band = 1 THEN 0
                   WHEN f = 1 AND band = 1
                     THEN (doc_id + 5 * x + 7 * y + 13 * c) % 256
                   WHEN f = 2 AND band = 2 AND (x + y + doc_id) % 3 <> 0
                     THEN (doc_id + 4 * x + 9 * y + 17 * c) % 256
                   WHEN f = 3 AND band = 0
                     THEN (doc_id + 6 * x + 8 * y + 19 * c) % 256
                   ELSE (doc_id + 2 * x + 3 * y + 11 * c) % 256
                 END AS v,
                 1 + 4 * (y * w + x) + c AS wt
          FROM px)
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(sum(wt * v) AS BIGINT) AS px_wsum
    FROM v GROUP BY doc_id, f ORDER BY doc_id, frame_idx
    """,
)
def q443_apng_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APNG animation decode + compositing (round-9 continuation —
    operators/apng.py): each doc synthesizes a 4-frame delta APNG
    executor-side — opaque base, a SOURCE band patch disposed to
    BACKGROUND, an OVER band patch with transparent holes disposed to
    PREVIOUS, and a final OVER patch — exercising both blend ops, all
    three dispose ops and the fdAT sequence walk.  Frames decode by
    reassembling standalone PNGs through the round-9 PNG codec, so the
    full filter/deflate surface is under test too.  The per-frame
    weighted RGBA checksum pins the compositing law against the
    oracle's closed form.  Arrow-batched mapInPandas on executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 40
    )

    def synth_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.apng import (
            apng_frames,
            encode_apng,
        )

        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "px_sum": [],
                    "px_wsum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                W, H = 9 + d % 6, 8 + (d // 2) % 5
                bw = W // 3

                def plane(x0, wd, rgb, alpha=None):
                    out = bytearray()
                    for y in range(H):
                        for x in range(x0, x0 + wd):
                            for c in range(3):
                                out.append(rgb(x, y, c))
                            out.append(
                                255 if alpha is None else alpha(x, y)
                            )
                    return bytes(out)

                base = plane(0, W, lambda x, y, c:
                             (d + 2 * x + 3 * y + 11 * c) % 256)
                p1 = plane(bw, bw, lambda x, y, c:
                           (d + 5 * x + 7 * y + 13 * c) % 256)
                p2 = plane(2 * bw, bw, lambda x, y, c:
                           (d + 4 * x + 9 * y + 17 * c) % 256,
                           alpha=lambda x, y:
                           255 if (x + y + d) % 3 != 0 else 0)
                p3 = plane(0, bw, lambda x, y, c:
                           (d + 6 * x + 8 * y + 19 * c) % 256)
                blob = encode_apng(
                    W, H,
                    [
                        {"rgba": base},
                        {"rgba": p1, "x": bw, "y": 0, "w": bw, "h": H,
                         "blend": 0, "dispose": 1},
                        {"rgba": p2, "x": 2 * bw, "y": 0, "w": bw,
                         "h": H, "blend": 1, "dispose": 2},
                        {"rgba": p3, "x": 0, "y": 0, "w": bw, "h": H,
                         "blend": 1, "dispose": 0},
                    ],
                )
                _, _, frames = apng_frames(blob)
                for fr in frames:
                    rgba = fr["rgba"]
                    rows["doc_id"].append(d)
                    rows["frame_idx"].append(fr["frame_idx"])
                    rows["px_sum"].append(sum(rgba))
                    rows["px_wsum"].append(
                        sum((1 + k) * v for k, v in enumerate(rgba))
                    )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, frame_idx int, px_sum bigint, px_wsum bigint",
    ).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# q444: zstd / lz4 corpus-shard ingestion through the archive front door
# ---------------------------------------------------------------------------
#
# Fixture (analytic in doc_id): each doc packs three text members
# part-0/1/2.txt into a tar; member m's text is the pattern
# 'w{d}m{m} ' repeated 20 + d%11 times (repetitive on purpose — the
# encoder must produce REAL matches/sequences, not stored blocks).  The
# tar is compressed with Zstandard (even docs) or an LZ4 frame (odd
# docs) and re-ingested via archive_members' magic sniff + outer-peel.
# The md5 over each member's recovered text is the exact content pin.


@query(
    "q444_zstd_lz4_shards",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents WHERE doc_id < 48),
    m AS (SELECT doc_id, unnest(range(0, 3)) AS member_idx FROM d),
    t AS (SELECT doc_id, member_idx,
                 repeat('w' || CAST(doc_id AS VARCHAR) || 'm'
                        || CAST(member_idx AS VARCHAR) || ' ',
                        CAST(20 + doc_id % 11 AS INT)) AS txt
          FROM m)
    SELECT doc_id, CAST(member_idx AS INT) AS member_idx,
           'part-' || CAST(member_idx AS VARCHAR) || '.txt' AS member_path,
           CAST(length(txt) AS BIGINT) AS n_bytes,
           md5(txt) AS content_md5
    FROM t ORDER BY doc_id, member_idx
    """,
)
def q444_zstd_lz4_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zstandard + LZ4 corpus-shard ingestion (round-9 continuation —
    operators/zstd.py, operators/lz4.py, RFC 8878 + the LZ4 frame
    spec): each doc packs an analytic three-member text tar, compresses
    it with the parity-selected codec (REAL FSE/Huffman-coded zstd
    blocks with XXH64 content checksum / hash-matched LZ4 frames with
    XXH32), and re-ingests through archive_members' magic sniff and
    outer-compression peel.  FSE tables ride in-stream (writeNCount /
    readNCount twins) on d%4==0 shards; d%4==2 shards use the RFC
    PREDEFINED distributions (mode 0) and FSE-compressed Huffman
    weights — the round-10 checksummed-only decode paths.  d%8==4
    shards are DICTIONARY-compressed (round 11, RFC 8878 §5): a
    structured dictionary (Huffman + OF/ML/LL tables, rep offsets,
    shared-boilerplate content) is held out-of-band as a real
    pipeline would, the frame records its Dictionary_ID, matches
    reach back into the dictionary content, and literals code
    TREELESS against the dictionary's Huffman table; decode without
    the dictionary (or with the wrong one) fails loudly under the
    enforced XXH64 checksum.  The encode
    side uses exact decode-table inversion, so every decoded byte
    crossed the real entropy coder.
    md5 per member pins content exactly.  Arrow-batched mapInPandas on
    executors; decompression is per-payload executor work at 100 TB."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 48
    )

    def synth_ingest(batches):
        import hashlib
        import io
        import tarfile

        import pandas as pd

        from rust_dataframe_spark.operators.archive import archive_members
        from rust_dataframe_spark.operators.lz4 import lz4_frame_compress
        from rust_dataframe_spark.operators.zstd import (
            build_zstd_dictionary,
            zstd_compress,
            zstd_decompress,
        )

        # out-of-band shared dictionary: boilerplate every shard's
        # members echo (digits + the w/m pattern alphabet)
        dict_bytes = build_zstd_dictionary(
            ("".join(f"w{i}m{j} " for i in range(10) for j in range(3))
             * 2).encode(),
            dict_id=4444,
        )
        for pdf in batches:
            rows = {"doc_id": [], "member_idx": [], "member_path": [],
                    "n_bytes": [], "content_md5": []}
            for d in pdf["doc_id"]:
                d = int(d)
                buf = io.BytesIO()
                with tarfile.open(fileobj=buf, mode="w") as tf:
                    for m in range(3):
                        body = (f"w{d}m{m} " * (20 + d % 11)).encode()
                        ti = tarfile.TarInfo(f"part-{m}.txt")
                        ti.size = len(body)
                        tf.addfile(ti, io.BytesIO(body))
                tar = buf.getvalue()
                if d % 8 == 4:
                    # dictionary shard: the dict is out-of-band, so
                    # the outer peel happens HERE (archive_members'
                    # magic sniff cannot know the dict) and the
                    # recovered tar goes through the same front door
                    blob = zstd_compress(
                        tar, dictionary=dict_bytes,
                        treeless_literals=True,
                    )
                    blob = zstd_decompress(
                        blob, dictionary=dict_bytes
                    )
                elif d % 2 == 0:
                    # d%4==2 shards cross the checksummed-only round-10
                    # paths: RFC predefined LL/OF/ML distributions
                    # (mode 0) + FSE-compressed Huffman weights
                    blob = zstd_compress(
                        tar,
                        predefined_sequences=(d % 4 == 2),
                        fse_weights=(d % 4 == 2),
                    )
                else:
                    blob = lz4_frame_compress(tar)
                for m, (path, body) in enumerate(archive_members(blob)):
                    rows["doc_id"].append(d)
                    rows["member_idx"].append(m)
                    rows["member_path"].append(path)
                    rows["n_bytes"].append(len(body))
                    rows["content_md5"].append(
                        hashlib.md5(body).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_ingest,
        "doc_id bigint, member_idx int, member_path string, "
        "n_bytes bigint, content_md5 string",
    ).orderBy("doc_id", "member_idx")


# ---------------------------------------------------------------------------
# q445: protobuf wire-format log ingestion
# ---------------------------------------------------------------------------
#
# Fixture (analytic in doc_id): each doc is one proto3 log record —
# uint64 id = 1000d + 7, string name = 'doc-{d}', packed repeated
# sint64 scores = [d - 3, 2d, -d] (zigzag on the wire), nested meta
# {lang by d%3, double quality = d/4}, bool flag = d%2 — encoded to
# canonical wire bytes and decoded back through the schema layer.


@query(
    "q445_protobuf_logs",
    oracle="""
    SELECT doc_id,
           CAST(1000 * doc_id + 7 AS BIGINT) AS rec_id,
           'doc-' || CAST(doc_id AS VARCHAR) AS name,
           CAST(3 AS INT) AS n_scores,
           CAST((doc_id - 3) + 2 * doc_id - doc_id AS BIGINT) AS scores_sum,
           CASE doc_id % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                ELSE 'fr' END AS lang,
           CAST(doc_id AS DOUBLE) / 4 AS quality,
           CAST(doc_id % 2 = 1 AS BOOLEAN) AS flag
    FROM documents WHERE doc_id < 48 ORDER BY doc_id
    """,
)
def q445_protobuf_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Protocol Buffers wire-format ingestion (round-9 continuation —
    operators/protowire.py, the proto3 encoding spec): each doc encodes
    an analytic log record to canonical wire bytes (base-128 varints,
    ZigZag sint64 in a packed LEN field, nested message, last-wins
    merge semantics) and decodes it back through the schema-driven
    layer.  The tag-walk hand vectors from the published encoding doc
    (08 96 01 et al.) are pinned in tests; here the closed-form oracle
    pins every typed value end-to-end.  Arrow-batched mapInPandas on
    executors — the shape of a 100 TB binary-log ingestion pass."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 48
    )

    def synth_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.protowire import (
            decode_message,
            encode_message,
        )

        schema = {
            1: ("id", "uint64"),
            2: ("name", "string"),
            3: ("scores", "sint64", "repeated"),
            4: ("meta", {1: ("lang", "string"), 2: ("quality", "double")}),
            5: ("flag", "bool"),
        }
        for pdf in batches:
            rows = {"doc_id": [], "rec_id": [], "name": [],
                    "n_scores": [], "scores_sum": [], "lang": [],
                    "quality": [], "flag": []}
            for d in pdf["doc_id"]:
                d = int(d)
                vals = {
                    "id": 1000 * d + 7,
                    "name": f"doc-{d}",
                    "scores": [d - 3, 2 * d, -d],
                    "meta": {"lang": ("en", "de", "fr")[d % 3],
                             "quality": d / 4},
                    "flag": bool(d % 2),
                }
                m = decode_message(encode_message(vals, schema), schema)
                rows["doc_id"].append(d)
                rows["rec_id"].append(m["id"])
                rows["name"].append(m["name"])
                rows["n_scores"].append(len(m["scores"]))
                rows["scores_sum"].append(sum(m["scores"]))
                rows["lang"].append(m["meta"]["lang"])
                rows["quality"].append(m["meta"]["quality"])
                rows["flag"].append(m["flag"])
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, rec_id bigint, name string, n_scores int, "
        "scores_sum bigint, lang string, quality double, flag boolean",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q446: MessagePack event-log ingestion
# ---------------------------------------------------------------------------
#
# Fixture (analytic in doc_id): each doc is one msgpack event —
# {"user": {"id": d, "lang": by d%3}, "items": [d, d+1, ... d + d%7 - 1]
# (d%7 entries), "score": double d/8, "tags": ["t0".."t{d%4}"],
# "blob": bytes of length 5 + d%9} — canonically encoded and decoded.


@query(
    "q446_msgpack_events",
    oracle="""
    WITH d AS (SELECT doc_id, doc_id % 7 AS ni, 1 + doc_id % 4 AS nt,
                      5 + doc_id % 9 AS nb
               FROM documents WHERE doc_id < 48)
    SELECT doc_id,
           CAST(doc_id AS BIGINT) AS user_id,
           CASE doc_id % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
                ELSE 'fr' END AS lang,
           CAST(ni AS INT) AS n_items,
           CAST(ni * doc_id + ni * (ni - 1) / 2 AS BIGINT) AS items_sum,
           CAST(doc_id AS DOUBLE) / 8 AS score,
           CAST(nt AS INT) AS n_tags,
           CAST(nb AS INT) AS blob_len
    FROM d ORDER BY doc_id
    """,
)
def q446_msgpack_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MessagePack event ingestion (round-9 continuation —
    operators/msgpack_codec.py, the published msgpack spec): each doc
    canonically encodes an analytic nested event (fixmap/fixarray/
    fixstr forms, bin payload, float64 score) and decodes it back
    through the strict decoder (trailing bytes, 0xC1, truncation all
    raise).  The spec's canonical-form hand vectors are pinned in
    tests; the closed-form oracle pins every extracted value.
    Arrow-batched mapInPandas on executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 48
    )

    def synth_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.msgpack_codec import (
            msgpack_dumps,
            msgpack_loads,
        )

        for pdf in batches:
            rows = {"doc_id": [], "user_id": [], "lang": [],
                    "n_items": [], "items_sum": [], "score": [],
                    "n_tags": [], "blob_len": []}
            for d in pdf["doc_id"]:
                d = int(d)
                ev = {
                    "user": {"id": d, "lang": ("en", "de", "fr")[d % 3]},
                    "items": [d + k for k in range(d % 7)],
                    "score": d / 8,
                    "tags": [f"t{k}" for k in range(1 + d % 4)],
                    "blob": bytes((d + k) % 256 for k in range(5 + d % 9)),
                }
                m = msgpack_loads(msgpack_dumps(ev))
                rows["doc_id"].append(d)
                rows["user_id"].append(m["user"]["id"])
                rows["lang"].append(m["user"]["lang"])
                rows["n_items"].append(len(m["items"]))
                rows["items_sum"].append(sum(m["items"]))
                rows["score"].append(m["score"])
                rows["n_tags"].append(len(m["tags"]))
                rows["blob_len"].append(len(m["blob"]))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, user_id bigint, lang string, n_items int, "
        "items_sum bigint, score double, n_tags int, blob_len int",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q447: Avro snappy-codec round trip (the Hadoop-default block codec)
# ---------------------------------------------------------------------------


@query(
    "q447_avro_snappy",
    oracle="""
    SELECT count(*)                       AS n_rows,
           count(s_name)                  AS n_names,
           round(sum(s_acctbal), 2)       AS bal_sum,
           min(s_name)                    AS min_name,
           max(s_suppkey)                 AS max_key,
           sum(s_nationkey)               AS nk_sum
    FROM supplier
    """,
)
def q447_avro_snappy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro container round trip under the SNAPPY codec (round-9
    continuation — operators/snappy.py behind sources/avro.py): the
    q331 sink/source shape, but every block now crosses the pure-stdlib
    Snappy block codec (hash-matched copy elements, not stored
    literals) with the Avro-spec big-endian CRC-32 of the uncompressed
    block verified on read.  Snappy is the Hadoop-default block codec,
    so this closes the most common real-world Avro ingestion gate.
    Executor-side mapInArrow write/read; the oracle aggregates the
    source parquet — equality proves the round trip lossless."""
    import os as _os

    from .catalog_sources import _scratch
    from .sources import avro as av

    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
    )
    path = _scratch("avro_snappy_supplier", sf_dir)
    av.write_avro_dir(s.repartition(4), path, codec="snappy")
    back = av.read_avro_dir(spark, path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("s_name").alias("n_names"),
        F.round(F.sum("s_acctbal"), 2).alias("bal_sum"),
        F.min("s_name").alias("min_name"),
        F.max("s_suppkey").alias("max_key"),
        F.sum("s_nationkey").alias("nk_sum"),
    )


# ---------------------------------------------------------------------------
# q448: CBOR event-record ingestion (RFC 8949)
# ---------------------------------------------------------------------------
#
# Fixture (analytic in doc_id): each doc canonically encodes
# {"rec": {"id": d, "kind": by d%3}, "vals": [d, 2d, ... (1 + d%5
# entries)], "ratio": d/16 (half/single/double preferred-width path),
# "payload": bytes of length 3 + d%6, "big": 2^64 + d (bignum tag 2)}
# and decodes it back through the strict decoder.


@query(
    "q448_cbor_events",
    oracle="""
    WITH d AS (SELECT doc_id, 1 + doc_id % 5 AS nv, 3 + doc_id % 6 AS nb
               FROM documents WHERE doc_id < 48)
    SELECT doc_id,
           CAST(doc_id AS BIGINT) AS rec_id,
           CASE doc_id % 3 WHEN 0 THEN 'click' WHEN 1 THEN 'view'
                ELSE 'scroll' END AS kind,
           CAST(nv AS INT) AS n_vals,
           CAST(doc_id * nv * (nv + 1) / 2 AS BIGINT) AS vals_sum,
           CAST(doc_id AS DOUBLE) / 16 AS ratio,
           CAST(nb AS INT) AS payload_len,
           CAST(doc_id AS BIGINT) AS big_minus_2_64
    FROM d ORDER BY doc_id
    """,
)
def q448_cbor_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CBOR event ingestion (round-9 continuation — operators/cbor.py,
    RFC 8949): each doc canonically encodes an analytic nested event
    (preferred serialization: smallest int widths, shortest round-
    tripping float, definite lengths; a beyond-uint64 bignum rides tag
    2) and decodes it back through the strict decoder (trailing bytes,
    stray break, reserved ai, non-UTF-8 all raise).  The RFC's Appendix
    A vector matrix is pinned verbatim in tests; the closed-form oracle
    pins every extracted value.  Arrow-batched mapInPandas on
    executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 48
    )

    def synth_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.cbor import (
            cbor_dumps,
            cbor_loads,
        )

        for pdf in batches:
            rows = {"doc_id": [], "rec_id": [], "kind": [], "n_vals": [],
                    "vals_sum": [], "ratio": [], "payload_len": [],
                    "big_minus_2_64": []}
            for d in pdf["doc_id"]:
                d = int(d)
                ev = {
                    "rec": {"id": d,
                            "kind": ("click", "view", "scroll")[d % 3]},
                    "vals": [d * (k + 1) for k in range(1 + d % 5)],
                    "ratio": d / 16,
                    "payload": bytes((d + k) % 256
                                     for k in range(3 + d % 6)),
                    "big": (1 << 64) + d,
                }
                m = cbor_loads(cbor_dumps(ev))
                rows["doc_id"].append(d)
                rows["rec_id"].append(m["rec"]["id"])
                rows["kind"].append(m["rec"]["kind"])
                rows["n_vals"].append(len(m["vals"]))
                rows["vals_sum"].append(sum(m["vals"]))
                rows["ratio"].append(m["ratio"])
                rows["payload_len"].append(len(m["payload"]))
                rows["big_minus_2_64"].append(m["big"] - (1 << 64))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, rec_id bigint, kind string, n_vals int, "
        "vals_sum bigint, ratio double, payload_len int, "
        "big_minus_2_64 bigint",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q449: JPEG-in-TIFF (compression 7) — the scanned-photo TIFF flavour
# ---------------------------------------------------------------------------
#
# Fixture (analytic in doc_id): w = 8*(1 + d%4), h = 24, 8-row strips
# (one JPEG stream per strip, MCU-aligned); 8x8 block (bx, by) is the
# constant (d + 19bx + 23by) % 256 — block-constant baseline JPEG with
# quant=1 round-trips pixel-exactly (q387).  Odd docs move the shared
# DQT/DHT into the JPEGTables tag (abbreviated per-strip streams).


@query(
    "q449_jpeg_in_tiff",
    oracle="""
    WITH d AS (SELECT doc_id, 8 * (1 + doc_id % 4) AS w, 24 AS h
               FROM documents WHERE doc_id < 40),
    bx AS (SELECT doc_id, w, h, unnest(range(0, w // 8)) AS bx FROM d),
    b AS (SELECT doc_id, w, h, bx, unnest(range(0, 3)) AS by FROM bx),
    v AS (SELECT doc_id, w, h,
                 (doc_id + 19 * bx + 23 * by) % 256 AS v,
                 bx, by
          FROM b)
    SELECT doc_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
           CAST(sum(64 * v) AS BIGINT) AS px_sum,
           CAST(sum(v * (bx + 8 * by + 1)) AS BIGINT) AS blk_wsum
    FROM v GROUP BY doc_id ORDER BY doc_id
    """,
)
def q449_jpeg_in_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-style JPEG-in-TIFF (round-9 continuation — TIFF compression
    7 through the full baseline JPEG codec): each doc encodes an
    analytic block-constant gray plane as one JPEG stream per 8-row
    strip, odd docs with the shared DQT/DHT hoisted into the JPEGTables
    tag (abbreviated streams spliced back after each strip's SOI), and
    decodes through the IFD walk + per-strip JPEG decode with dims
    enforcement.  Block-constant + quant=1 makes the lossy codec
    pixel-exact, so the closed-form oracle pins content; the
    block-weighted checksum pins strip order.  Arrow-batched
    mapInPandas on executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 40
    )

    def synth_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.tiff import (
            decode_tiff,
            encode_tiff,
        )

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [],
                    "px_sum": [], "blk_wsum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 * (1 + d % 4), 24
                px = bytes(
                    (d + 19 * (x // 8) + 23 * (y // 8)) % 256
                    for y in range(h) for x in range(w)
                )
                blob = encode_tiff(
                    w, h, 1, px, compression=7, rows_per_strip=8,
                    jpeg_tables=bool(d % 2), big_endian=bool(d % 2),
                )
                W, H, C, out = decode_tiff(blob)
                blk = 0
                for by in range(H // 8):
                    for bx in range(W // 8):
                        v = out[(by * 8) * W + bx * 8]
                        blk += v * (bx + 8 * by + 1)
                rows["doc_id"].append(d)
                rows["width"].append(W)
                rows["height"].append(H)
                rows["px_sum"].append(sum(out))
                rows["blk_wsum"].append(blk)
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, width int, height int, "
        "px_sum bigint, blk_wsum bigint",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q450: SQLite artifact ingestion (real-engine bytes, pure-stdlib parse)
# ---------------------------------------------------------------------------
#
# Fixture: each doc builds a REAL SQLite database with the bundled
# engine (sqlite3 + Connection.serialize) holding 40 + d%20 analytic
# rows — id INTEGER PRIMARY KEY (rowid alias), name text, val integer
# (sign-alternating so 1..6-byte twos-complement widths all appear),
# ratio real, tag nullable — and the pure-stdlib parser walks the
# b-tree back.  The decoder is thus pinned against the reference
# implementation's bytes, not an encoder twin.


@query(
    "q450_sqlite_ingest",
    oracle="""
    WITH d AS (SELECT doc_id, 40 + doc_id % 20 AS n
               FROM documents WHERE doc_id < 48),
    r AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d),
    v AS (SELECT doc_id, n, i,
                 CASE WHEN i % 2 = 0 THEN (doc_id + i) * 1000000
                      ELSE -(doc_id + i) * 1000000 END AS val,
                 CASE WHEN i % 4 = 0 THEN NULL
                      ELSE 't' || CAST(i % 7 AS VARCHAR) END AS tag
          FROM r)
    SELECT doc_id, CAST(max(n) AS INT) AS n_rows,
           CAST(sum(1 + i) AS BIGINT) AS id_sum,
           CAST(sum(val) AS BIGINT) AS val_sum,
           CAST(sum(CASE WHEN tag IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null_tags,
           CAST(count(DISTINCT tag) AS BIGINT) AS n_distinct_tags,
           CAST(sum(length('name-' || CAST(i AS VARCHAR))) AS BIGINT)
               AS name_chars
    FROM v GROUP BY doc_id ORDER BY doc_id
    """,
)
def q450_sqlite_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQLite artifact ingestion (round-9 continuation —
    operators/sqlite_reader.py, the published SQLite file format):
    each doc materializes an analytic table through the BUNDLED REAL
    SQLite engine and the pure-stdlib parser walks the header, table
    b-tree (interior + leaf pages), record serial types (all int
    widths via sign-alternating millions, text, real, NULL) and the
    INTEGER-PRIMARY-KEY rowid-alias rule back out.  Unlike the
    encoder-twin codecs, the fixture bytes here are third-party:
    agreement pins the parser against the reference implementation.
    Arrow-batched mapInPandas on executors — the shape of exploding
    scraped .sqlite/.db artifacts at corpus scale."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 48
    )

    def synth_ingest(batches):
        import sqlite3

        import pandas as pd

        from rust_dataframe_spark.operators.sqlite_reader import (
            sqlite_read_table,
        )

        for pdf in batches:
            rows = {"doc_id": [], "n_rows": [], "id_sum": [],
                    "val_sum": [], "n_null_tags": [],
                    "n_distinct_tags": [], "name_chars": []}
            for d in pdf["doc_id"]:
                d = int(d)
                n = 40 + d % 20
                conn = sqlite3.connect(":memory:")
                cur = conn.cursor()
                cur.execute(
                    "CREATE TABLE docs (id INTEGER PRIMARY KEY, "
                    "name TEXT, val INTEGER, ratio REAL, tag TEXT)"
                )
                cur.executemany(
                    "INSERT INTO docs (name, val, ratio, tag) "
                    "VALUES (?,?,?,?)",
                    [
                        (
                            f"name-{i}",
                            (d + i) * 1000000 * (1 if i % 2 == 0 else -1),
                            i / 4,
                            None if i % 4 == 0 else f"t{i % 7}",
                        )
                        for i in range(n)
                    ],
                )
                conn.commit()
                blob = bytes(conn.serialize())
                conn.close()
                cols, recs = sqlite_read_table(blob, "docs")
                assert cols == ["id", "name", "val", "ratio", "tag"]
                rows["doc_id"].append(d)
                rows["n_rows"].append(len(recs))
                rows["id_sum"].append(sum(r[0] for r in recs))
                rows["val_sum"].append(sum(r[2] for r in recs))
                rows["n_null_tags"].append(
                    sum(1 for r in recs if r[4] is None)
                )
                rows["n_distinct_tags"].append(
                    len({r[4] for r in recs if r[4] is not None})
                )
                rows["name_chars"].append(
                    sum(len(r[1]) for r in recs)
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_ingest,
        "doc_id bigint, n_rows int, id_sum bigint, val_sum bigint, "
        "n_null_tags bigint, n_distinct_tags bigint, name_chars bigint",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q451: Delta Lake log round trip — commit replay, overwrite, time travel
# ---------------------------------------------------------------------------
#
# Fixture (closed-form): commit 0 writes ids 0..29 partitioned by
# p = id % 3; commit 1 appends ids 100..108 (same law); commit 2
# dynamic-partition-OVERWRITES p=1 with ids 900..903; a checkpoint
# collapses the log; commit 3 appends id 5000 at p=2.  The output is
# the per-partition (snapshot, p) algebra at BOTH the latest version
# (post-overwrite, post-checkpoint — exercises checkpoint bootstrap)
# and time-travel version 1 (pre-overwrite), which the oracle replays
# from the same commit law with range() arithmetic.


@query(
    "q451_delta_log",
    oracle="""
    WITH c0 AS (SELECT unnest(range(0, 30)) AS id),
    c1 AS (SELECT 100 + unnest(range(0, 9)) AS id),
    c2 AS (SELECT 900 + unnest(range(0, 4)) AS id),
    v1 AS (SELECT id, id % 3 AS p FROM c0
           UNION ALL SELECT id, id % 3 AS p FROM c1),
    latest AS (SELECT id, p FROM v1 WHERE p <> 1
               UNION ALL SELECT id, 1 AS p FROM c2
               UNION ALL SELECT 5000 AS id, 2 AS p),
    snaps AS (SELECT 'latest' AS snap, p, id FROM latest
              UNION ALL SELECT 'v1' AS snap, p, id FROM v1)
    SELECT snap, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum
    FROM snaps GROUP BY snap, p ORDER BY snap, p
    """,
)
def q451_delta_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta Lake transaction-log round trip (round-9 continuation —
    sources/delta.py, the PUBLIC delta.io protocol, no delta-jar):
    builds a partitioned table through four commits including a
    dynamic-partition overwrite (remove actions) and a parquet
    checkpoint, then reads BOTH the latest snapshot (bootstrapping from
    the checkpoint + JSON tail) and time-travel version 1
    (pre-overwrite).  Partition values are re-injected via ONE
    distributed parquet scan + an input_file_name broadcast-map join —
    no per-partition union chain, the shape that holds at 100 TB.
    Deletion-vector / column-mapping tables gate loudly."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.delta import (
        read_delta,
        write_delta_checkpoint,
        write_delta_commit,
    )

    path = _scratch("delta_table", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i, i % 3) for i in range(0, 30)], "id int, p int"),
        partition_by=["p"],
    )
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i, i % 3) for i in range(100, 109)], "id int, p int"),
        partition_by=["p"],
    )
    write_delta_commit(
        spark, path,
        _lrd(spark, [(i, 1) for i in range(900, 904)], "id int, p int"),
        partition_by=["p"], replace_partitions=True,
    )
    write_delta_checkpoint(spark, path)
    write_delta_commit(
        spark, path,
        _lrd(spark, [(5000, 2)], "id int, p int"),
        partition_by=["p"],
    )
    latest = read_delta(spark, path).withColumn("snap", F.lit("latest"))
    v1 = read_delta(spark, path, version=1).withColumn(
        "snap", F.lit("v1")
    )
    return (
        latest.unionByName(v1)
        .groupBy("snap", "p")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("id_sum"))
        .orderBy("snap", "p")
    )


# ---------------------------------------------------------------------------
# q452: Iceberg snapshot round trip — manifest walk, overwrite, time travel
# ---------------------------------------------------------------------------
#
# Fixture (closed-form, the q451 shape with p = id % 3 throughout):
# snapshot A writes ids 0..29; snapshot B appends ids 100..108;
# snapshot C dynamic-partition-overwrites p=1 with ids 900..903.  The
# output is the per-partition algebra at the CURRENT snapshot and at
# time-travel snapshot B, replayed by the oracle with range arithmetic.


@query(
    "q452_iceberg_table",
    oracle="""
    WITH c0 AS (SELECT unnest(range(0, 30)) AS id),
    c1 AS (SELECT 100 + unnest(range(0, 9)) AS id),
    c2 AS (SELECT 900 + unnest(range(0, 4)) AS id),
    sb AS (SELECT id, id % 3 AS p FROM c0
           UNION ALL SELECT id, id % 3 AS p FROM c1),
    cur AS (SELECT id, p FROM sb WHERE p <> 1
            UNION ALL SELECT id, 1 AS p FROM c2),
    snaps AS (SELECT 'current' AS snap, p, id FROM cur
              UNION ALL SELECT 'prev' AS snap, p, id FROM sb)
    SELECT snap, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum
    FROM snaps GROUP BY snap, p ORDER BY snap, p
    """,
)
def q452_iceberg_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache Iceberg snapshot round trip (round-9 continuation —
    sources/iceberg.py, the public table spec, no iceberg-runtime):
    three snapshots (append, append, dynamic-partition overwrite), the
    manifest-list -> manifest walk running through the repo's own
    nested-Avro codec, identity-partition values re-injected via one
    distributed scan + input_file_name broadcast-map join, and
    snapshot-id time travel back to the pre-overwrite census.  Delete
    manifests / v2 delete files / non-identity transforms gate loudly."""
    import shutil

    from .catalog_sources import _scratch
    from .sources.iceberg import read_iceberg, write_iceberg_commit

    path = _scratch("iceberg_table", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 3) for i in range(0, 30)], "id int, p int"),
        partition_by=["p"],
    )
    s_prev = write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, i % 3) for i in range(100, 109)], "id int, p int"),
        partition_by=["p"],
    )
    write_iceberg_commit(
        spark, path,
        _lrd(spark, [(i, 1) for i in range(900, 904)], "id int, p int"),
        partition_by=["p"], replace_partitions=True,
    )
    cur = read_iceberg(spark, path).withColumn("snap", F.lit("current"))
    prev = read_iceberg(spark, path, snapshot_id=s_prev).withColumn(
        "snap", F.lit("prev")
    )
    return (
        cur.unionByName(prev)
        .groupBy("snap", "p")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("id_sum"))
        .orderBy("snap", "p")
    )


# ---------------------------------------------------------------------------
# q453: Hudi COW snapshot round trip — file slices, upsert, time travel
# ---------------------------------------------------------------------------
#
# Fixture (closed-form, one file group per partition per commit via
# repartition on p): instant A writes ids 0..29 (p = id % 3); instant B
# appends ids 100..108 (new file groups); instant C UPSERTS partition
# p=1's instant-A file group with ids 900..903 (a new file VERSION of
# the same group — the copy-on-write shape).  Current snapshot: p1 =
# instant-B group + upserted group; as-of B: the pre-upsert census.


@query(
    "q453_hudi_table",
    oracle="""
    WITH c0 AS (SELECT unnest(range(0, 30)) AS id),
    c1 AS (SELECT 100 + unnest(range(0, 9)) AS id),
    c2 AS (SELECT 900 + unnest(range(0, 4)) AS id),
    pre AS (SELECT id, id % 3 AS p FROM c0
            UNION ALL SELECT id, id % 3 AS p FROM c1),
    cur AS (SELECT id, p FROM pre WHERE p <> 1 OR id >= 100
            UNION ALL SELECT id, 1 AS p FROM c2),
    snaps AS (SELECT 'current' AS snap, p, id FROM cur
              UNION ALL SELECT 'asof' AS snap, p, id FROM pre)
    SELECT snap, CAST(p AS INT) AS p,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(id) AS BIGINT) AS id_sum
    FROM snaps GROUP BY snap, p ORDER BY snap, p
    """,
)
def q453_hudi_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache Hudi copy-on-write snapshot round trip (round-9
    continuation — sources/hudi.py, the public timeline/layout, no
    hudi bundle): three instants (two appends, then an UPSERT that
    writes a new VERSION of one partition's file group), file-slice
    resolution keeping the newest version per (partition, fileId) at
    the queried instant, hive-path partition re-injection via the
    one-scan broadcast join, and as-of time travel to the pre-upsert
    census.  Merge-on-read timelines and log files gate loudly."""
    import os as _os
    import re as _re
    import shutil

    from .catalog_sources import _scratch
    from .sources.hudi import (
        hudi_snapshot_files,
        read_hudi,
        write_hudi_commit,
    )

    path = _scratch("hudi_table", sf_dir)
    shutil.rmtree(path, ignore_errors=True)
    df0 = _lrd(spark, [(i, i % 3) for i in range(0, 30)], "id int, p int")
    t0 = write_hudi_commit(spark, path, df0, partition_by=["p"])
    df1 = _lrd(spark, [(i, i % 3) for i in range(100, 109)], "id int, p int")
    t1 = write_hudi_commit(spark, path, df1, partition_by=["p"])
    fid = None
    for part, f in hudi_snapshot_files(path):
        name = _os.path.basename(f)
        if part == "p=1" and name.endswith(f"_{t0}.parquet"):
            fid = _re.match(r"^([0-9a-f-]+)_", name).group(1)
    write_hudi_commit(
        spark, path,
        _lrd(spark, [(900 + i, 1) for i in range(4)],
                              "id int, p int"),
        partition_by=["p"], upsert_into={"p=1": fid},
    )
    cur = read_hudi(spark, path).withColumn("snap", F.lit("current"))
    asof = read_hudi(spark, path, as_of=t1).withColumn(
        "snap", F.lit("asof")
    )
    return (
        cur.unionByName(asof)
        .select("snap", F.col("p").cast("int").alias("p"), "id")
        .groupBy("snap", "p")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("id").alias("id_sum"))
        .orderBy("snap", "p")
    )


# ---------------------------------------------------------------------------
# q454: sitemap + RSS frontier discovery — the crawl-policy layer's
# discovery half (pairs with q425 robots / q426 canonicalization)
# ---------------------------------------------------------------------------
#
# Fixture (analytic in doc_id): even docs synthesize a sitemaps.org
# urlset with 5 + d%6 entries (url k dated iff k%2==0 with lastmod =
# 2024-01-01 + (d+k)%28 days; priority (k%10)/10 iff k%3==0),
# gzip-wrapped when d%4==0; odd docs an RSS 2.0 channel with 3 + d%4
# items whose pubDates are RFC-822 renderings of
# 1709546400000 + k*3600000 ms.  The parsers recover every value.


@query(
    "q454_feed_discovery",
    oracle="""
    WITH d AS (SELECT doc_id,
                      CASE WHEN doc_id % 2 = 0 THEN 5 + doc_id % 6
                           ELSE 3 + doc_id % 4 END AS n
               FROM documents WHERE doc_id < 48),
    e AS (SELECT doc_id, n, unnest(range(0, n)) AS k FROM d),
    sm AS (SELECT doc_id, n, k,
                  CASE WHEN k % 2 = 0 THEN
                    (1704067200 + ((doc_id + k) % 28) * 86400) * 1000
                  END AS lastmod_ms,
                  CASE WHEN k % 3 = 0 THEN k % 10 END AS prio10
           FROM e WHERE doc_id % 2 = 0),
    rss AS (SELECT doc_id, n, k,
                   1709546400000 + k * 3600000 AS pub_ms
            FROM e WHERE doc_id % 2 = 1),
    agg AS (
      SELECT doc_id, 'sitemap' AS fmt, CAST(max(n) AS INT) AS n_entries,
             CAST(count(lastmod_ms) AS INT) AS n_dated,
             CAST(coalesce(sum(lastmod_ms), 0) AS BIGINT) AS dated_ms_sum,
             CAST(coalesce(sum(prio10), 0) AS BIGINT) AS prio10_sum
      FROM sm GROUP BY doc_id
      UNION ALL
      SELECT doc_id, 'rss' AS fmt, CAST(max(n) AS INT) AS n_entries,
             CAST(count(pub_ms) AS INT) AS n_dated,
             CAST(sum(pub_ms) AS BIGINT) AS dated_ms_sum,
             CAST(0 AS BIGINT) AS prio10_sum
      FROM rss GROUP BY doc_id)
    SELECT * FROM agg ORDER BY doc_id
    """,
)
def q454_feed_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap + RSS frontier discovery (round-9 continuation —
    operators/feeds.py): even docs synthesize a sitemaps.org urlset
    (W3C date-only lastmods, priorities, gzip wrap by doc class), odd
    docs an RSS 2.0 channel with RFC-822 pubDates, and the stdlib-XML
    parsers (entity-expansion guard on) recover every timestamp and
    priority the closed-form oracle replays.  Discovery output is what
    feeds q426's canonicalization and q425's robots gate — the full
    crawl-frontier pipeline.  Arrow-batched mapInPandas on
    executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 48
    )

    def synth_parse(batches):
        import email.utils as eut
        import gzip as gz
        from datetime import datetime, timezone

        import pandas as pd

        from rust_dataframe_spark.operators.feeds import (
            parse_feed,
            parse_sitemap,
        )

        for pdf in batches:
            rows = {"doc_id": [], "fmt": [], "n_entries": [],
                    "n_dated": [], "dated_ms_sum": [], "prio10_sum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                if d % 2 == 0:
                    n = 5 + d % 6
                    parts = []
                    for k in range(n):
                        fields = [f"<loc>https://ex{d}.com/p/{k}</loc>"]
                        if k % 2 == 0:
                            days = (d + k) % 28
                            dt = datetime.fromtimestamp(
                                1704067200 + days * 86400, timezone.utc
                            )
                            fields.append(
                                f"<lastmod>{dt:%Y-%m-%d}</lastmod>"
                            )
                        if k % 3 == 0:
                            fields.append(
                                f"<priority>{(k % 10) / 10:.1f}"
                                "</priority>"
                            )
                        parts.append(
                            "<url>" + "".join(fields) + "</url>"
                        )
                    xml = (
                        '<urlset xmlns="http://www.sitemaps.org/'
                        'schemas/sitemap/0.9">' + "".join(parts)
                        + "</urlset>"
                    ).encode()
                    if d % 4 == 0:
                        xml = gz.compress(xml)
                    ents = parse_sitemap(xml)
                    dated = [e["lastmod_ms"] for e in ents
                             if e["lastmod_ms"] is not None]
                    prios = [e["priority"] for e in ents
                             if e["priority"] is not None]
                    rows["doc_id"].append(d)
                    rows["fmt"].append("sitemap")
                    rows["n_entries"].append(len(ents))
                    rows["n_dated"].append(len(dated))
                    rows["dated_ms_sum"].append(sum(dated))
                    rows["prio10_sum"].append(
                        int(round(sum(prios) * 10))
                    )
                else:
                    n = 3 + d % 4
                    items = []
                    for k in range(n):
                        ms = 1709546400000 + k * 3600000
                        dt = datetime.fromtimestamp(
                            ms / 1000, timezone.utc
                        )
                        items.append(
                            f"<item><guid>g{d}-{k}</guid>"
                            f"<link>https://ex{d}.com/p/{k}</link>"
                            f"<pubDate>{eut.format_datetime(dt)}"
                            "</pubDate></item>"
                        )
                    xml = (
                        '<rss version="2.0"><channel><title>'
                        f"f{d}</title>" + "".join(items)
                        + "</channel></rss>"
                    ).encode()
                    f = parse_feed(xml)
                    pubs = [e["published_ms"] for e in f["entries"]]
                    assert all(p is not None for p in pubs)
                    rows["doc_id"].append(d)
                    rows["fmt"].append("rss")
                    rows["n_entries"].append(len(f["entries"]))
                    rows["n_dated"].append(len(pubs))
                    rows["dated_ms_sum"].append(sum(pubs))
                    rows["prio10_sum"].append(0)
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_parse,
        "doc_id bigint, fmt string, n_entries int, n_dated int, "
        "dated_ms_sum bigint, prio10_sum bigint",
    ).orderBy("doc_id")
