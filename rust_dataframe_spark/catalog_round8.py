"""Catalog round 8: GIF partial-frame compositing, multichannel ADPCM,
and the remaining verdict-directed codec/oracle surface.

Closes VERDICT r7's ranked gaps that add catalog surface: real animated
GIFs store sub-rectangle frame DELTAS composited under the GIF89a
disposal methods (q405 — the last pure-stdlib image gate real corpora
hit), and stereo ADPCM WAV (q406/q407).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import query, table

__all__: list[str] = []


# ---------------------------------------------------------------------------
# q405: GIF89a partial-frame disposal compositing, closed-form pixel checksum
# ---------------------------------------------------------------------------
#
# Fixture geometry (all analytic in doc_id, replayed exactly by the oracle):
# logical screen W x H; four vertical bands of width bw = W // 4 (leftover
# columns x >= 4*bw are never patched); palette row i = (i, 2i, 3i) so every
# composited pixel contributes 6 * index to the byte checksum; background
# index 5.  Five frames:
#   f0: full-screen base b(x,y) = (x + 2y + d) % 64, disposal 1 (keep)
#   f1: band-1 patch  (x + 3y + 7  + d) % 64,        disposal 1 (keep)
#   f2: band-2 patch  (x + 3y + 14 + d) % 64,        disposal 2 (bg-restore)
#   f3: band-3 patch  (x + 3y + 21 + d) % 63, transparent idx 63 where
#       (x + y + d) % 3 == 0 (the % 63 guarantees no accidental 63),
#       disposal 3 (restore-to-previous)
#   f4: band-0 patch  (x + 3y + 28 + d) % 64,        disposal 0
# Composited-screen law the oracle replays per (frame, pixel):
#   band 1 shows its patch from f1 on; band 2 shows its patch only at f2,
#   then BACKGROUND (disposal 2) from f3 on; band 3 shows its patch only at
#   f3 (transparent pixels show base through) and reverts to base at f4
#   (disposal 3); band 0 shows its patch only at f4.


@query(
    "q405_gif_composite",
    oracle="""
    WITH d AS (SELECT doc_id, 8 + doc_id % 8 AS w, 8 + (3 * doc_id) % 8 AS h,
                      (8 + doc_id % 8) // 4 AS bw
               FROM documents WHERE doc_id < 40),
    fr AS (SELECT doc_id, w, h, bw, unnest(range(0, 5)) AS f FROM d),
    cx AS (SELECT doc_id, w, h, bw, f, unnest(range(0, w)) AS x FROM fr),
    cc AS (SELECT doc_id, bw, f, x, unnest(range(0, h)) AS y FROM cx),
    px AS (SELECT doc_id, f,
                  CASE WHEN x < 4 * bw THEN x // bw ELSE -1 END AS band,
                  x, y
           FROM cc),
    v AS (SELECT doc_id, f,
                 CASE
                   WHEN f >= 1 AND band = 1
                     THEN (x + 3 * y + 7 + doc_id) % 64
                   WHEN f = 2 AND band = 2
                     THEN (x + 3 * y + 14 + doc_id) % 64
                   WHEN f >= 3 AND band = 2 THEN 5
                   WHEN f = 3 AND band = 3 AND (x + y + doc_id) % 3 <> 0
                     THEN (x + 3 * y + 21 + doc_id) % 63
                   WHEN f = 4 AND band = 0
                     THEN (x + 3 * y + 28 + doc_id) % 64
                   ELSE (x + 2 * y + doc_id) % 64
                 END AS idx
          FROM px)
    SELECT doc_id, CAST(f AS INT) AS frame_idx,
           CAST(40 * f AS BIGINT) AS frame_ts_ms,
           CAST(sum(6 * idx) AS BIGINT) AS px_sum
    FROM v GROUP BY doc_id, f ORDER BY doc_id, frame_idx
    """,
)
def q405_gif_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL partial-frame animated-GIF decode (VERDICT r7 #1, the top
    next-round item): each doc synthesizes a 5-frame delta GIF executor-
    side — full base frame, then three sub-rectangle band patches plus a
    band-0 patch, exercising ALL FOUR GIF89a disposal methods (keep,
    background-restore, previous-restore, unspecified) AND GCE
    transparency — via :func:`operators.gif.encode_gif_frames`, and
    ``sample_frames(fake_decode=False)`` decodes the COMPOSITED logical
    screens through :func:`operators.gif.decode_gif`'s round-8
    compositor.  The per-frame pixel checksum (palette row i is
    (i, 2i, 3i) -> 6*index per pixel) pins the full compositing law
    against the oracle's closed form: which band shows base / patch /
    background / restored-base at each frame is exactly the disposal
    semantics.  The parity law (composited == raw for full-frame inputs)
    is pinned in tests/test_llm_ops.py.  All decode work is Arrow-batched
    mapInPandas on executors; the driver never sees frame bytes."""
    from pyspark.sql.functions import pandas_udf

    from .operators import multimodal as mm

    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 40
    )

    def synth(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.gif import encode_gif_frames

        pal = [(i, 2 * i, 3 * i) for i in range(64)]
        for pdf in batches:
            ids, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 + d % 8, 8 + (3 * d) % 8
                bw = w // 4
                base = bytes(
                    (x + 2 * y + d) % 64 for y in range(h) for x in range(w)
                )

                def band_patch(g: int, shift: int, mod: int = 64) -> bytes:
                    return bytes(
                        (g * bw + xx + 3 * yy + shift + d) % mod
                        for yy in range(h)
                        for xx in range(bw)
                    )

                p3 = bytes(
                    63
                    if (3 * bw + xx + yy + d) % 3 == 0
                    else (3 * bw + xx + 3 * yy + 21 + d) % 63
                    for yy in range(h)
                    for xx in range(bw)
                )
                gif = encode_gif_frames(
                    w, h, pal,
                    [
                        {"indices": base, "disposal": 1, "delay_ms": 40},
                        {"indices": band_patch(1, 7), "left": bw, "top": 0,
                         "w": bw, "h": h, "disposal": 1, "delay_ms": 40},
                        {"indices": band_patch(2, 14), "left": 2 * bw,
                         "top": 0, "w": bw, "h": h, "disposal": 2,
                         "delay_ms": 40},
                        {"indices": p3, "left": 3 * bw, "top": 0,
                         "w": bw, "h": h, "disposal": 3, "transparent": 63,
                         "delay_ms": 40},
                        {"indices": band_patch(0, 28), "left": 0, "top": 0,
                         "w": bw, "h": h, "disposal": 0, "delay_ms": 40},
                    ],
                    bg_index=5,
                )
                ids.append(d)
                payloads.append(gif)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    mm_df = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    sampled = mm.sample_frames(mm_df, n_frames=5, fake_decode=False)

    @pandas_udf("bigint")
    def byte_sum(s):
        return s.apply(lambda b: sum(b))

    return sampled.select(
        "doc_id",
        "frame_idx",
        "frame_ts_ms",
        byte_sum("frame").alias("px_sum"),
    ).orderBy("doc_id", "frame_idx")


# ---------------------------------------------------------------------------
# q406: STEREO IMA ADPCM — channel-axis recursive-CTE state-machine oracle
# ---------------------------------------------------------------------------


def _q406_oracle() -> str:
    """q400's recursive-CTE replay of ima_adpcm_step, extended with a
    CHANNEL AXIS (VERDICT r7 #2): the walk is keyed (doc_id, channel),
    each channel carrying its own (predictor, index) state seeded from
    the per-channel block header, and the nibble stream is analytic in
    (doc_id, channel, step) — exactly the bytes the Spark fixture packs
    into the 4-byte-word channel interleave."""
    from .operators.wave_ext import IMA_STEP_TABLE

    steps = ", ".join(f"({i}, {s})" for i, s in enumerate(IMA_STEP_TABLE))
    nib = (
        "(CASE WHEN w.s % 2 = 0 "
        "THEN ((b.doc_id * 11 + 29 * b.c + (w.s // 2) * 17) % 256) % 16 "
        "ELSE ((b.doc_id * 11 + 29 * b.c + (w.s // 2) * 17) % 256) // 16 END)"
    )
    return f"""
    WITH RECURSIVE
    d AS (SELECT doc_id FROM documents WHERE doc_id < 24),
    b AS (SELECT doc_id, unnest(range(0, 2)) AS c FROM d),
    base AS (SELECT doc_id, c, 16 + 8 * (doc_id % 3) AS m,
                    ((doc_id * 997 + 501 * c) % 4001) - 2000 AS p0,
                    (doc_id + 37 * c) % 89 AS i0
             FROM b),
    st(i, step) AS (SELECT * FROM (VALUES {steps})),
    walk(doc_id, c, s, pred, idx) AS (
      SELECT doc_id, c, 0, p0, i0 FROM base
      UNION ALL
      SELECT doc_id, c, s + 1,
             GREATEST(-32768, LEAST(32767,
               CASE WHEN nib >= 8 THEN pred - diff
                    ELSE pred + diff END)),
             GREATEST(0, LEAST(88, idx +
               CASE WHEN nib % 8 < 4 THEN -1
                    ELSE 2 * (nib % 8 - 3) END))
      FROM (
        SELECT w.doc_id, b.c, w.s, w.pred, w.idx,
               {nib} AS nib,
               st.step // 8
                 + CASE WHEN {nib} % 8 >= 4 THEN st.step ELSE 0 END
                 + CASE WHEN {nib} % 4 >= 2 THEN st.step // 2 ELSE 0 END
                 + CASE WHEN {nib} % 2 = 1 THEN st.step // 4 ELSE 0 END
                 AS diff
        FROM walk w
        JOIN base b ON b.doc_id = w.doc_id AND b.c = w.c
        JOIN st ON st.i = w.idx
        WHERE w.s < 2 * b.m
      )
    )
    SELECT doc_id, CAST(c AS INT) AS channel,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(pred) AS BIGINT) AS s_sum,
           CAST(sum(abs(pred)) AS BIGINT) AS s_abs
    FROM walk GROUP BY doc_id, c ORDER BY doc_id, channel
    """


@query("q406_stereo_ima_adpcm", oracle=_q406_oracle())
def q406_stereo_ima_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STEREO IMA ADPCM decode (VERDICT r7 #2 — closes the multichannel
    WAV gate): each doc synthesizes a genuine 2-channel IMA/DVI ADPCM
    block — per-channel 4-byte headers with analytic initial
    predictor/step-index, then data bytes interleaved as 4-byte words
    per channel (the Microsoft/IMA multichannel layout) — and
    ``decode_wav_ext`` runs TWO independent table-driven state machines,
    re-interleaving by sample time.  The query de-interleaves the output
    back to per-channel streams and reports per-(doc, channel) sums, so
    the oracle's channel-axis recursive CTE pins BOTH the per-channel
    state machines and the word-interleave demux exactly (a swapped or
    desynced channel flips s_sum between channels).  Decode is
    Arrow-batched mapInPandas on executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 24
    )

    def synth_decode(batches):
        import struct as st

        import pandas as pd

        from rust_dataframe_spark.operators.wave_ext import (
            decode_wav_ext,
            encode_wav_raw,
        )

        for pdf in batches:
            rows = {"doc_id": [], "channel": [], "n_samples": [],
                    "s_sum": [], "s_abs": []}
            for d in pdf["doc_id"]:
                d = int(d)
                m = 16 + 8 * (d % 3)
                chan_bytes = [
                    bytes((d * 11 + 29 * c + 17 * j) % 256 for j in range(m))
                    for c in range(2)
                ]
                hdr = b"".join(
                    st.pack(
                        "<hBB",
                        ((d * 997 + 501 * c) % 4001) - 2000,
                        (d + 37 * c) % 89,
                        0,
                    )
                    for c in range(2)
                )
                body = bytearray()
                for w in range(m // 4):
                    for c in range(2):
                        body += chan_bytes[c][4 * w:4 * w + 4]
                block = hdr + bytes(body)
                _sr, _ch, _name, s = decode_wav_ext(
                    encode_wav_raw(0x11, 4, 8000, 2, block,
                                   block_align=len(block))
                )
                for c in range(2):
                    sc = s[c::2]
                    rows["doc_id"].append(d)
                    rows["channel"].append(c)
                    rows["n_samples"].append(len(sc))
                    rows["s_sum"].append(sum(sc))
                    rows["s_abs"].append(sum(abs(x) for x in sc))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, channel int, n_samples bigint, s_sum bigint, "
        "s_abs bigint",
    ).orderBy("doc_id", "channel")


# ---------------------------------------------------------------------------
# q407: STEREO MS-ADPCM — channel-axis 3-variable recursive-CTE oracle
# ---------------------------------------------------------------------------


def _q407_oracle() -> str:
    """q402's recursive-CTE replay of msadpcm_step with a CHANNEL AXIS:
    nibbles rotate across channels (high nibble of byte t -> channel 0's
    t-th step, low nibble -> channel 1's), each channel carrying its own
    (s1, s2, delta) state seeded from the per-channel header fields.
    floor(x/256.0) stands in for C's arithmetic shift as in q402."""
    from .operators.wave_ext import MSADPCM_ADAPT, MSADPCM_COEFS

    coefs = ", ".join(
        f"({i}, {c1}, {c2})" for i, (c1, c2) in enumerate(MSADPCM_COEFS)
    )
    adapt = ", ".join(f"({n}, {a})" for n, a in enumerate(MSADPCM_ADAPT))
    nib = (
        "(CASE WHEN b.c = 0 "
        "THEN ((b.doc_id * 11 + w.s * 29) % 256) // 16 "
        "ELSE ((b.doc_id * 11 + w.s * 29) % 256) % 16 END)"
    )
    return f"""
    WITH RECURSIVE
    d AS (SELECT doc_id FROM documents WHERE doc_id < 24),
    b0 AS (SELECT doc_id, unnest(range(0, 2)) AS c FROM d),
    base AS (SELECT doc_id, c, 40 + doc_id % 16 AS m,
                    (doc_id + 3 * c) % 7 AS pidx,
                    16 + (doc_id * 13 + 7 * c) % 1000 AS delta0,
                    ((doc_id * 131 + 17 * c) % 30001) - 15000 AS s1_0,
                    ((doc_id * 373 + 41 * c) % 30001) - 15000 AS s2_0
             FROM b0),
    co(i, c1, c2) AS (SELECT * FROM (VALUES {coefs})),
    ad(n, a) AS (SELECT * FROM (VALUES {adapt})),
    walk(doc_id, c, s, s1, s2, delta) AS (
      SELECT doc_id, c, 0, s1_0, s2_0, delta0 FROM base
      UNION ALL
      SELECT doc_id, c, s + 1,
             GREATEST(-32768, LEAST(32767,
               CAST(floor((s1 * c1 + s2 * c2) / 256.0) AS BIGINT)
               + (CASE WHEN nib >= 8 THEN nib - 16 ELSE nib END) * delta)),
             s1,
             GREATEST(16, LEAST(8388607, (a * delta) // 256))
      FROM (
        SELECT w.doc_id, b.c, w.s, w.s1, w.s2, w.delta,
               co.c1, co.c2, {nib} AS nib, ad.a
        FROM walk w
        JOIN base b ON b.doc_id = w.doc_id AND b.c = w.c
        JOIN co ON co.i = b.pidx
        JOIN ad ON ad.n = {nib}
        WHERE w.s < b.m
      )
    ),
    emitted AS (
      SELECT doc_id, c, s2_0 AS v FROM base
      UNION ALL
      SELECT doc_id, c, s1_0 FROM base
      UNION ALL
      SELECT doc_id, c, s1 FROM walk WHERE s >= 1
    )
    SELECT doc_id, CAST(c AS INT) AS channel,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(v) AS BIGINT) AS s_sum,
           CAST(sum(abs(v)) AS BIGINT) AS s_abs
    FROM emitted GROUP BY doc_id, c ORDER BY doc_id, channel
    """


@query("q407_stereo_ms_adpcm", oracle=_q407_oracle())
def q407_stereo_ms_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STEREO MS-ADPCM decode (VERDICT r7 #2): each doc synthesizes a
    2-channel MS-ADPCM block — per-channel header fields in the
    Microsoft WAVE_FORMAT_ADPCM channel-major order (predictor indices,
    deltas, sample1s, sample2s), then analytic data bytes whose nibbles
    ROTATE across channels (high nibble -> channel 0, low -> channel 1)
    — and ``decode_wav_ext`` runs two independent 3-variable (s1, s2,
    delta) machines.  Per-(doc, channel) sums pin both machines and the
    nibble rotation against the oracle's channel-axis recursive CTE.
    Decode is Arrow-batched mapInPandas on executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 24
    )

    def synth_decode(batches):
        import struct as st

        import pandas as pd

        from rust_dataframe_spark.operators.wave_ext import (
            decode_wav_ext,
            encode_wav_raw,
        )

        for pdf in batches:
            rows = {"doc_id": [], "channel": [], "n_samples": [],
                    "s_sum": [], "s_abs": []}
            for d in pdf["doc_id"]:
                d = int(d)
                m = 40 + d % 16
                hdr = (
                    bytes([(d + 3 * c) % 7 for c in range(2)])
                    + st.pack("<hh", *[
                        16 + (d * 13 + 7 * c) % 1000 for c in range(2)
                    ])
                    + st.pack("<hh", *[
                        ((d * 131 + 17 * c) % 30001) - 15000 for c in range(2)
                    ])
                    + st.pack("<hh", *[
                        ((d * 373 + 41 * c) % 30001) - 15000 for c in range(2)
                    ])
                )
                block = hdr + bytes(
                    (d * 11 + j * 29) % 256 for j in range(m)
                )
                _sr, _ch, _name, s = decode_wav_ext(
                    encode_wav_raw(0x02, 4, 8000, 2, block,
                                   block_align=len(block))
                )
                for c in range(2):
                    sc = s[c::2]
                    rows["doc_id"].append(d)
                    rows["channel"].append(c)
                    rows["n_samples"].append(len(sc))
                    rows["s_sum"].append(sum(sc))
                    rows["s_abs"].append(sum(abs(x) for x in sc))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, channel int, n_samples bigint, s_sum bigint, "
        "s_abs bigint",
    ).orderBy("doc_id", "channel")


# ---------------------------------------------------------------------------
# q408: PostgreSQL COPY BINARY round-trip over real table data
# ---------------------------------------------------------------------------


@query(
    "q408_pgcopy_roundtrip",
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END
             AS status,
           CAST(o_orderdate AS DATE) AS odate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents
    FROM orders WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
)
def q408_pgcopy_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PostgreSQL COPY BINARY codec round-trip (VERDICT r7 #3 — the
    serverless pin of the reference's flagship connector path,
    reader.rs:453-701 / writer.rs:161-321): real ``orders`` rows (bigint
    keys, nullable text status, date, exact-cents numeric) are encoded
    executor-side into the documented COPY binary framing — 19-byte
    PGCOPY header, per-tuple int16 field counts, int32 lengths with -1
    NULLs, big-endian send-format payloads (date/timestamp rebased to
    the 2000-01-01 epoch, numeric as base-10000 digit groups), int16 -1
    trailer — then DECODED BACK and compared to the source via the
    oracle.  Per-type byte layouts are pinned against hand-built vectors
    in tests/test_sources.py::TestCopyBinary.  Scale: encode+decode is
    per-partition mapInPandas with zero shuffle — each partition's
    stream is an independently server-loadable COPY payload, which is
    exactly how a 1000-executor bulk load into a Postgres-family
    warehouse parallelizes."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000).select(
        "o_orderkey",
        "o_custkey",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("status"),
        F.col("o_orderdate").cast("date").alias("odate"),
        F.round(F.col("o_totalprice") * 100).cast("decimal(18,0)").alias("__amt"),
    )

    def roundtrip(batches):
        import pandas as pd

        from rust_dataframe_spark.sources.pgcopy import (
            decode_copy_binary,
            encode_copy_binary,
        )

        schema = [
            ("o_orderkey", "int8"),
            ("o_custkey", "int8"),
            ("status", "text"),
            ("odate", "date"),
            ("__amt", "numeric"),
        ]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                rows.append(
                    tuple(None if pd.isna(v) else v for v in r)
                )
            blob = encode_copy_binary(schema, rows)
            decoded = decode_copy_binary(blob, schema)
            out = {
                "o_orderkey": [r[0] for r in decoded],
                "o_custkey": [r[1] for r in decoded],
                "status": [r[2] for r in decoded],
                "odate": [r[3] for r in decoded],
                "cents": [int(r[4]) for r in decoded],
            }
            yield pd.DataFrame(out)

    return o.mapInPandas(
        roundtrip,
        "o_orderkey bigint, o_custkey bigint, status string, odate date, "
        "cents bigint",
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# q409: arithmetic-coded (SOF9) JPEG round-trip, closed-form pixel checksum
# ---------------------------------------------------------------------------


@query(
    "q409_arithmetic_jpeg",
    oracle="""
    WITH d AS (SELECT doc_id,
                      8 * (1 + doc_id % 3) AS w,
                      8 * (1 + (doc_id // 3) % 3) AS h
               FROM documents WHERE doc_id < 200),
    bx AS (SELECT doc_id, w, h, unnest(range(0, w // 8)) AS bx FROM d),
    b AS (SELECT doc_id, w, h, bx, unnest(range(0, h // 8)) AS by FROM bx)
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(64 * ((doc_id + 17 * bx + 29 * by) % 256)) AS BIGINT)
             AS px_sum
    FROM b GROUP BY doc_id, w, h ORDER BY doc_id
    """,
)
def q409_arithmetic_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARITHMETIC-coded JPEG decode (VERDICT r7 #4 — T.81 Annex D
    QM-coder + Annex F sequential model, operators/jpeg_arith.py): each
    doc synthesizes a BLOCK-CONSTANT grayscale image, encodes it through
    the SOF9 path (adaptive binary arithmetic entropy coding with DC
    conditioning contexts, AC per-index bin ladders, the fixed sign bin,
    carry propagation and FF-00 stuffing), decodes the real arithmetic
    byte stream back via decode_jpeg's SOF9 dispatch, and reports the
    decoded pixel checksum — the q387/q395 closed form (block-constant
    content is DC-only and exact at quant=1).  General content, color,
    and 4:2:0 are equality-pinned against the Huffman decoder in
    tests/test_llm_ops.py::TestJpegArithmetic (same DCT pipeline,
    different entropy coder => identical pixels).  All work is
    Arrow-batched mapInPandas on executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def gen_and_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.jpeg import decode_jpeg
        from rust_dataframe_spark.operators.jpeg_arith import (
            encode_jpeg_arithmetic,
        )

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "px_sum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 * (1 + d % 3), 8 * (1 + (d // 3) % 3)
                px = bytes(
                    (d + 17 * (x // 8) + 29 * (y // 8)) % 256
                    for y in range(h)
                    for x in range(w)
                )
                ww, hh, _ch, out = decode_jpeg(
                    encode_jpeg_arithmetic(w, h, px, channels=1)
                )
                rows["doc_id"].append(d)
                rows["width"].append(ww)
                rows["height"].append(hh)
                rows["px_sum"].append(sum(out))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen_and_decode, "doc_id bigint, width int, height int, px_sum bigint"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q410: unigram-EM tol early-stop, oracle-visible (VERDICT r7 #7)
# ---------------------------------------------------------------------------

#: Unambiguous-vocabulary fixture: with vocab {ab, c} every corpus word
#: has EXACTLY ONE segmentation, so expected counts do not depend on the
#: weights and the EM map reaches its fixed point after round 1 — round
#: 2's probabilities equal round 1's bit-for-bit, the tol test fires,
#: and the run stops at n_rounds=2 with iters=5.  The oracle replays the
#: two executed rounds (shared lattice machinery with q396) and emits
#: n_rounds=2: had the engine NOT early-stopped, rounds 3-5 would appear
#: and the row count/hash would mismatch — the convergence path itself
#: is what the gate pins.
_Q410_WEIGHTS = {"ab": 3.0, "c": 1.0}
_Q410_CORPUS = (
    "CASE doc_id % 4 WHEN 0 THEN 'abc' WHEN 1 THEN 'cabab' "
    "WHEN 2 THEN 'ccc' ELSE 'abcc' END"
)


def _q410_oracle() -> str:
    from .catalog_round7 import _unigram_walk_block

    vals = ", ".join(
        f"('{p}', {int(w)})" for p, w in sorted(_Q410_WEIGHTS.items())
    )
    w1 = float(sum(int(w) for w in _Q410_WEIGHTS.values()))
    return f"""
    WITH RECURSIVE
    v1(p, wt) AS (SELECT * FROM (VALUES {vals})),
    wn1 AS (SELECT CAST({w1!r} AS DOUBLE) AS wn),
    words AS (SELECT {_Q410_CORPUS} AS w FROM documents WHERE doc_id < 60),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM words GROUP BY w),
    dw AS (SELECT DISTINCT w FROM words),
    dwp AS (SELECT w, unnest(range(1, length(w) + 1)) AS cpos FROM dw),
    {_unigram_walk_block('1', 'v1')},
    v2 AS (SELECT piece AS p, CAST(wt_next AS BIGINT) AS wt FROM q1
           WHERE wt_next >= 1),
    wn2 AS (SELECT CAST(sum(wt) AS DOUBLE) AS wn FROM v2),
    {_unigram_walk_block('2', 'v2')}
    SELECT 1 AS round, piece, total_expected, new_prob, wt_next,
           (SELECT ll FROM ll1) AS ll_in, 2 AS n_rounds FROM q1
    UNION ALL
    SELECT 2, piece, total_expected, new_prob, wt_next,
           (SELECT ll FROM ll2), 2 FROM q2
    ORDER BY round, piece
    """


@query("q410_unigram_em_earlystop", oracle=_q410_oracle())
def q410_unigram_em_earlystop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-EM ``tol`` EARLY-STOP, oracle-visible (VERDICT r7 #7 —
    round 7 pinned only iters-bounded runs; the convergence path had a
    unit test but no catalog gate).  The corpus is segmentation-UNIQUE
    under the vocab (see _Q410_WEIGHTS note), so the EM map is at its
    fixed point after round 1: round 2 reproduces round 1's
    probabilities bit-for-bit, ``max |p_r - p_(r-1)| <= tol`` fires, and
    ``unigram_em(iters=5, tol=1e-9)`` returns n_rounds=2 — which the
    oracle asserts structurally by replaying exactly two rounds (any
    missed early-stop emits rounds 3-5 and fails the row/hash compare).
    """
    from .operators import text as tx

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60).select(
        "doc_id", F.expr(_Q410_CORPUS).alias("text")
    )
    return tx.unigram_em(
        d, "doc_id", "text", _Q410_WEIGHTS, 5, quant_scale=32, tol=1e-9
    )


# ---------------------------------------------------------------------------
# q411: LOSSLESS JPEG (SOF3) — exact sample-sum oracle, all 7 predictors
# ---------------------------------------------------------------------------


@query(
    "q411_lossless_jpeg",
    oracle="""
    WITH d AS (SELECT doc_id,
                      6 + doc_id % 11 AS w,
                      5 + (3 * doc_id) % 9 AS h,
                      1 + doc_id % 7 AS pred
               FROM documents WHERE doc_id < 140),
    cx AS (SELECT doc_id, w, h, pred, unnest(range(0, w)) AS x FROM d),
    cc AS (SELECT doc_id, w, h, pred, x, unnest(range(0, h)) AS y FROM cx)
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(pred AS INT) AS predictor,
           CAST(sum((doc_id * 7 + 13 * x + 29 * y + (x * y) % 5) % 4096)
                AS BIGINT) AS s_sum
    FROM cc GROUP BY doc_id, w, h, pred ORDER BY doc_id
    """,
)
def q411_lossless_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOSSLESS JPEG decode (round 8 — T.81 Annex H SOF3 predictive
    coding, operators/jpeg_lossless.py; what DNG raw and DICOM corpora
    actually carry): each doc synthesizes a 12-bit grayscale sample
    grid analytic in doc_id, encodes it with predictor ``1 + doc % 7``
    (so all seven Annex H predictors are exercised across the corpus),
    decodes through decode_jpeg_ext's SOF3 dispatch, and reports the
    EXACT decoded sample sum — lossless means the oracle needs no
    block-constant trick: it just re-sums the closed-form samples.
    Boundary prediction rules (first row Ra, first column Rb, corner
    default 1 << (P-1)), the modulo-2^16 reconstruction, and the
    SSSS<=16 ladder are all on the line: any divergence shifts s_sum.
    Arrow-batched mapInPandas on executors; the driver never sees
    sample bytes."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 140
    )

    def gen_and_decode(batches):
        import struct as st

        import pandas as pd

        from rust_dataframe_spark.operators.jpeg import decode_jpeg_ext
        from rust_dataframe_spark.operators.jpeg_lossless import (
            encode_jpeg_lossless,
        )

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [],
                    "predictor": [], "s_sum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 6 + d % 11, 5 + (3 * d) % 9
                pred = 1 + d % 7
                px = [
                    (d * 7 + 13 * x + 29 * y + (x * y) % 5) % 4096
                    for y in range(h)
                    for x in range(w)
                ]
                blob = encode_jpeg_lossless(
                    w, h, px, precision=12, predictor=pred
                )
                ww, hh, _ch, depth, out = decode_jpeg_ext(blob)
                assert depth == 12
                vals = st.unpack(f"<{ww * hh}H", out)
                rows["doc_id"].append(d)
                rows["width"].append(ww)
                rows["height"].append(hh)
                rows["predictor"].append(pred)
                rows["s_sum"].append(sum(vals))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen_and_decode,
        "doc_id bigint, width int, height int, predictor int, s_sum bigint",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q412: 12-BIT extended sequential JPEG (SOF1) — closed-form pixel checksum
# ---------------------------------------------------------------------------


@query(
    "q412_jpeg_12bit",
    oracle="""
    WITH d AS (SELECT doc_id,
                      8 * (1 + doc_id % 3) AS w,
                      8 * (1 + (doc_id // 3) % 3) AS h
               FROM documents WHERE doc_id < 160),
    bx AS (SELECT doc_id, w, h, unnest(range(0, w // 8)) AS bx FROM d),
    b AS (SELECT doc_id, w, h, bx, unnest(range(0, h // 8)) AS by FROM bx)
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(64 * ((31 * doc_id + 173 * bx + 419 * by) % 4096))
                AS BIGINT) AS px_sum
    FROM b GROUP BY doc_id, w, h ORDER BY doc_id
    """,
)
def q412_jpeg_12bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-BIT extended sequential JPEG decode (round 8 — SOF1 with Pq=1
    16-bit DQT, level shift 2048, the extended Table F.1 Huffman
    ladders; the medical/scientific-imaging precision): block-constant
    12-bit grayscale at quant=1 round-trips EXACTLY (the q387/q409
    closed form lifted to 12 bits — the FDCT of a constant block is
    DC-only and the 2048 level shift cancels), so the decoded pixel
    checksum is a closed-form function of the synthesis params.
    General-content bounded error and the 16-bit-DQT parse are pinned
    in tests/test_llm_ops.py::TestJpeg12Bit.  Arrow-batched mapInPandas
    on executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 160
    )

    def gen_and_decode(batches):
        import struct as st

        import pandas as pd

        from rust_dataframe_spark.operators.jpeg import (
            decode_jpeg_ext,
            encode_jpeg,
        )

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "px_sum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 * (1 + d % 3), 8 * (1 + (d // 3) % 3)
                px = [
                    (31 * d + 173 * (x // 8) + 419 * (y // 8)) % 4096
                    for y in range(h)
                    for x in range(w)
                ]
                ww, hh, _ch, depth, out = decode_jpeg_ext(
                    encode_jpeg(w, h, px, channels=1, precision=12)
                )
                assert depth == 12
                vals = st.unpack(f"<{ww * hh}H", out)
                rows["doc_id"].append(d)
                rows["width"].append(ww)
                rows["height"].append(hh)
                rows["px_sum"].append(sum(vals))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen_and_decode, "doc_id bigint, width int, height int, px_sum bigint"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q413: FLAC round-trip — exact per-(doc, channel) sample-sum oracle
# ---------------------------------------------------------------------------


@query(
    "q413_flac_roundtrip",
    oracle="""
    WITH d AS (SELECT doc_id,
                      200 + (doc_id % 5) * 50 AS m,
                      CAST(doc_id % 2 AS INT) + 1 AS nch
               FROM documents WHERE doc_id < 48),
    ch AS (SELECT doc_id, m, nch, unnest(range(0, nch)) AS c FROM d),
    i AS (SELECT doc_id, m, nch, c, unnest(range(0, m)) AS i FROM ch),
    v AS (SELECT doc_id, nch, c,
                 CASE WHEN c = 0
                   THEN ((doc_id * 31 + i * 17 + (i * i) % 13) % 4001) - 2000
                   ELSE ((doc_id * 53 + i * 29) % 4001) - 2000
                 END AS s
          FROM i)
    SELECT doc_id, CAST(c AS INT) AS channel,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(s) AS BIGINT) AS s_sum,
           CAST(sum(abs(s)) AS BIGINT) AS s_abs
    FROM v GROUP BY doc_id, c ORDER BY doc_id, channel
    """,
)
def q413_flac_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAC round-trip (round 8 — operators/flac.py, the lossless audio
    format real corpora carry next to WAV): each doc synthesizes an
    analytic 16-bit sample stream (mono for even docs; stereo with
    MID/SIDE decorrelation for odd docs), encodes it into a multi-frame
    FLAC stream (block_size=192 so frame headers, CRC-8/16 chains and
    the UTF-8 frame numbering are all exercised), decodes it back with
    MD5 verification, and reports EXACT per-(doc, channel) sums —
    lossless, so the oracle just replays the closed-form synth.  Any
    drift in Rice coding, fixed-predictor reconstruction, stereo
    algebra, or CRC handling flips s_sum/s_abs.  Arrow-batched
    mapInPandas on executors; the driver never sees sample bytes."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 48
    )

    def synth_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.flac import (
            decode_flac,
            encode_flac,
        )

        for pdf in batches:
            rows = {"doc_id": [], "channel": [], "n_samples": [],
                    "s_sum": [], "s_abs": []}
            for d in pdf["doc_id"]:
                d = int(d)
                m = 200 + (d % 5) * 50
                nch = 1 + d % 2
                left = [
                    ((d * 31 + i * 17 + (i * i) % 13) % 4001) - 2000
                    for i in range(m)
                ]
                if nch == 2:
                    right = [((d * 53 + i * 29) % 4001) - 2000 for i in range(m)]
                    inter = [v for p in zip(left, right) for v in p]
                else:
                    inter = left
                blob = encode_flac(
                    16000, nch, 16, inter, block_size=192,
                    mid_side=(nch == 2),
                )
                _r, _ch, _b, out = decode_flac(blob)
                for c in range(nch):
                    sc = out[c::nch]
                    rows["doc_id"].append(d)
                    rows["channel"].append(c)
                    rows["n_samples"].append(len(sc))
                    rows["s_sum"].append(sum(sc))
                    rows["s_abs"].append(sum(abs(x) for x in sc))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, channel int, n_samples bigint, s_sum bigint, "
        "s_abs bigint",
    ).orderBy("doc_id", "channel")
