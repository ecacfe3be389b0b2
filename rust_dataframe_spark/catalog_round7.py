"""Catalog round 7: progressive JPEG decode + unigram-EM training loop.

Closes the two largest round-6 verdict items that add catalog surface:
the SOF2 decode path (the biggest remaining share of the multimodal
fake-decode fallback — operators/jpeg.py now covers the full T.81
Annex G Huffman scan matrix) and the composed EM training loop over the
q336/q392 E/M steps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import query, table

__all__: list[str] = []


# ---------------------------------------------------------------------------
# q395: progressive (SOF2) JPEG round-trip with closed-form pixel checksum
# ---------------------------------------------------------------------------


@query(
    "q395_progressive_jpeg",
    oracle="""
    WITH d AS (SELECT doc_id,
                      8 * (1 + doc_id % 3) AS w,
                      8 * (1 + (doc_id // 3) % 3) AS h
               FROM documents WHERE doc_id < 200),
    bx AS (SELECT doc_id, w, h, unnest(range(0, w // 8)) AS bx FROM d),
    b AS (SELECT doc_id, w, h, bx, unnest(range(0, h // 8)) AS by FROM bx)
    SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(sum(64 * ((doc_id + 13 * bx + 31 * by) % 256)) AS BIGINT)
             AS px_sum
    FROM b GROUP BY doc_id, w, h ORDER BY doc_id
    """,
)
def q395_progressive_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive-JPEG decode, driver-checkable — q387's discipline
    on the SOF2 path (operators/jpeg.py round 7: multi-scan coefficient
    accumulation across interleaved DC first + DC successive-approximation
    refinement + AC spectral-selection first + AC refinement scans, then
    one dequant/IDCT pass): each doc synthesizes a BLOCK-CONSTANT
    grayscale image (block (bx, by) holds (doc_id + 13bx + 31by) % 256),
    encodes it with encode_jpeg_progressive's 7-scan script at the
    all-ones quant table, decodes the real multi-scan entropy bytes back,
    and reports the decoded pixel checksum — exactly the closed form the
    DuckDB oracle computes, because block-constant content is DC-only and
    the DC path restores full precision after the Al=1 -> refinement
    ladder (jpeg.py module docstring).  Lossy general content and the
    color/4:2:0 progressive paths are equality-pinned against the
    baseline decoder in tests/test_llm_ops.py::TestJpegProgressive.
    All work is Arrow-batched mapInPandas on executors; the driver never
    sees image bytes."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def gen_and_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.jpeg import (
            decode_jpeg,
            encode_jpeg_progressive,
        )

        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "px_sum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 * (1 + d % 3), 8 * (1 + (d // 3) % 3)
                px = bytes(
                    (d + 13 * (x // 8) + 31 * (y // 8)) % 256
                    for y in range(h)
                    for x in range(w)
                )
                ww, hh, _ch, out = decode_jpeg(
                    encode_jpeg_progressive(w, h, px, channels=1)
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
# q396: full quantized Unigram-LM EM loop (2 rounds, likelihood ledger)
# ---------------------------------------------------------------------------


def _unigram_walk_block(n: str, vocab: str) -> str:
    """One round's lattice replay: recursive path walk -> z, per-k z,
    normalized word likelihood, ll, expected counts, M-step folds,
    quantization — the SQL mirror of unigram_expected_counts +
    unigram_m_step + unigram_corpus_ll + the wt quantizer.  Shared by
    the q396 (iters-bounded) and q410 (tol early-stop) oracles; expects
    CTEs ``words``/``freq``/``dw``/``dwp`` and ``wn{n}`` in scope."""
    return f"""
    e{n} AS (
      SELECT d.w, d.cpos, v.p AS piece, length(v.p) AS adv, v.wt
      FROM dwp d JOIN {vocab} v ON substr(d.w, d.cpos, length(v.p)) = v.p),
    walk{n}(w, cpos, toks, wt) AS (
      SELECT w, 1, []::VARCHAR[], CAST(1 AS BIGINT) FROM dw
      UNION ALL
      SELECT walk{n}.w, walk{n}.cpos + e.adv,
             list_append(walk{n}.toks, e.piece), walk{n}.wt * e.wt
      FROM walk{n} JOIN e{n} e ON e.w = walk{n}.w AND e.cpos = walk{n}.cpos
      WHERE walk{n}.cpos <= length(walk{n}.w)),
    done{n} AS (SELECT w, toks, wt FROM walk{n} WHERE cpos = length(w) + 1),
    z{n} AS (SELECT w, CAST(sum(wt) AS BIGINT) AS z FROM done{n} GROUP BY w),
    zk{n} AS (SELECT w, len(toks) AS k, CAST(sum(wt) AS BIGINT) AS zk
              FROM done{n} GROUP BY w, len(toks)),
    zp{n} AS (SELECT zk{n}.w,
                     list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                         list(CAST(zk AS DOUBLE) / pow(wn{n}.wn, k) ORDER BY k)),
                       (a, b) -> a + b) AS zp
              FROM zk{n} CROSS JOIN wn{n} GROUP BY zk{n}.w, wn{n}.wn),
    ll{n} AS (SELECT floor(list_reduce(
                       list_prepend(CAST(0 AS DOUBLE),
                         list(f.freq * ln(zp.zp) ORDER BY zp.w)),
                       (a, b) -> a + b) * 1e6) / 1e6 AS ll
              FROM zp{n} zp JOIN freq f ON f.w = zp.w WHERE zp.zp > 0),
    occ{n} AS (SELECT w, unnest(toks) AS piece, wt FROM done{n}),
    en{n} AS (SELECT w, piece, CAST(sum(wt) AS BIGINT) AS e_num
              FROM occ{n} GROUP BY w, piece),
    c{n} AS (SELECT e.piece, e.w AS word,
                    CAST(e.e_num AS DOUBLE) / CAST(z{n}.z AS DOUBLE) * f.freq AS c
             FROM en{n} e JOIN z{n} ON z{n}.w = e.w JOIN freq f ON f.w = e.w),
    pp{n} AS (SELECT piece,
                     list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                              list(c ORDER BY word)),
                                 (a, b) -> a + b) AS te
              FROM c{n} GROUP BY piece),
    t{n} AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                             list(te ORDER BY piece)),
                                (a, b) -> a + b) AS gt
             FROM pp{n}),
    q{n} AS (SELECT piece,
                    floor(te * 1e6) / 1e6 AS total_expected,
                    floor(te / gt * 1e6) / 1e6 AS new_prob,
                    CAST(floor(floor(te / gt * 1e6) / 1e6 * 32 + 0.5) AS INT)
                      AS wt_next
             FROM pp{n} CROSS JOIN t{n})"""


def _q396_oracle() -> str:
    from .catalog_llm import _Q336_WEIGHTS

    vals = ", ".join(
        f"('{p}', {int(w)})" for p, w in sorted(_Q336_WEIGHTS.items())
    )
    w1 = float(sum(int(w) for w in _Q336_WEIGHTS.values()))
    walk_block = _unigram_walk_block

    return f"""
    WITH RECURSIVE
    v1(p, wt) AS (SELECT * FROM (VALUES {vals})),
    wn1 AS (SELECT CAST({w1!r} AS DOUBLE) AS wn),
    words AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM words GROUP BY w),
    dw AS (SELECT DISTINCT w FROM words),
    dwp AS (SELECT w, unnest(range(1, length(w) + 1)) AS cpos FROM dw),
    {walk_block('1', 'v1')},
    v2 AS (SELECT piece AS p, CAST(wt_next AS BIGINT) AS wt FROM q1
           WHERE wt_next >= 1),
    wn2 AS (SELECT CAST(sum(wt) AS DOUBLE) AS wn FROM v2),
    {walk_block('2', 'v2')}
    SELECT 1 AS round, piece, total_expected, new_prob, wt_next,
           (SELECT ll FROM ll1) AS ll_in, 2 AS n_rounds FROM q1
    UNION ALL
    SELECT 2, piece, total_expected, new_prob, wt_next,
           (SELECT ll FROM ll2), 2 FROM q2
    ORDER BY round, piece
    """


@query("q396_unigram_em", oracle=_q396_oracle())
def q396_unigram_em(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL quantized Unigram-LM EM training loop (VERDICT r6 #7) — the
    composed iteration over the q336 E-step and q392 M-step that a real
    tokenizer-training run executes, 2 rounds here so the oracle can
    unroll it: operators/text.unigram_em.  Per round: corpus
    log-likelihood of the input vocabulary (the MONOTONICITY ledger —
    ll_in is non-decreasing across rounds, the EM theorem up to the
    documented 1/quant_scale quantization slack, asserted in
    tests/test_llm_ops.py::TestUnigramEmLoop), integer-exact E-step
    lattice per DISTINCT word, ordered-fold M-step renormalization, then
    QUANTIZATION back to the integer weight grid (floor(p*32 + 0.5);
    zero-weight pieces prune out, SentencePiece-style) which is what
    keeps round 2's lattice in the exact-int cross-engine regime.
    Per-round lineage truncation: the vocab axis is collected (bounded,
    Heaps) and round 2's plan restarts from literals — plan depth O(1)
    in iters, the q346 power-iteration discipline.  Scale: each round is
    one corpus scan + distinct-word lattices + vocab-axis algebra;
    rounds are inherently sequential."""
    from .catalog_llm import _Q336_WEIGHTS
    from .operators import text as tx

    d = table(spark, sf_dir, "documents")
    return tx.unigram_em(d, "doc_id", "text", _Q336_WEIGHTS, 2, quant_scale=32)


# ---------------------------------------------------------------------------
# q397: real AVI/MJPEG video frame-sampling with closed-form pixel checksum
# ---------------------------------------------------------------------------


@query(
    "q397_avi_frames",
    oracle="""
    WITH d AS (SELECT doc_id,
                      8 * (1 + doc_id % 3) AS w,
                      8 * (1 + (doc_id // 3) % 2) AS h,
                      3 + doc_id % 4 AS total
               FROM documents WHERE doc_id < 40),
    s AS (SELECT doc_id, w, h, total, unnest(range(0, 3)) AS frame_idx
          FROM d),
    src AS (SELECT doc_id, w, h, frame_idx,
                   (frame_idx * total) // 3 AS sf
            FROM s),
    bx AS (SELECT doc_id, w, h, frame_idx, sf,
                  unnest(range(0, w // 8)) AS bx
           FROM src),
    b AS (SELECT doc_id, h, frame_idx, sf, bx,
                 unnest(range(0, h // 8)) AS by
          FROM bx)
    SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
           CAST(40 * sf AS BIGINT) AS frame_ts_ms,
           CAST(sum(64 * ((doc_id + 17 * bx + 29 * by + 31 * sf) % 256))
                AS BIGINT) AS px_sum
    FROM b GROUP BY doc_id, frame_idx, sf ORDER BY doc_id, frame_idx
    """,
)
def q397_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL container-video frame sampling (operators/avi.py — round 7's
    pure-stdlib RIFF/AVI parser over the q387 JPEG codec): each doc
    synthesizes a genuine multi-frame MJPEG AVI executor-side (every
    ``00dc`` chunk is a complete block-constant baseline JPEG; dims and
    frame count are analytic in doc_id), and
    ``sample_frames(fake_decode=False)`` — now format-dispatching — takes
    3 frames evenly across the clip.  Two things the GIF twin (q334)
    cannot show: (a) the container parse is byte-slicing and ONLY the 3
    sampled frames run the JPEG decoder (O(sampled) vs LZW's O(total) —
    the property that matters when clips are long), and (b) the idx1
    index is validated against the movi chunk walk, so a desynchronized
    container fails loud instead of sampling wrong frames.  frame_ts_ms
    replays dwMicroSecPerFrame (40 ms/frame); the per-frame pixel
    checksum is exact because block-constant JPEG round-trips bit-exactly
    (q387 discipline).  Completes the real-decode matrix row for video:
    GIF + AVI/MJPEG real, MP4/WebM documented fallback.  All decode work
    is Arrow-batched mapInPandas on executors; the driver never sees
    frame bytes."""
    from pyspark.sql.functions import pandas_udf

    from .operators import multimodal as mm

    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 40
    )

    def synth(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.avi import encode_avi
        from rust_dataframe_spark.operators.jpeg import encode_jpeg

        for pdf in batches:
            ids, payloads = [], []
            for d in pdf["doc_id"]:
                d = int(d)
                w, h = 8 * (1 + d % 3), 8 * (1 + (d // 3) % 2)
                total = 3 + d % 4
                frames = [
                    encode_jpeg(
                        w,
                        h,
                        bytes(
                            (d + 17 * (x // 8) + 29 * (y // 8) + 31 * f) % 256
                            for y in range(h)
                            for x in range(w)
                        ),
                        channels=1,
                    )
                    for f in range(total)
                ]
                ids.append(d)
                payloads.append(encode_avi(w, h, frames, usec_per_frame=40_000))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    mm_df = docs.mapInPandas(synth, "doc_id bigint, payload binary")
    sampled = mm.sample_frames(mm_df, n_frames=3, fake_decode=False)

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
# q398: no-split sequence packing (harmonic size classes) with waste audit
# ---------------------------------------------------------------------------


@query(
    "q398_no_split_packing",
    oracle="""
    WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n
               FROM documents),
    k AS (SELECT doc_id, n, CAST(128 // n AS INT) AS class_k FROM d),
    r AS (SELECT doc_id, n, class_k,
                 row_number() OVER (PARTITION BY class_k
                                    ORDER BY n DESC, doc_id) AS rk
          FROM k),
    b AS (SELECT class_k, CAST((rk - 1) // class_k AS BIGINT) AS bin_idx, n
          FROM r)
    SELECT class_k, bin_idx,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n) AS BIGINT) AS tokens,
           CAST(128 - sum(n) AS BIGINT) AS waste
    FROM b GROUP BY class_k, bin_idx ORDER BY class_k, bin_idx
    """,
)
def q398_no_split_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NO-SPLIT sequence packing (sample packing) into context_len=128
    training bins via operators/training.pack_bins_harmonic — the
    document-boundary-preserving complement of q125's concat-and-chunk:
    no document ever crosses a bin, so no cross-document attention
    contamination, at the cost of padding waste the per-bin ``waste``
    column audits (the harmonic size-class scheme carries Lee & Lee's
    published 1.691 asymptotic bound; the measured ratio vs the
    ceil(total/context) lower bound is pytest-pinned).  The assignment is
    pure rank arithmetic — class k = context//len holds exactly k docs
    per bin, rank-in-class = distinct-length cum-count + within-length
    row_number — so DuckDB replays it bit-for-bit: bin populations,
    token sums, and waste all match exactly.  Scale: one (class, len)
    count shuffle + an axis-bounded rank table; windows partition by
    (class, len), never a global funnel."""
    from .operators.training import pack_bins_harmonic

    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n")
    )
    packed = pack_bins_harmonic(d, "doc_id", "n", 128)
    return (
        packed.groupBy("class_k", "bin_idx")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("tokens"),
            (F.lit(128) - F.sum("n")).cast("bigint").alias("waste"),
        )
        .orderBy("class_k", "bin_idx")
    )


# ---------------------------------------------------------------------------
# q399: G.711 telephony audio decode (u-law/A-law) with closed-form oracle
# ---------------------------------------------------------------------------


@query(
    "q399_g711_audio",
    oracle="""
    WITH d AS (SELECT doc_id, 200 + doc_id % 50 AS n,
                      doc_id % 2 = 0 AS is_ulaw
               FROM documents WHERE doc_id < 60),
    i AS (SELECT doc_id, n, is_ulaw, unnest(range(0, n)) AS idx FROM d),
    b AS (SELECT doc_id, n, is_ulaw,
                 (doc_id * 7 + idx * 13) % 256 AS byte
          FROM i),
    u AS (SELECT doc_id, n, is_ulaw, byte,
                 xor(byte, 255) AS c, xor(byte, 85) AS a
          FROM b),
    v AS (SELECT doc_id, n, is_ulaw,
                 CASE WHEN is_ulaw THEN
                   CASE WHEN c >= 128 THEN
                     -((((c % 16) * 8 + 132) << ((c // 16) % 8)) - 132)
                   ELSE
                     ((((c % 16) * 8 + 132) << ((c // 16) % 8)) - 132)
                   END
                 ELSE
                   CASE WHEN a >= 128 THEN
                     CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
                          ELSE ((a % 16) * 16 + 264) << ((a // 16) % 8 - 1)
                     END
                   ELSE
                     -(CASE WHEN (a // 16) % 8 = 0 THEN (a % 16) * 16 + 8
                            ELSE ((a % 16) * 16 + 264) << ((a // 16) % 8 - 1)
                       END)
                   END
                 END AS val
          FROM u)
    SELECT doc_id,
           CASE WHEN is_ulaw THEN 'ulaw' ELSE 'alaw' END AS fmt,
           CAST(max(n) AS BIGINT) AS n_samples,
           CAST(sum(val) AS BIGINT) AS s_sum,
           CAST(sum(abs(val)) AS BIGINT) AS s_abs
    FROM v GROUP BY doc_id, is_ulaw ORDER BY doc_id
    """,
)
def q399_g711_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL telephony-audio decode (operators/wave_ext.py — round 7's
    extended RIFF/WAVE matrix): each doc synthesizes a genuine G.711
    WAV (u-law for even doc_ids, A-law for odd; sample bytes analytic in
    doc_id), and ``multimodal.decode_wav`` — the audio modality's public
    path — expands the companded bytes to 16-bit linear through the
    closed-form ITU expansion (pinned byte-for-byte against the stdlib
    ``audioop`` ITU tables in tests/test_llm_ops.py::TestWaveExt).  The
    DuckDB oracle replays the SAME expansion as integer CASE/shift
    algebra, so the signed sample sum (sign conventions differ between
    the two laws — bit 7 means negative in u-law, positive in A-law) and
    the absolute sum both match exactly.  Shrinks the non-PCM-audio
    fallback to ADPCM/MP3/OGG; 24/32-bit and float32 PCM ride the same
    module (TestWaveExt).  All decode is Arrow-batched mapInPandas on
    executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 60
    )

    def synth_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.multimodal import decode_wav
        from rust_dataframe_spark.operators.wave_ext import encode_wav_raw

        for pdf in batches:
            rows = {"doc_id": [], "fmt": [], "n_samples": [],
                    "s_sum": [], "s_abs": []}
            for d in pdf["doc_id"]:
                d = int(d)
                n = 200 + d % 50
                raw = bytes((d * 7 + i * 13) % 256 for i in range(n))
                tag, fmt = (7, "ulaw") if d % 2 == 0 else (6, "alaw")
                _sr, _ch, _sw, s = decode_wav(
                    encode_wav_raw(tag, 8, 8000, 1, raw)
                )
                rows["doc_id"].append(d)
                rows["fmt"].append(fmt)
                rows["n_samples"].append(len(s))
                rows["s_sum"].append(sum(s))
                rows["s_abs"].append(sum(abs(x) for x in s))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, fmt string, n_samples bigint, s_sum bigint, s_abs bigint",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q400: IMA ADPCM audio decode — recursive-CTE state-machine oracle
# ---------------------------------------------------------------------------


def _q400_oracle() -> str:
    """The DuckDB oracle replays the IMA ADPCM decoder's integer state
    machine (operators/wave_ext.ima_adpcm_step) as a recursive CTE: the
    step table is spliced as literals, the nibble stream is analytic in
    (doc_id, step), and predictor/index clamps are GREATEST/LEAST."""
    from .operators.wave_ext import IMA_STEP_TABLE

    steps = ", ".join(f"({i}, {s})" for i, s in enumerate(IMA_STEP_TABLE))
    nib = (
        "(CASE WHEN w.s % 2 = 0 "
        "THEN ((d.doc_id * 11 + (w.s // 2) * 17) % 256) % 16 "
        "ELSE ((d.doc_id * 11 + (w.s // 2) * 17) % 256) // 16 END)"
    )
    return f"""
    WITH RECURSIVE
    d AS (SELECT doc_id, 60 + doc_id % 20 AS m,
                 ((doc_id * 997) % 4001) - 2000 AS p0,
                 doc_id % 89 AS i0
          FROM documents WHERE doc_id < 30),
    st(i, step) AS (SELECT * FROM (VALUES {steps})),
    walk(doc_id, s, pred, idx) AS (
      SELECT doc_id, 0, p0, i0 FROM d
      UNION ALL
      SELECT doc_id, s + 1,
             GREATEST(-32768, LEAST(32767,
               CASE WHEN nib >= 8 THEN pred - diff
                    ELSE pred + diff END)),
             GREATEST(0, LEAST(88, idx +
               CASE WHEN nib % 8 < 4 THEN -1
                    ELSE 2 * (nib % 8 - 3) END))
      FROM (
        SELECT w.doc_id, w.s, w.pred, w.idx,
               {nib} AS nib,
               st.step // 8
                 + CASE WHEN {nib} % 8 >= 4 THEN st.step ELSE 0 END
                 + CASE WHEN {nib} % 4 >= 2 THEN st.step // 2 ELSE 0 END
                 + CASE WHEN {nib} % 2 = 1 THEN st.step // 4 ELSE 0 END
                 AS diff
        FROM walk w
        JOIN d USING (doc_id)
        JOIN st ON st.i = w.idx
        WHERE w.s < 2 * d.m
      )
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(pred) AS BIGINT) AS s_sum,
           CAST(sum(abs(pred)) AS BIGINT) AS s_abs
    FROM walk GROUP BY doc_id ORDER BY doc_id
    """


@query("q400_ima_adpcm", oracle=_q400_oracle())
def q400_ima_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL adaptive-codec audio decode (operators/wave_ext.py round-7
    matrix, tag 0x11): each doc synthesizes a genuine mono IMA/DVI ADPCM
    WAV — block header carries an analytic initial predictor/step-index,
    data nibbles are analytic in doc_id — and ``multimodal.decode_wav``
    expands them through the table-driven 4-bit state machine (RFC 3551
    section 4.5.1: shift-and-add diff, +-32768 predictor clamp, 0..88
    index clamp).  The DuckDB oracle replays the ENTIRE state machine as
    a recursive CTE over the spliced step table, so every predictor
    sample matches exactly — the strongest possible cross-engine check
    for a sequential codec (no checksum shortcut: the signed sum pins
    sign handling, the abs sum pins magnitudes).  Audio fallback is now
    MP3/OGG/MS-ADPCM only.  Decode is Arrow-batched mapInPandas on
    executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 30
    )

    def synth_decode(batches):
        import struct as st

        import pandas as pd

        from rust_dataframe_spark.operators.multimodal import decode_wav
        from rust_dataframe_spark.operators.wave_ext import encode_wav_raw

        for pdf in batches:
            rows = {"doc_id": [], "n_samples": [], "s_sum": [], "s_abs": []}
            for d in pdf["doc_id"]:
                d = int(d)
                m = 60 + d % 20
                p0 = ((d * 997) % 4001) - 2000
                i0 = d % 89
                block = st.pack("<hBB", p0, i0, 0) + bytes(
                    (d * 11 + j * 17) % 256 for j in range(m)
                )
                _sr, _ch, _sw, s = decode_wav(
                    encode_wav_raw(0x11, 4, 8000, 1, block,
                                   block_align=len(block))
                )
                rows["doc_id"].append(d)
                rows["n_samples"].append(len(s))
                rows["s_sum"].append(sum(s))
                rows["s_abs"].append(sum(abs(x) for x in s))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, n_samples bigint, s_sum bigint, s_abs bigint",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q401: full PNG format matrix decode with placement-pinning checksums
# ---------------------------------------------------------------------------


@query(
    "q401_png_matrix",
    oracle="""
    WITH d AS (SELECT doc_id, doc_id % 5 AS arm,
                      5 + doc_id % 12 AS w,
                      4 + (doc_id // 3) % 9 AS h
               FROM documents WHERE doc_id < 80),
    xs AS (SELECT doc_id, arm, w, h, unnest(range(0, w)) AS x FROM d),
    ys AS (SELECT doc_id, arm, w, h, x, unnest(range(0, h)) AS y FROM xs),
    cs AS (SELECT doc_id, arm, w, h, x, y, unnest(range(0, 3)) AS c
           FROM ys),
    px AS (
      SELECT doc_id, w, h, 1 AS ch, (y * w + x) AS pos,
             ((x + y + doc_id) % 2) * 255 AS v
      FROM ys WHERE arm = 0
      UNION ALL
      SELECT doc_id, w, h, 1, (y * w + x),
             ((x * 3 + y * 2 + doc_id) % 16) * 17
      FROM ys WHERE arm = 1
      UNION ALL
      SELECT doc_id, w, h, 1, (y * w + x),
             ((x * 257 + y * 93 + doc_id * 11) % 65536) // 256
      FROM ys WHERE arm = 2
      UNION ALL
      SELECT doc_id, w, h, 3, (y * w + x) * 3 + c,
             (((x + 2 * y + doc_id) % 16)
              * (CASE c WHEN 0 THEN 3 WHEN 1 THEN 5 ELSE 7 END)) % 256
      FROM cs WHERE arm = 3
      UNION ALL
      SELECT doc_id, w, h, 3, (y * w + x) * 3 + c,
             (x * 5 + y * 7 + c * 11 + doc_id) % 256
      FROM cs WHERE arm = 4
    )
    SELECT doc_id, CAST(max(w) AS INT) AS width, CAST(max(h) AS INT) AS height,
           CAST(max(ch) AS INT) AS channels,
           CAST(sum(v) AS BIGINT) AS px_sum,
           CAST(sum(v * pos) AS BIGINT) AS px_wsum
    FROM px GROUP BY doc_id ORDER BY doc_id
    """,
)
def q401_png_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL PNG format-matrix decode, driver-checkable (operators/png.py
    round-7 completion: all five color types, bit depths 1/2/4/8/16,
    Adam7 interlace): five arms by doc_id — 1-bit gray Adam7, 4-bit gray
    sequential, 16-bit gray Adam7, 4-bit PALETTE Adam7 (PLTE lookup),
    8-bit RGB Adam7 — each synthesized as a real zlib/CRC container
    executor-side and decoded back.  Beyond q327 (which pinned the 8-bit
    sequential core), the POSITION-WEIGHTED checksum ``px_wsum = sum(v *
    linear_position)`` pins Adam7 DEINTERLACING itself: a sub-image
    placed at the wrong origin or stride matches px_sum but not px_wsum.
    Expansion laws replayed by the oracle: sub-byte bit replication
    ``v*255//(2^d-1)``, 16-bit high byte, palette triple ``(3i,5i,7i) %
    256``.  The pure-python parity law interlaced==sequential over the
    whole matrix is pytest-pinned (TestPngMatrix).  All decode is
    Arrow-batched mapInPandas on executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 80
    )

    def synth_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.png import decode_png, encode_png

        pal = bytes(
            b for i in range(16)
            for b in ((i * 3) % 256, (i * 5) % 256, (i * 7) % 256)
        )
        for pdf in batches:
            rows = {"doc_id": [], "width": [], "height": [], "channels": [],
                    "px_sum": [], "px_wsum": []}
            for d in pdf["doc_id"]:
                d = int(d)
                arm, w, h = d % 5, 5 + d % 12, 4 + (d // 3) % 9
                if arm == 0:
                    vals = [(x + y + d) % 2 for y in range(h) for x in range(w)]
                    p = encode_png(w, h, vals, channels=1, depth=1, interlace=1)
                elif arm == 1:
                    vals = [(x * 3 + y * 2 + d) % 16
                            for y in range(h) for x in range(w)]
                    p = encode_png(w, h, vals, channels=1, depth=4)
                elif arm == 2:
                    vals = [(x * 257 + y * 93 + d * 11) % 65536
                            for y in range(h) for x in range(w)]
                    p = encode_png(w, h, vals, channels=1, depth=16, interlace=1)
                elif arm == 3:
                    vals = [(x + 2 * y + d) % 16
                            for y in range(h) for x in range(w)]
                    p = encode_png(w, h, vals, palette=pal, depth=4, interlace=1)
                else:
                    vals = [(x * 5 + y * 7 + c * 11 + d) % 256
                            for y in range(h) for x in range(w)
                            for c in range(3)]
                    p = encode_png(w, h, vals, channels=3, interlace=1)
                ww, hh, ch, out = decode_png(p)
                rows["doc_id"].append(d)
                rows["width"].append(ww)
                rows["height"].append(hh)
                rows["channels"].append(ch)
                rows["px_sum"].append(sum(out))
                rows["px_wsum"].append(sum(v * i for i, v in enumerate(out)))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, width int, height int, channels int, "
        "px_sum bigint, px_wsum bigint",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q402: MS-ADPCM audio decode — recursive-CTE oracle with 3-variable state
# ---------------------------------------------------------------------------


def _q402_oracle() -> str:
    """Recursive-CTE replay of the MS-ADPCM decoder (wave_ext.msadpcm_step):
    3-variable state (s1, s2, delta), spliced coefficient/adaptation
    tables, and floor(x/256.0) for the C arithmetic shift (DuckDB's //
    truncates toward zero on negatives, Python's >> floors)."""
    from .operators.wave_ext import MSADPCM_ADAPT, MSADPCM_COEFS

    coefs = ", ".join(f"({i}, {c1}, {c2})" for i, (c1, c2) in enumerate(MSADPCM_COEFS))
    adapt = ", ".join(f"({n}, {a})" for n, a in enumerate(MSADPCM_ADAPT))
    nib = (
        "(CASE WHEN w.s % 2 = 0 "
        "THEN ((d.doc_id * 11 + (w.s // 2) * 29) % 256) // 16 "
        "ELSE ((d.doc_id * 11 + (w.s // 2) * 29) % 256) % 16 END)"
    )
    return f"""
    WITH RECURSIVE
    d AS (SELECT doc_id, 50 + doc_id % 20 AS m,
                 doc_id % 7 AS pidx,
                 16 + (doc_id * 13) % 1000 AS delta0,
                 ((doc_id * 131) % 30001) - 15000 AS s1_0,
                 ((doc_id * 373) % 30001) - 15000 AS s2_0
          FROM documents WHERE doc_id < 30),
    co(i, c1, c2) AS (SELECT * FROM (VALUES {coefs})),
    ad(n, a) AS (SELECT * FROM (VALUES {adapt})),
    walk(doc_id, s, s1, s2, delta) AS (
      SELECT doc_id, 0, s1_0, s2_0, delta0 FROM d
      UNION ALL
      SELECT doc_id, s + 1,
             GREATEST(-32768, LEAST(32767,
               CAST(floor((s1 * c1 + s2 * c2) / 256.0) AS BIGINT)
               + (CASE WHEN nib >= 8 THEN nib - 16 ELSE nib END) * delta)),
             s1,
             GREATEST(16, LEAST(8388607, (a * delta) // 256))
      FROM (
        SELECT w.doc_id, w.s, w.s1, w.s2, w.delta,
               co.c1, co.c2, {nib} AS nib, ad.a
        FROM walk w
        JOIN d USING (doc_id)
        JOIN co ON co.i = d.pidx
        JOIN ad ON ad.n = {nib}
        WHERE w.s < 2 * d.m
      )
    ),
    emitted AS (
      SELECT doc_id, s2_0 AS v FROM d
      UNION ALL
      SELECT doc_id, s1_0 FROM d
      UNION ALL
      SELECT doc_id, s1 FROM walk WHERE s >= 1
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(v) AS BIGINT) AS s_sum,
           CAST(sum(abs(v)) AS BIGINT) AS s_abs
    FROM emitted GROUP BY doc_id ORDER BY doc_id
    """


@query("q402_ms_adpcm", oracle=_q402_oracle())
def q402_ms_adpcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MS-ADPCM audio decode (operators/wave_ext.py tag 0x02 — the
    second adaptive WAV codec beside q400's IMA): 7 fixed predictor
    coefficient pairs, adaptive delta via the 16-entry table, header
    samples emitted oldest-first.  Each doc synthesizes a one-block mono
    MS-ADPCM WAV with analytic header state (predictor index, initial
    delta/samples) and analytic high-nibble-first data; the oracle
    replays the FULL 3-variable state machine (s1, s2, delta) as a
    recursive CTE over the spliced coefficient/adaptation tables, with
    ``floor(x/256.0)`` standing in for C's arithmetic right-shift
    (DuckDB ``//`` truncates toward zero, Python ``>>`` floors — the
    docstring-level difference that would silently corrupt negative
    predictions).  With q399+q400+q402, every common WAV format tag
    (PCM 8/16/24/32, float32, G.711 both laws, both ADPCMs) decodes for
    real; the audio gate is MP3/OGG — true DSP codecs.  Decode is
    Arrow-batched mapInPandas on executors."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 30
    )

    def synth_decode(batches):
        import struct as st

        import pandas as pd

        from rust_dataframe_spark.operators.multimodal import decode_wav
        from rust_dataframe_spark.operators.wave_ext import encode_wav_raw

        for pdf in batches:
            rows = {"doc_id": [], "n_samples": [], "s_sum": [], "s_abs": []}
            for d in pdf["doc_id"]:
                d = int(d)
                m = 50 + d % 20
                block = (
                    bytes([d % 7])
                    + st.pack(
                        "<hhh",
                        16 + (d * 13) % 1000,
                        ((d * 131) % 30001) - 15000,
                        ((d * 373) % 30001) - 15000,
                    )
                    + bytes((d * 11 + j * 29) % 256 for j in range(m))
                )
                _sr, _ch, _sw, s = decode_wav(
                    encode_wav_raw(0x02, 4, 8000, 1, block,
                                   block_align=len(block))
                )
                rows["doc_id"].append(d)
                rows["n_samples"].append(len(s))
                rows["s_sum"].append(sum(s))
                rows["s_abs"].append(sum(abs(x) for x in s))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        synth_decode,
        "doc_id bigint, n_samples bigint, s_sum bigint, s_abs bigint",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q403: Kneser-Ney smoothed LM perplexity (the real CCNet filter smoothing)
# ---------------------------------------------------------------------------


@query(
    "q403_kneser_ney",
    oracle=r"""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS w
      FROM documents WHERE doc_id < 100
    ),
    grams AS (
      SELECT doc_id, unnest(list_transform(
               range(1, greatest(len(w) - 1, 0) + 1),
               i -> {'a': w[i], 'b': w[i + 1]})) AS g
      FROM base
    ),
    g2 AS (SELECT doc_id, g.a AS a, g.b AS b FROM grams),
    c2 AS (SELECT a, b, CAST(count(*) AS BIGINT) AS c2 FROM g2 GROUP BY 1, 2),
    ctx AS (SELECT a, CAST(sum(c2) AS BIGINT) AS ctx,
                   CAST(count(*) AS BIGINT) AS n1f
            FROM c2 GROUP BY 1),
    bwd AS (SELECT b, CAST(count(*) AS BIGINT) AS n1b FROM c2 GROUP BY 1),
    nt AS (SELECT CAST(count(*) AS BIGINT) AS N FROM c2),
    scored AS (
      SELECT g2.doc_id,
             ln(CAST(greatest(4 * c2.c2 - 3, 0) * nt.N
                     + 3 * ctx.n1f * bwd.n1b AS DOUBLE)
                / CAST(4 * ctx.ctx * nt.N AS DOUBLE)) AS lp
      FROM g2 JOIN c2 USING (a, b) JOIN ctx USING (a) JOIN bwd USING (b)
      CROSS JOIN nt
    ),
    per_doc AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, avg(lp) AS alp
      FROM scored GROUP BY 1
    )
    SELECT b.doc_id,
           COALESCE(p.n_bigrams, 0) AS n_bigrams,
           floor(p.alp * 1000000) / 1000000 AS avg_logprob,
           floor(exp(-p.alp) * 1000000) / 1000000 AS ppl
    FROM base b LEFT JOIN per_doc p USING (doc_id)
    ORDER BY doc_id
    """,
)
def q403_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERPOLATED KNESER-NEY perplexity filter (operators/text.
    kneser_ney_logprob) — the published smoothing the real CCNet/KenLM
    quality filters use, completing the LM-scoring family: q208 unigram
    surprisal -> q317 add-1 bigram -> KN bigram (absolute discount D=3/4
    kept RATIONAL so the per-bigram probability numerator is exact int64
    in both engines; ln + avg + round(6) is the one float step, the q317
    discipline).  The backoff mass goes to the CONTINUATION distribution
    (how many contexts a word follows), which is what separates fluent
    text from stitched boilerplate with locally-plausible bigrams.
    Model tables: bigram counts + two distinct-continuation aggregates
    over the SAME persisted bigram table + a 1-row N broadcast — all
    Heaps'-bounded, no second corpus scan.  Restricted to doc_id < 100
    so the oracle's self-model matches exactly."""
    from .operators.text import kneser_ney_logprob

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    out = kneser_ney_logprob(d, "doc_id", "text")
    # floor-at-6 on both engines (round() tie-breaks differ on .xxxxxx5 —
    # the repo convention for float-pinned outputs)
    return out.select(
        "doc_id",
        "n_bigrams",
        (F.floor(F.col("avg_logprob") * 1e6) / 1e6).alias("avg_logprob"),
        (F.floor(F.col("ppl") * 1e6) / 1e6).alias("ppl"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q404: Bradley-Terry preference aggregation (RLHF reward-data shape)
# ---------------------------------------------------------------------------


def _q404_oracle() -> str:
    """2-round unrolled MM replay: per-round CTE macro with the same
    ordered folds (opponent-id denominator, item-id normalizer,
    pair-key likelihood ledger) and floor(x*S+0.5) grid quantization as
    operators/ranking.bradley_terry."""
    S = 1 << 20

    def rnd(r: int, prev: str) -> str:
        return f"""
    both{r} AS (SELECT pt.i, pt.j, pt.n, pt.w, a.q AS qi, b.q AS qj
                FROM pt JOIN {prev} a ON a.item = pt.i
                        JOIN {prev} b ON b.item = pt.j),
    ll{r} AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(w * ln(CAST(qi AS DOUBLE) / CAST(qi + qj AS DOUBLE))
                      + (n - w) * ln(CAST(qj AS DOUBLE) / CAST(qi + qj AS DOUBLE))
                      ORDER BY concat(i, '#', j))), (x, y) -> x + y) AS ll
              FROM both{r}),
    sym{r} AS (SELECT i AS item, j AS opp,
                      CAST(n AS DOUBLE) * {S}.0 / CAST(qi + qj AS DOUBLE) AS t
               FROM both{r}
               UNION ALL
               SELECT j, i, CAST(n AS DOUBLE) * {S}.0 / CAST(qi + qj AS DOUBLE)
               FROM both{r}),
    dens{r} AS (SELECT item, list_reduce(list_prepend(CAST(0 AS DOUBLE),
                  list(t ORDER BY opp)), (x, y) -> x + y) AS D
                FROM sym{r} GROUP BY item),
    raw{r} AS (SELECT d.item, CAST(wins.W AS DOUBLE) / d.D AS raw
               FROM dens{r} d JOIN wins USING (item)),
    nrm{r} AS (SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                 list(raw ORDER BY item)), (x, y) -> x + y) AS nm
               FROM raw{r}),
    pi{r} AS (SELECT item, GREATEST(1, CAST(floor(raw / (SELECT nm FROM nrm{r})
                 * {S} + 0.5) AS BIGINT)) AS q
              FROM raw{r})"""

    return f"""
    WITH p0 AS (SELECT doc_id, doc_id % 20 AS a,
                       (doc_id // 20 + doc_id + 1) % 20 AS b
                FROM documents WHERE doc_id < 400),
    cmp AS (SELECT a, b,
                   CASE WHEN (doc_id * 7919 + 13) % (a + b + 2) <= a
                        THEN a ELSE b END AS wnr
            FROM p0 WHERE a <> b),
    pt AS (SELECT least(a, b) AS i, greatest(a, b) AS j,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum((wnr = least(a, b))::INT) AS BIGINT) AS w
           FROM cmp GROUP BY 1, 2),
    wins AS (SELECT item, CAST(sum(wn) AS BIGINT) AS W FROM (
               SELECT i AS item, w AS wn FROM pt
               UNION ALL SELECT j, n - w FROM pt) GROUP BY 1),
    pi0 AS (SELECT item, CAST({S} AS BIGINT) AS q FROM wins),
    {rnd(1, 'pi0')},
    {rnd(2, 'pi1')}
    SELECT 1 AS round, item, q AS strength_q,
           floor((SELECT ll FROM ll1) * 1000000) / 1000000 AS ll_in,
           2 AS n_rounds FROM pi1
    UNION ALL
    SELECT 2, item, q, floor((SELECT ll FROM ll2) * 1000000) / 1000000, 2
    FROM pi2
    ORDER BY round, item
    """


@query("q404_bradley_terry", oracle=_q404_oracle())
def q404_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference aggregation (operators/ranking.
    bradley_terry) — the RLHF/eval step that turns pairwise preferences
    into per-item strengths, run 2 MM rounds so the oracle can unroll:
    Hunter's MM update with integer-grid quantization every round (the
    q396 EM discipline — within a round every float is a ratio of int64s
    folded in a defined order), a per-round corpus LOG-LIKELIHOOD ledger
    (MM monotonicity, pinned in tests up to the documented quantization
    slack), per-round lineage truncation on the item axis (plan depth
    O(1) in rounds, kmeans-centroid collect discipline).  The fixture
    derives 380 deterministic comparisons over 20 items from doc_id
    alone (strength-correlated: P(a wins) ~ (a+1)/(a+b+2), BT's own
    generative form), so the fitted strengths must recover the item
    ordering — asserted in tests.  Scale: the comparison corpus reduces
    FIRST to the (i, j, n, w) pair table; each round is one pair-vs-item
    join + grouped ordered folds."""
    from .operators.ranking import bradley_terry

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    cmp = d.select(
        (F.col("doc_id") % 20).alias("a"),
        ((F.col("doc_id") / 20).cast("long") + F.col("doc_id") + 1).alias("__t"),
        F.col("doc_id"),
    ).select(
        "a",
        (F.col("__t") % 20).alias("b"),
        "doc_id",
    ).filter(F.col("a") != F.col("b")).select(
        F.when(
            (F.col("doc_id") * 7919 + 13) % (F.col("a") + F.col("b") + 2)
            <= F.col("a"),
            F.col("a"),
        ).otherwise(F.col("b")).alias("winner"),
        F.when(
            (F.col("doc_id") * 7919 + 13) % (F.col("a") + F.col("b") + 2)
            <= F.col("a"),
            F.col("b"),
        ).otherwise(F.col("a")).alias("loser"),
    )
    out = bradley_terry(cmp, "winner", "loser", iters=2, quant_scale=1 << 20)
    # floor-at-6, the repo's engine-stable float-pinning convention
    return out.select(
        "round", "item", "strength_q",
        (F.floor(F.col("ll_in") * 1e6) / 1e6).alias("ll_in"),
        "n_rounds",
    ).orderBy("round", "item")
