"""Catalog extension: training-data assembly (operators/training.py +
dedup.repeated_ngram_spans) — domain mixing, sequence packing, semantic
dedup, exact-substring detection.  North-star ops beyond the reference's
frame-verb surface (its data model stops at tables; these are the steps a
100 TB LLM pipeline runs on top).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import query, table
from .catalog_llm import _CORPUS_NEAR, _corpus_near
from .operators import dedup as dd
from .operators import similarity as sim
from .operators import text as tx
from .operators import training as tr

_SPACE = 1 << 32
_MIX = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_MIX_DEFAULT = 0.1
_MIX_SALT = "mix1"


def _q124_oracle() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {int(f * _SPACE)}" for s, f in _MIX.items()
    )
    return f"""
    WITH h AS (
      SELECT doc_id, source, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{_MIX_SALT}'), 1, 8))::UBIGINT AS hv
      FROM documents
    )
    SELECT source, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id,
           sum(n_chars) AS chars
    FROM h
    WHERE hv < CASE source {cases} ELSE {int(_MIX_DEFAULT * _SPACE)} END
    GROUP BY source ORDER BY source
    """


@query("q124_stratified_sample", oracle=_q124_oracle())
def q124_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling (operators/training.stratified_sample): keep
    100% of src0, 50% of src1, 25% of src2, 10% of everything else — each
    document's fate a pure md5 function of its id, so the mixture is
    reproducible across runs, engines, and incremental reprocessing.  One
    codegen'd filter over the scan; no shuffle."""
    d = table(spark, sf_dir, "documents")
    kept = tr.stratified_sample(
        d, "doc_id", "source", _MIX, default_fraction=_MIX_DEFAULT, salt=_MIX_SALT
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
            F.sum("n_chars").cast("bigint").alias("chars"),
        )
        .orderBy("source")
    )


@query(
    "q125_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             sum(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, n_tokens,
           cum - n_tokens                                            AS start_off,
           CAST(floor((cum - n_tokens) / 512.0) AS BIGINT)           AS first_chunk,
           CAST(CASE WHEN n_tokens > 0 THEN floor((cum - 1) / 512.0)
                     ELSE floor((cum - n_tokens) / 512.0) END AS BIGINT) AS last_chunk,
           CAST(CASE WHEN n_tokens > 0 THEN floor((cum - 1) / 512.0)
                     ELSE floor((cum - n_tokens) / 512.0) END
                - floor((cum - n_tokens) / 512.0) + 1 AS BIGINT)     AS n_chunks
    FROM c ORDER BY doc_id
    """,
)
def q125_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk packing (operators/training.pack_sequences):
    documents laid end-to-end in doc_id order, cut into 512-token sequences;
    each doc gets its global token offset and the chunk ids it spans.  The
    global running sum is the distributed two-phase prefix sum — the oracle's
    single-node `sum() OVER (ORDER BY)` is exactly what the operator refuses
    to plan (no Exchange SinglePartition; plan-pinned)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tokens")
    )
    packed = tr.pack_sequences(d, "doc_id", "n_tokens", 512)
    return packed.select(
        "doc_id", "n_tokens", "start_off", "first_chunk", "last_chunk", "n_chunks"
    ).orderBy("doc_id")


_Q126_EPS = 0.35


def _q126_oracle() -> str:
    return f"""
    WITH c AS (SELECT vec_id AS cid,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)
                          / sqrt(list_dot_product(
                              list_transform(embedding, y -> CAST(y AS DOUBLE)),
                              list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS cvn
               FROM embeddings WHERE vec_id < 4),
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
          FROM embeddings),
    sims AS (SELECT e.vec_id, c.cid, e.emb,
                    row_number() OVER (PARTITION BY e.vec_id ORDER BY
                        list_dot_product(emb, cvn) DESC, c.cid ASC) AS rn
             FROM e CROSS JOIN c),
    assign AS (SELECT vec_id, cid AS cell, emb FROM sims WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT a.vec_id
      FROM assign a JOIN assign b ON a.cell = b.cell AND b.vec_id < a.vec_id
      WHERE list_dot_product(a.emb, b.emb)
            / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))
            >= {_Q126_EPS}
    )
    SELECT vec_id, cell FROM assign
    WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    ORDER BY vec_id
    """


@query("q126_semdedup", oracle=_q126_oracle())
def q126_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (operators/training.semdedup, SemDeDup shape): cluster
    every embedding to its nearest centroid (deterministic quantizer:
    centroids = vec_id < 4, same injectable pattern as q86), then drop any
    vector with a smaller-id neighbor at cosine >= 0.35 in its cell.
    Candidates are cell-bounded; the decision is one left-anti join."""
    e = table(spark, sf_dir, "embeddings")
    cent_rows = e.filter(F.col("vec_id") < 4).select("vec_id", "embedding").collect()
    centroids = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in cent_rows]
    out = tr.semdedup(e, "vec_id", "embedding", centroids, eps=_Q126_EPS)
    return out.select("vec_id", "cell").orderBy("vec_id")


@query(
    "q127_repeated_spans",
    oracle=f"""
    WITH {_CORPUS_NEAR},
    w AS (SELECT doc_id, string_split(text, ' ') AS words FROM corpus),
    g0 AS (SELECT doc_id, words,
                  unnest(range(1, greatest(len(words) - 4, 0) + 1)) AS i
           FROM w),
    g AS (SELECT doc_id, i - 1 AS pos, array_to_string(words[i:i+4], ' ') AS ng
          FROM g0),
    shared AS (SELECT ng FROM g GROUP BY ng HAVING count(DISTINCT doc_id) >= 2),
    isl AS (SELECT g.doc_id, g.pos,
                   g.pos - row_number() OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS k
            FROM g JOIN shared USING (ng))
    SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end,
           count(*) AS n_grams
    FROM isl GROUP BY doc_id, k ORDER BY doc_id, span_start
    """,
)
def q127_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-substring spans at 5-gram resolution
    (operators/dedup.repeated_ngram_spans) — the sharded form of exact
    substring dedup (Lee et al. used a single-machine suffix array; an
    n-gram inverted index shards).  Corpus = documents + tail-modified
    copies (same injected fixture as q72), so every base doc shares its
    body span with its copy.  Shuffles carry md5 digests, never text;
    spans merge via one gaps-and-islands window per doc."""
    corpus = _corpus_near(spark, sf_dir)
    spans = dd.repeated_ngram_spans(corpus, "doc_id", "text", n=5, min_docs=2)
    return spans.orderBy("doc_id", "span_start")


@query(
    "q326_span_excision",
    oracle=f"""
    WITH {_CORPUS_NEAR},
    w AS (SELECT doc_id, string_split(text, ' ') AS words FROM corpus),
    g0 AS (SELECT doc_id, words,
                  unnest(range(1, greatest(len(words) - 4, 0) + 1)) AS i
           FROM w),
    g AS (SELECT doc_id, i - 1 AS pos, array_to_string(words[i:i+4], ' ') AS ng
          FROM g0),
    shared AS (SELECT ng FROM g GROUP BY ng HAVING count(DISTINCT doc_id) >= 2),
    isl AS (SELECT g.doc_id, g.pos,
                   g.pos - row_number() OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS k
            FROM g JOIN shared USING (ng)),
    sp AS (SELECT doc_id, min(pos) AS span_start, max(pos) + 4 AS span_end
           FROM isl GROUP BY doc_id, k),
    nsp AS (SELECT doc_id, count(*) AS n_spans FROM sp GROUP BY doc_id),
    wp AS (SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i FROM w),
    wp2 AS (SELECT doc_id, i - 1 AS idx, words[i] AS word FROM wp),
    m AS (SELECT wp2.doc_id, wp2.idx, wp2.word,
                 EXISTS (SELECT 1 FROM sp
                         WHERE sp.doc_id = wp2.doc_id
                           AND wp2.idx BETWEEN sp.span_start AND sp.span_end) AS rm
          FROM wp2)
    SELECT m.doc_id,
           coalesce(array_to_string(list(word ORDER BY idx) FILTER (WHERE NOT rm),
                                    ' '), '') AS text,
           CAST(coalesce(any_value(nsp.n_spans), 0) AS INT) AS n_spans,
           CAST(sum(len(word)) AS BIGINT) AS chars_in,
           CAST(coalesce(sum(len(word)) FILTER (WHERE NOT rm), 0) AS BIGINT)
             AS chars_kept,
           CAST(coalesce(sum(len(word)) FILTER (WHERE rm), 0) AS BIGINT)
             AS chars_removed
    FROM m LEFT JOIN nsp ON m.doc_id = nsp.doc_id
    GROUP BY m.doc_id ORDER BY m.doc_id
    """,
)
def q326_span_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup with span REMOVAL (operators/dedup.
    excise_repeated_spans) — the act half of q127's detect: every maximal
    cross-document repeated span is cut out of every document and the
    unique remainders reassemble in order (Lee et al.'s
    deduplicate-text-datasets discipline, sharded).  The oracle replays
    the full detect->excise pipeline in SQL; ``chars_kept +
    chars_removed = chars_in`` is a conservation check computed from
    complementary independent filters on both engines (also pinned in
    tests/test_llm_ops.py)."""
    corpus = _corpus_near(spark, sf_dir)
    out = dd.excise_repeated_spans(corpus, "doc_id", "text", n=5, min_docs=2)
    return out.orderBy("doc_id")


@query(
    "q328_cdc_dedup",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents WHERE doc_id < 300
      UNION ALL
      SELECT doc_id + 100000 AS doc_id, 'zzp0 zzp1 zzp2 ' || text AS text
      FROM documents WHERE doc_id < 20
    ),
    w AS (SELECT doc_id, string_split(text, ' ') AS words FROM corpus),
    g0 AS (SELECT doc_id, words, unnest(range(1, len(words) + 1)) AS i FROM w),
    g AS (SELECT doc_id, i - 1 AS pos, words[i] AS word FROM g0),
    b AS (SELECT doc_id, pos, word,
                 CASE WHEN ('0x' || substr(md5(word), 1, 8))::UBIGINT % 16 = 0
                      THEN 1 ELSE 0 END AS bnd
          FROM g),
    cid AS (SELECT doc_id, pos, word,
                   coalesce(sum(bnd) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS chunk_id
            FROM b),
    chunks AS (SELECT doc_id, chunk_id,
                      md5(array_to_string(list(word ORDER BY pos), ' ')) AS digest
               FROM cid GROUP BY doc_id, chunk_id),
    orig AS (SELECT DISTINCT digest FROM chunks WHERE doc_id < 100000),
    copies AS (SELECT c.doc_id, c.digest,
                      (o.digest IS NOT NULL)::INT AS shared
               FROM chunks c LEFT JOIN orig o USING (digest)
               WHERE c.doc_id >= 100000)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(shared) AS BIGINT) AS n_shared,
           round(sum(shared) * 1.0 / count(*), 6) AS shared_frac
    FROM copies GROUP BY doc_id ORDER BY doc_id
    """,
)
def q328_cdc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup (operators/dedup.cdc_chunks) with the
    SHIFT-RESISTANCE property proven on the data: copies of the first 20
    docs get a 3-word prefix injected — every fixed-size block and every
    whole-document hash now differs — yet the content-defined boundaries
    re-align after the first chunk, so almost all of each copy's chunks
    match an original chunk digest (``shared_frac`` near 1).  This is how
    a re-crawled 100 TB corpus dedups against last month's snapshot at the
    storage layer: chunk digests join; documents never compare.  Honest
    edge: a doc shorter than one expected chunk (~16 words) has no interior
    boundary, so its single polluted chunk shares nothing — CDC degrades
    to whole-doc hashing below the chunk scale (visible as shared_frac=0
    rows here).  Chunk rebuild is per-doc windowed; the cross-version
    check is one digest semi-join."""
    d = table(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") < 300)
    shifted = d.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.lit("zzp0 zzp1 zzp2 "), F.col("text")).alias("text"),
    )
    ch = dd.cdc_chunks(base.unionByName(shifted), "doc_id", "text", avg_words=16)
    orig = ch.filter(F.col("doc_id") < 100000).select("digest").distinct()
    copies = ch.filter(F.col("doc_id") >= 100000).join(
        orig.withColumn("__hit", F.lit(1)), "digest", "left"
    )
    return (
        copies.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("bigint").alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_shared",
            F.round(F.col("n_shared") / F.col("n_chunks"), 6).alias("shared_frac"),
        )
        .orderBy("doc_id")
    )


@query(
    "q128_kmeans",
    oracle="""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    c0 AS (SELECT vec_id AS cid,
                  list_transform(emb, x -> x / sqrt(list_dot_product(emb, emb))) AS cvn
           FROM e WHERE vec_id < 4),
    s1 AS (SELECT e.vec_id, c0.cid, e.emb,
                  row_number() OVER (PARTITION BY e.vec_id ORDER BY
                      list_dot_product(emb, cvn) DESC, c0.cid ASC) AS rn
           FROM e CROSS JOIN c0),
    a1 AS (SELECT vec_id, cid AS cell, emb FROM s1 WHERE rn = 1),
    d1 AS (SELECT cell, unnest(range(1, 65)) AS dim, emb FROM a1),
    m1 AS (SELECT cell, dim, avg(emb[dim]) AS mv FROM d1 GROUP BY cell, dim),
    c1 AS (SELECT cell AS cid, list(mv ORDER BY dim) AS cv FROM m1 GROUP BY cell),
    c1n AS (SELECT cid,
                   list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cvn
            FROM c1),
    s2 AS (SELECT e.vec_id, c1n.cid,
                  row_number() OVER (PARTITION BY e.vec_id ORDER BY
                      list_dot_product(emb, cvn) DESC, c1n.cid ASC) AS rn
           FROM e CROSS JOIN c1n)
    SELECT vec_id, cid AS cell FROM s2 WHERE rn = 1 ORDER BY vec_id
    """,
)
def q128_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed spherical k-means (operators/training.kmeans), 2 Lloyd
    iterations, k=4, deterministic first-k init — trains the quantizer that
    q86/q126 take as given.  Per iteration: literal-centroid assignment
    (narrow codegen map) + elementwise-mean update whose shuffle is
    O(k * dim) rows; the driver sees only k centroid rows per round.  The
    oracle replays both iterations as chained CTEs (assignment argmax by
    normalized dot, per-dimension AVG, relist ORDER BY dim)."""
    e = table(spark, sf_dir, "embeddings")
    _, assigned = tr.kmeans(e, "vec_id", "embedding", k=4, n_iter=2)
    return assigned.orderBy("vec_id")


def _q130_oracle() -> str:
    def interleave(expr: str, c_idx: int) -> str:
        return " + ".join(
            f"((({expr} >> {b}) & 1) << {b * 2 + c_idx})" for b in range(16)
        )

    zc = interleave("(o_custkey & 65535)", 0)
    zd = interleave("(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) & 65535)", 1)
    return f"""
    WITH z AS (
      SELECT o_orderkey, CAST({zc} + {zd} AS BIGINT) AS zval
      FROM orders WHERE o_orderkey < 5000
    )
    SELECT zval >> 16 AS bucket, count(*) AS n, min(zval) AS z_min, max(zval) AS z_max
    FROM z GROUP BY 1 ORDER BY bucket
    """


@query("q130_zorder", oracle=_q130_oracle())
def q130_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) curve values (operators/layout.zorder_value): bit
    interleave of customer key and order date epoch-day, 16 bits each — the
    multi-column clustering key behind OPTIMIZE ZORDER.  Pure integer
    shifts/masks in codegen; the oracle replays the interleave as DuckDB
    arithmetic.  Layout effectiveness (per-file min-max span shrinkage on
    BOTH columns) is measured, not asserted, in tests/test_sources.py."""
    from .operators.layout import zorder_value

    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date"))
    z = zorder_value([F.col("o_custkey"), day], bits=16)
    return (
        o.select(z.alias("zval"))
        .groupBy(F.shiftright(F.col("zval"), 16).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
        .orderBy("bucket")
    )


@query(
    "q131_udtf_ngrams",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words
               FROM documents WHERE doc_id < 30),
    g0 AS (SELECT doc_id, words,
                  unnest(range(1, greatest(len(words) - 2, 0) + 1)) AS i
           FROM w),
    g AS (SELECT doc_id, i - 1 AS pos, array_to_string(words[i:i+2], ' ') AS ngram
          FROM g0)
    SELECT doc_id, pos, ngram FROM g ORDER BY doc_id, pos
    """,
)
def q131_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF in SQL LATERAL position (functions/table.NgramsUDTF):
    `FROM documents, LATERAL ngrams(text, 3)` — the table-function shape the
    reference's UDF registry never reached.  Row-at-a-time Python by design
    (API demonstration); the hot-path equivalent is the codegen'd
    dedup.shingle/posexplode, which the oracle also replays."""
    from .functions.table import register_udtfs

    register_udtfs(spark)
    table(spark, sf_dir, "documents").createOrReplaceTempView("__docs_udtf")
    return spark.sql(
        """
        SELECT doc_id, pos, ngram
        FROM __docs_udtf, LATERAL ngrams(text, 3)
        WHERE doc_id < 30
        ORDER BY doc_id, pos
        """
    )


@query(
    "q132_chunk_text",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words,
                      len(string_split(text, ' ')) AS nw
               FROM documents WHERE doc_id < 100),
    c AS (SELECT doc_id, nw, words,
                 unnest(range(0,
                     1 + CAST(floor((greatest(nw - 128, 0) + 95) / 96.0) AS INT))) AS k
          FROM w)
    SELECT doc_id, k AS chunk_id,
           array_to_string(words[k*96+1 : k*96+128], ' ') AS chunk_text,
           least(128, nw - k*96)                          AS n_tokens
    FROM c ORDER BY doc_id, chunk_id
    """,
)
def q132_chunk_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (operators/text.chunk_text,
    chunk=128 / overlap=32 -> stride 96) — the RAG-indexing / long-doc
    training-prep step.  Generate-and-explode per document, slices in
    codegen, no shuffle; the oracle replays windows with unnest(range) +
    1-based list slices."""
    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    out = tx.chunk_text(d, "doc_id", "text", chunk_tokens=128, overlap=32)
    return out.orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# q155: corpus-level line dedup (CCNet/RefinedWeb boilerplate removal)
# ---------------------------------------------------------------------------

# deterministic "lines": break the space-separated text into 3-word lines on
# BOTH engines with the same regex, so the line-dedup semantics (not the line
# derivation) are what the oracle checks
_Q155_PAT = r"((\S+\s+){2}\S+)\s+"
_Q155_MIN_DOCS = 3


@query(
    "q155_line_dedup",
    oracle=f"""
    WITH lined AS (
      SELECT doc_id,
             string_split(regexp_replace(text, '{_Q155_PAT}', '\\1' || chr(10), 'g'),
                          chr(10)) AS parts
      FROM documents),
    lines AS (
      SELECT doc_id, parts[ord] AS line, ord
      FROM (SELECT doc_id, parts, unnest(range(1, len(parts) + 1)) AS ord
            FROM lined)),
    hot AS (
      SELECT line FROM lines GROUP BY line
      HAVING count(DISTINCT doc_id) >= {_Q155_MIN_DOCS}),
    marked AS (
      SELECT l.doc_id, l.line, l.ord, (h.line IS NOT NULL) AS dropped
      FROM lines l LEFT JOIN hot h ON l.line = h.line)
    SELECT doc_id,
           md5(coalesce(string_agg(CASE WHEN NOT dropped THEN line END,
                                   chr(10) ORDER BY ord), '')) AS text_fp,
           CAST(count(CASE WHEN NOT dropped THEN 1 END) AS BIGINT) AS n_kept,
           CAST(count(CASE WHEN dropped THEN 1 END) AS BIGINT)     AS n_dropped
    FROM marked GROUP BY doc_id ORDER BY doc_id
    """,
)
def q155_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level line deduplication (operators/text.line_dedup — the
    CCNet/RefinedWeb boilerplate pass): every line appearing verbatim in >= 3
    distinct documents is struck from ALL documents; survivors re-join in
    original order (value-checked via md5 of the rebuilt text).  Scale: the
    blocklist is built from md5 digests (16 B/line shuffle) and broadcast
    back, so the corpus shuffles once (reassembly), never on line text."""
    d = table(spark, sf_dir, "documents")
    lined = d.select(
        "doc_id",
        F.regexp_replace(F.col("text"), _Q155_PAT, "$1\n").alias("text"),
    )
    out = tx.line_dedup(lined, "doc_id", "text", min_docs=_Q155_MIN_DOCS)
    return out.select(
        "doc_id",
        F.md5(F.col("text")).alias("text_fp"),
        "n_kept",
        "n_dropped",
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q156: int8 embedding quantization + quantized-vs-exact cosine parity
# ---------------------------------------------------------------------------


@query(
    "q156_int8_quant",
    oracle="""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings WHERE vec_id <= 100),
    m AS (SELECT vec_id, emb,
                 list_aggregate(list_transform(emb, x -> abs(x)), 'max') AS mx
          FROM e),
    q AS (SELECT vec_id, emb,
                 list_transform(emb, x -> CAST(round(
                     x / (CASE WHEN mx > 0 THEN mx / 127.0 ELSE 1.0 END)) AS INT)) AS qv
          FROM m),
    qq AS (SELECT vec_id, emb,
                  list_transform(qv, x -> CAST(x AS DOUBLE)) AS qd
           FROM q),
    p AS (SELECT a.vec_id AS pair_id,
                 list_dot_product(a.emb, b.emb)
                   / (sqrt(list_dot_product(a.emb, a.emb))
                      * sqrt(list_dot_product(b.emb, b.emb))) AS ce,
                 list_dot_product(a.qd, b.qd)
                   / (sqrt(list_dot_product(a.qd, a.qd))
                      * sqrt(list_dot_product(b.qd, b.qd))) AS cq
          FROM qq a JOIN qq b ON b.vec_id = a.vec_id + 1)
    SELECT pair_id, round(ce, 6) AS cos_exact, round(cq, 6) AS cos_int8,
           round(abs(ce - cq), 4) AS abs_err4
    FROM p ORDER BY pair_id
    """,
)
def q156_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 embedding quantization (operators/similarity.quantize_int8):
    symmetric per-vector max-abs scaling to int8 codes — the 4x memory /
    shuffle lever for ANN at 100 TB — verified by computing cosine on the
    codes next to exact float cosine for 100 adjacent-id pairs and bounding
    the error.  Codes are exact integers, so both engines agree bit-for-bit
    on the quantized path; scales cancel in the cosine ratio (no scale
    column needed).  All HOF codegen; the only shuffle is the pair join."""
    e = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 100)
    qd = sim.quantize_int8(e, "embedding")
    a = qd.select(
        F.col("vec_id").alias("pair_id"),
        F.col("embedding").alias("ea"),
        F.col("qvec").alias("qa"),
    )
    b = qd.select(
        (F.col("vec_id") - 1).alias("pair_id"),
        F.col("embedding").alias("eb"),
        F.col("qvec").alias("qb"),
    )
    pairs = a.join(b, "pair_id")
    cos_e = sim.cosine(sim.as_double(F.col("ea")), sim.as_double(F.col("eb")))
    cos_q = sim.quantized_cosine(F.col("qa"), F.col("qb"))
    return pairs.select(
        "pair_id",
        F.round(cos_e, 6).alias("cos_exact"),
        F.round(cos_q, 6).alias("cos_int8"),
        F.round(F.abs(cos_e - cos_q), 4).alias("abs_err4"),
    ).orderBy("pair_id")


# ---------------------------------------------------------------------------
# q157: character-budget source balancing (equalize corpus share by chars)
# ---------------------------------------------------------------------------

_Q157_SALT = "bal1"


@query(
    "q157_mixture_balance",
    oracle=f"""
    WITH s AS (SELECT source, sum(n_chars) AS src_chars FROM documents GROUP BY source),
    r AS (SELECT source,
                 CAST((SELECT min(src_chars) FROM s) AS DOUBLE) / CAST(src_chars AS DOUBLE) AS rate
          FROM s),
    h AS (SELECT d.source, d.doc_id, d.n_chars, r.rate,
                 ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '{_Q157_SALT}'), 1, 8))::UBIGINT
                   / 4294967296.0 AS u
          FROM documents d JOIN r USING (source))
    SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS chars_kept
    FROM h WHERE u < rate GROUP BY source ORDER BY source
    """,
)
def q157_mixture_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-budget source balancing: compute each source's share of the
    corpus in characters, derive a per-source keep-rate that downsamples
    every source to the smallest source's character budget, and apply it
    with the same deterministic md5(doc_id) coin as hash_sample — so the
    balanced mixture is reproducible across runs, engines and incremental
    reprocessing.  The rate table is #sources rows (aggregate -> broadcast
    both ways); the corpus itself is touched by one codegen'd filter, no
    extra shuffle."""
    d = table(spark, sf_dir, "documents")
    stats = d.groupBy("source").agg(F.sum("n_chars").alias("src_chars"))
    m = stats.agg(F.min("src_chars").alias("min_chars"))
    rates = stats.crossJoin(F.broadcast(m)).select(
        "source", (F.col("min_chars") / F.col("src_chars")).alias("rate")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_Q157_SALT))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        / F.lit(float(1 << 32))
    )
    kept = d.join(F.broadcast(rates), "source").filter(u < F.col("rate"))
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q158: token-budget corpus selection (greedy by priority, distributed cumsum)
# ---------------------------------------------------------------------------

_Q158_BUDGET = 20_000


@query(
    "q158_budget_select",
    oracle=f"""
    WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
                      (500000 - n_chars) * 10000000 + doc_id AS ord
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 CAST(sum(n_tokens) OVER (ORDER BY ord
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_tokens
          FROM t)
    SELECT doc_id, n_tokens, cum_tokens FROM c
    WHERE cum_tokens <= {_Q158_BUDGET} ORDER BY doc_id
    """,
)
def q158_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus selection: rank documents by a priority key
    (longest-first, doc_id tie-break), take the prefix whose running token
    total fits a 20k-token budget — the 'fill the training budget with the
    best data' step of corpus curation.  The running total is
    operators/training.global_cumsum (range-partitioned two-phase prefix
    sum), NOT a single-partition window — the oracle's `sum() OVER (ORDER
    BY)` is exactly the plan the operator refuses (same guarantee as
    q125_pack_sequences, plan-pinned there)."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        ((F.lit(500000) - F.col("n_chars")) * F.lit(10000000) + F.col("doc_id")).alias(
            "__ord"
        ),
    )
    c = tr.global_cumsum(d, "__ord", "n_tokens", out_col="cum_tokens")
    return (
        c.filter(F.col("cum_tokens") <= _Q158_BUDGET)
        .select("doc_id", "n_tokens", "cum_tokens")
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q180: deterministic per-epoch training shuffle
# ---------------------------------------------------------------------------


@query(
    "q180_epoch_shuffle",
    oracle="""
    WITH e1 AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '|shuffle|1') AS k
                FROM documents),
    e2 AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || '|shuffle|2') AS k
           FROM documents),
    r1 AS (SELECT doc_id, row_number() OVER (ORDER BY k) AS pos1 FROM e1),
    r2 AS (SELECT doc_id, row_number() OVER (ORDER BY k) AS pos2 FROM e2)
    SELECT r1.doc_id, pos1, pos2 FROM r1 JOIN r2 USING (doc_id)
    WHERE pos1 <= 20 OR pos2 <= 20
    ORDER BY doc_id
    """,
)
def q180_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training shuffle (operators/training.
    epoch_shuffle_order): document order = sort by md5(id|salt|epoch) —
    different every epoch, bit-identical for the same epoch across runs/
    engines/cluster sizes, no rand() retry hazard.  The query shows two
    epochs producing different (but each reproducible) orders.  The global
    positions come from the two-phase distributed rank
    (training.global_row_number — repartitionByRange + per-partition
    window + O(partitions) offsets), NOT a corpus-wide single-partition
    window: the epoch-order materialization is itself the at-scale write
    path (plan-linted by tools/plan_lint.py)."""
    d = table(spark, sf_dir, "documents")

    e1 = tr.global_row_number(
        tr.epoch_shuffle_order(d, "doc_id", 1).select("doc_id", "shuffle_key"),
        ["shuffle_key"],
        out_col="pos1",
    ).select("doc_id", "pos1")
    e2 = tr.global_row_number(
        tr.epoch_shuffle_order(d, "doc_id", 2).select("doc_id", "shuffle_key"),
        ["shuffle_key"],
        out_col="pos2",
    ).select("doc_id", "pos2")
    return (
        e1.join(e2, "doc_id")
        .filter((F.col("pos1") <= 20) | (F.col("pos2") <= 20))
        .orderBy("doc_id")
    )
