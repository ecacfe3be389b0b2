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
