"""Catalog round 6: real JPEG decode, filtered ANN, schema evolution.

Continues the multimodal real-decode program (q327 PNG / q333 WAV / q334
GIF) with baseline JPEG (operators/jpeg.py — the last image container
that was fake-decoded), adds the metadata-filtered vector-search shape
(predicate + IVF probe with a measured recall certificate, the q329
discipline), and models schema drift across parquet vintages (mergeSchema
read + an explicit audited migration).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import query, table

__all__: list[str] = []


# ---------------------------------------------------------------------------
# q387: real JPEG round-trip with closed-form pixel checksum
# ---------------------------------------------------------------------------


@query(
    "q387_jpeg_decode",
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
def q387_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG decode, driver-checkable (operators/jpeg.py — round 6's
    pure-stdlib baseline codec: marker parse, canonical Huffman entropy
    decode, dequant, 8x8 IDCT): each doc synthesizes a BLOCK-CONSTANT
    grayscale image (block (bx, by) holds (doc_id + 17bx + 29by) % 256),
    encodes it with the all-ones quant table, decodes the real
    entropy-coded bytes back, and reports the decoded pixel checksum —
    which for block-constant content is EXACTLY the closed form the
    DuckDB oracle computes, because a constant block survives
    FDCT -> quantize -> Huffman -> IDCT bit-exactly (DC-only; AC residues
    ~1e-13 quantize to zero — see the jpeg.py module docstring).  Lossy
    general content and the 4:2:0/RGB paths are tolerance-pinned in
    tests/test_llm_ops.py::TestJpegReal.  All work is Arrow-batched
    mapInPandas on executors; the driver never sees image bytes."""
    docs = table(spark, sf_dir, "documents").select("doc_id").filter(
        F.col("doc_id") < 200
    )

    def gen_and_decode(batches):
        import pandas as pd

        from rust_dataframe_spark.operators.jpeg import decode_jpeg, encode_jpeg

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
                ww, hh, _ch, out = decode_jpeg(encode_jpeg(w, h, px, channels=1))
                rows["doc_id"].append(d)
                rows["width"].append(ww)
                rows["height"].append(hh)
                rows["px_sum"].append(sum(out))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        gen_and_decode, "doc_id bigint, width int, height int, px_sum bigint"
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q388: metadata-filtered IVF ANN with measured filtered-recall certificate
# ---------------------------------------------------------------------------


@query(
    "q388_filtered_ann",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    c AS (SELECT vec_id AS cid,
                 list_transform(emb, x -> x / sqrt(list_dot_product(emb, emb))) AS cvn
          FROM e WHERE vec_id < 8),
    q AS (SELECT vec_id AS query_id, emb AS qv FROM e
          WHERE vec_id BETWEEN 100 AND 105),
    f AS (SELECT vec_id, emb FROM e WHERE label = 1),
    sims AS (SELECT f.vec_id, c.cid, f.emb,
                    row_number() OVER (PARTITION BY f.vec_id ORDER BY
                        list_dot_product(emb, cvn) DESC, c.cid ASC) AS rn
             FROM f CROSS JOIN c),
    assign AS (SELECT vec_id, cid AS cell, emb FROM sims WHERE rn = 1),
    pr AS (SELECT q.query_id, q.qv, c.cid,
                  row_number() OVER (PARTITION BY q.query_id ORDER BY
                      round(list_dot_product(qv, cvn)
                            / sqrt(list_dot_product(qv, qv)), 6) DESC,
                      c.cid ASC) AS rn
           FROM q CROSS JOIN c),
    probe AS (SELECT query_id, qv, cid AS cell FROM pr WHERE rn <= 2),
    ah AS (SELECT p.query_id, a.vec_id,
                  round(list_dot_product(a.emb, p.qv)
                        / (sqrt(list_dot_product(a.emb, a.emb))
                           * sqrt(list_dot_product(p.qv, p.qv))), 6) AS cs
           FROM probe p JOIN assign a ON a.cell = p.cell
           WHERE a.vec_id <> p.query_id),
    atop AS (SELECT query_id, vec_id FROM (
               SELECT query_id, vec_id,
                      row_number() OVER (PARTITION BY query_id
                          ORDER BY cs DESC, vec_id) AS rk
               FROM ah) WHERE rk <= 10),
    eh AS (SELECT q.query_id, f.vec_id,
                  round(list_dot_product(f.emb, q.qv)
                        / (sqrt(list_dot_product(f.emb, f.emb))
                           * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cs
           FROM q CROSS JOIN f WHERE f.vec_id <> q.query_id),
    etop AS (SELECT query_id, vec_id FROM (
               SELECT query_id, vec_id,
                      row_number() OVER (PARTITION BY query_id
                          ORDER BY cs DESC, vec_id) AS rk
               FROM eh) WHERE rk <= 10)
    SELECT etop.query_id,
           CAST(sum((a.vec_id IS NOT NULL)::INT) AS INT) AS n_hits,
           round(sum((a.vec_id IS NOT NULL)::INT) / 10.0, 6) AS recall_at_k
    FROM etop LEFT JOIN atop a
      ON a.query_id = etop.query_id AND a.vec_id = etop.vec_id
    GROUP BY etop.query_id ORDER BY etop.query_id
    """,
)
def q388_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED vector search with its measured quality — the
    production retrieval shape "top-k similar WHERE label = 1"
    (operators/similarity.ivf_filtered_batch_topk): PRE-FILTER semantics
    (the predicate restricts the corpus before cell assignment and the
    probe join, so k is filled with qualifying neighbors — post-filtering
    an unfiltered top-k under-fills whenever the filter is selective),
    with the filter pushed into the parquet scan BELOW the candidate
    join (plan-pinned in tests/test_plans.py).  The certificate is
    recall@10 against the exact FILTERED kNN (knn_join on the same
    filtered corpus) per query — q329's discipline extended to the
    filtered case, where fixed-nprobe recall genuinely degrades with
    selectivity (the auto_widen compensation is unit-tested).  Oracle
    replays assignment, probing, both filtered top-10s, and the recall
    join."""
    from .operators import similarity as sim

    e = table(spark, sf_dir, "embeddings")
    cent_rows = e.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    centroids = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in cent_rows
    ]
    queries = e.filter(F.col("vec_id").between(100, 105))
    approx = sim.ivf_filtered_batch_topk(
        queries,
        e,
        "vec_id",
        "embedding",
        centroids,
        predicate=F.col("label") == 1,
        nprobe=2,
        k=10,
    )
    exact = sim.knn_join(
        queries, e.filter(F.col("label") == 1), "vec_id", "embedding", 10
    )
    return sim.ann_recall(approx, exact, 10).orderBy("query_id")


# ---------------------------------------------------------------------------
# q389: schema-evolution ingestion across parquet vintages (audited migration)
# ---------------------------------------------------------------------------


@query(
    "q389_schema_evolution",
    oracle="""
    WITH n1 AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 2 = 0),
    n2 AS (SELECT count(*) AS n FROM orders WHERE o_orderkey % 2 = 1),
    pub AS (SELECT count(*) AS n_published,
                   sum(o_orderkey * 3 + o_custkey) AS key_checksum,
                   (SELECT n FROM n1) AS n_unknown_priority
            FROM orders),
    a AS (
      SELECT * FROM (VALUES
        ('v1', 'cust_key',     'rename',      'o_custkey'),
        ('v1', 'o_orderkey',   'widen',       'int->bigint'),
        ('v1', 'o_totalprice', 'widen',       'float->double'),
        ('v1', 'priority',     'backfill',    '''UNKNOWN'''),
        ('v2', '*',            'passthrough', '')
      ) AS t(vintage, col, action, detail)
    )
    SELECT a.vintage, a.col AS "column", a.action, a.detail,
           CAST(CASE WHEN a.vintage = 'v1' THEN (SELECT n FROM n1)
                     ELSE (SELECT n FROM n2) END AS BIGINT) AS n_affected,
           CAST(pub.n_published AS BIGINT) AS n_published,
           CAST(pub.key_checksum AS BIGINT) AS key_checksum,
           CAST(pub.n_unknown_priority AS BIGINT) AS n_unknown_priority
    FROM a CROSS JOIN pub
    ORDER BY vintage, "column", action
    """,
)
def q389_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift ingestion (operators/evolution.py): the table directory
    holds TWO real parquet vintages of orders — v1 predates the rename
    (``cust_key``), carries narrowed types (int orderkey, float price),
    and lacks the ``priority`` column; v2 is current.  ``mergeSchema``
    cannot read this (conflicting primitive types fail with
    CANNOT_MERGE_SCHEMAS — only added columns merge), so ``read_evolved``
    migrates each vintage to the target schema (rename + cast-widen +
    literal backfill, all pure codegen projections) and unions by name,
    emitting an AUDIT row per action with affected counts.  The unified
    frame is then WAP-published (q304's staging->audit->promote) and the
    published files re-read for the totals attached to every audit row:
    row count, an exact integer key checksum, and the backfilled-priority
    count (= |v1|, proving the default landed in the published bytes).
    Oracle replays the vintage split, the audit table, and the published
    totals straight from orders."""
    import os
    import shutil

    from .catalog_sources import _scratch
    from .operators.evolution import read_evolved

    o = table(spark, sf_dir, "orders")
    base = _scratch("schema_evo", sf_dir)
    if os.path.exists(base):
        shutil.rmtree(base)
    v1 = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").cast("int").alias("o_orderkey"),
        F.col("o_custkey").alias("cust_key"),
        F.col("o_totalprice").cast("float").alias("o_totalprice"),
    )
    v2 = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.col("o_orderpriority").alias("priority"),
    )
    v1.write.parquet(f"{base}/v1")
    v2.write.parquet(f"{base}/v2")

    target = {
        "o_orderkey": "bigint",
        "o_custkey": "bigint",
        "o_totalprice": "double",
        "priority": "string",
    }
    unified, audit = read_evolved(
        spark,
        {"v1": f"{base}/v1", "v2": f"{base}/v2"},
        target,
        renames={"v1": {"cust_key": "o_custkey"}},
        backfills={"priority": "UNKNOWN"},
    )
    # WAP gate (q304's pattern): no null keys may reach the live path
    staging, live = f"{base}/staging", f"{base}/live"
    unified.write.parquet(staging)
    staged = spark.read.parquet(staging)
    bad = staged.filter(
        F.col("o_custkey").isNull() | F.col("priority").isNull()
    ).count()
    if bad == 0:
        os.replace(staging, live)
    pub = (
        spark.read.parquet(live)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_published"),
            F.sum(F.col("o_orderkey") * 3 + F.col("o_custkey"))
            .cast("bigint")
            .alias("key_checksum"),
            F.sum((F.col("priority") == "UNKNOWN").cast("bigint"))
            .cast("bigint")
            .alias("n_unknown_priority"),
        )
    )
    return audit.crossJoin(F.broadcast(pub)).orderBy(
        "vintage", "column", "action"
    )


# ---------------------------------------------------------------------------
# q390: Spearman rank correlation (exact integer double-ranks)
# ---------------------------------------------------------------------------

_CENTS_Q = "CAST(round(l_quantity * 100, 0) AS BIGINT)"
_CENTS_P = "CAST(round(l_extendedprice * 100, 0) AS BIGINT)"


@query(
    "q390_spearman",
    oracle=f"""
    WITH rows_ AS (
      SELECT {_CENTS_Q} AS vx, {_CENTS_P} AS vy FROM lineitem
    ),
    px AS (SELECT vx, CAST(count(*) AS BIGINT) AS cnt FROM rows_ GROUP BY 1),
    rx AS (SELECT vx,
                  CAST(2 * (sum(cnt) OVER (ORDER BY vx) - cnt) + cnt + 1
                       AS BIGINT) AS rxr
           FROM px),
    py AS (SELECT vy, CAST(count(*) AS BIGINT) AS cnt FROM rows_ GROUP BY 1),
    ry AS (SELECT vy,
                  CAST(2 * (sum(cnt) OVER (ORDER BY vy) - cnt) + cnt + 1
                       AS BIGINT) AS ryr
           FROM py),
    j AS (SELECT rxr, ryr FROM rows_ JOIN rx USING (vx) JOIN ry USING (vy)),
    s AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(rxr) AS BIGINT) AS sx,
                 CAST(sum(ryr) AS BIGINT) AS sy,
                 CAST(sum(rxr * rxr) AS BIGINT) AS sxx,
                 CAST(sum(ryr * ryr) AS BIGINT) AS syy,
                 CAST(sum(rxr * ryr) AS BIGINT) AS sxy
          FROM j)
    SELECT n,
           floor((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
                 * 1e6) / 1e6 AS rho
    FROM s
    """,
)
def q390_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation of lineitem quantity vs extended price —
    the monotone-association readout robust to the price distribution's
    shape (Pearson answers "linear?", Spearman answers "monotone?", the
    right question for skewed commerce metrics).
    operators/hypothesis.spearman_rho: mid-ranks per DISTINCT cents value
    carried as integer DOUBLE-RANKS so all five accumulations are exact
    int64 (no float-lattice ceiling at sf0.1 — the 0.5-lattice double
    approach stops being order-independent past ~10^6 rank-squared
    products); prefix counts ride training.global_cumsum, rows join their
    ranks back by value on distinct-axis-sized sides.  One float dag at
    the end.  Scale: rank tables are distinct-value sized; sums promote
    to decimal(38,0) past ~10^6 rows per the docstring."""
    from .operators.hypothesis import spearman_rho

    li = table(spark, sf_dir, "lineitem")
    return spearman_rho(li, "l_quantity", "l_extendedprice")


# ---------------------------------------------------------------------------
# q391: Kruskal-Wallis H (k-group rank test)
# ---------------------------------------------------------------------------

_CENTS_V = "CAST(round(value * 100, 0) AS BIGINT)"


@query(
    "q391_kruskal_wallis",
    oracle=f"""
    WITH gv AS (
      SELECT event_type AS grp, {_CENTS_V} AS v,
             CAST(count(*) AS BIGINT) AS cnt_gv
      FROM events GROUP BY 1, 2
    ),
    per AS (SELECT v, CAST(sum(cnt_gv) AS BIGINT) AS cnt FROM gv GROUP BY 1),
    ranked AS (
      SELECT v, cnt,
             CAST(2 * (sum(cnt) OVER (ORDER BY v) - cnt) + cnt + 1
                  AS BIGINT) AS r2
      FROM per
    ),
    g AS (
      SELECT grp, CAST(sum(cnt_gv) AS BIGINT) AS n_g,
             CAST(sum(cnt_gv * r2) AS BIGINT) AS r2_g
      FROM gv JOIN ranked USING (v) GROUP BY grp
    ),
    tot AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS nt,
             CAST(count(*) AS BIGINT) AS k,
             list_reduce(
               list_prepend(CAST(0 AS DOUBLE),
                 list((r2_g / 2.0) * (r2_g / 2.0) / n_g ORDER BY grp)),
               (x, y) -> x + y) AS sum_r2n
      FROM g
    ),
    ties AS (
      SELECT sum(CAST(cnt AS DOUBLE) * cnt * cnt - CAST(cnt AS DOUBLE))
               AS tie_term
      FROM ranked
    )
    SELECT grp, n_g AS n,
           r2_g / 2.0 AS rank_sum,
           floor(r2_g / 2.0 / n_g * 1e6) / 1e6 AS mean_rank,
           floor((12.0 / (CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) + 1.0))
                  * sum_r2n - 3.0 * (CAST(nt AS DOUBLE) + 1.0)) * 1e6) / 1e6
             AS h_stat,
           CASE WHEN 1.0 - tie_term
                       / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
                          * CAST(nt AS DOUBLE) - CAST(nt AS DOUBLE)) <> 0.0
                THEN floor((12.0 / (CAST(nt AS DOUBLE)
                                    * (CAST(nt AS DOUBLE) + 1.0))
                            * sum_r2n - 3.0 * (CAST(nt AS DOUBLE) + 1.0))
                           / (1.0 - tie_term
                              / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
                                 * CAST(nt AS DOUBLE) - CAST(nt AS DOUBLE)))
                           * 1e6) / 1e6
           END AS h_corrected,
           CAST(k - 1 AS BIGINT) AS dof
    FROM g CROSS JOIN tot CROSS JOIN ties ORDER BY grp
    """,
)
def q391_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across event types — "does ANY event type's value
    distribution sit higher?", the k-group rank test completing the
    battery between Mann-Whitney (q366, k=2) and one-way ANOVA (q365,
    which assumes finite-variance normality these engagement values
    don't have).  operators/hypothesis.kruskal_wallis: integer
    double-ranks (exact int64 rank sums, no float-lattice ceiling),
    prefix counts on training.global_cumsum, tie-corrected H with the
    R_g^2/n_g fold over the SORTED bounded group axis.  Scale: one scan
    to the (group, value) axis; rank table distinct-value sized."""
    from .catalog import load_events
    from .operators.hypothesis import kruskal_wallis

    ev = load_events(spark, sf_dir)
    return kruskal_wallis(ev, "event_type", "value").orderBy("grp")


# ---------------------------------------------------------------------------
# q392: Unigram-LM EM M-step (renormalized next-round piece probabilities)
# ---------------------------------------------------------------------------


def _q392_oracle() -> str:
    from .catalog_llm import _Q336_WEIGHTS

    vals = ", ".join(
        f"('{p}', {int(w)})" for p, w in sorted(_Q336_WEIGHTS.items())
    )
    return f"""
    WITH RECURSIVE
    vocab(p, wt) AS (SELECT * FROM (VALUES {vals})),
    words AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    freq AS (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM words GROUP BY w),
    dw AS (SELECT DISTINCT w FROM words),
    dwp AS (SELECT w, unnest(range(1, length(w) + 1)) AS cpos FROM dw),
    edges AS (
      SELECT d.w, d.cpos, v.p AS piece, length(v.p) AS adv, v.wt
      FROM dwp d JOIN vocab v ON substr(d.w, d.cpos, length(v.p)) = v.p),
    walk(w, cpos, toks, wt) AS (
      SELECT w, 1, []::VARCHAR[], 1 FROM dw
      UNION ALL
      SELECT walk.w, walk.cpos + e.adv, list_append(walk.toks, e.piece),
             walk.wt * e.wt
      FROM walk JOIN edges e ON e.w = walk.w AND e.cpos = walk.cpos
      WHERE walk.cpos <= length(walk.w)),
    done AS (SELECT w, toks, wt FROM walk WHERE cpos = length(w) + 1),
    z AS (SELECT w, CAST(sum(wt) AS BIGINT) AS z FROM done GROUP BY w),
    occ AS (SELECT w, unnest(toks) AS piece, wt FROM done),
    enum AS (SELECT w, piece, CAST(sum(wt) AS BIGINT) AS e_num
             FROM occ GROUP BY w, piece),
    contrib AS (
      SELECT e.piece, e.w AS word,
             CAST(e.e_num AS DOUBLE) / CAST(z.z AS DOUBLE) * f.freq AS c
      FROM enum e JOIN z ON z.w = e.w JOIN freq f ON f.w = e.w),
    per_piece AS (
      SELECT piece,
             list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list(c ORDER BY word)),
                         (a, b) -> a + b) AS te
      FROM contrib GROUP BY piece),
    tot AS (
      SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
                                      list(te ORDER BY piece)),
                         (a, b) -> a + b) AS gt
      FROM per_piece)
    SELECT piece,
           floor(te * 1e6) / 1e6 AS total_expected,
           floor(te / gt * 1e6) / 1e6 AS new_prob
    FROM per_piece CROSS JOIN tot ORDER BY piece
    """


@query("q392_unigram_m_step", oracle=_q392_oracle())
def q392_unigram_m_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EM M-step for Unigram-LM (SentencePiece-style) tokenizer training
    (operators/text.unigram_m_step) — completes the training round q336's
    E-step started: corpus-weighted expected piece counts renormalize
    into the next round's piece probabilities.  Each word's
    expected_count is one exact int64/int64 division (the q336 regime);
    the two genuinely-float accumulations (per-piece over words, grand
    total over pieces) run as ORDERED folds, so the exact-hash gate
    holds end to end.  EM monotonicity (corpus likelihood non-decreasing
    under the renormalized probs) is pinned against an independent
    pure-python EM replay in tests.  Scale: one distinct-word lattice DP
    (Heaps-bounded) + vocabulary-axis algebra — a full EM round on
    100 TB is one corpus scan per iteration."""
    from .catalog_llm import _Q336_WEIGHTS
    from .operators import text as tx

    d = table(spark, sf_dir, "documents")
    expected = tx.unigram_expected_counts(d, "doc_id", "text", _Q336_WEIGHTS)
    return tx.unigram_m_step(expected)


# ---------------------------------------------------------------------------
# q393: Fleiss' kappa across three deterministic raters
# ---------------------------------------------------------------------------

_ROTATE = (
    "CASE {g} WHEN 'de' THEN 'en' WHEN 'en' THEN 'es' WHEN 'es' THEN 'fr' "
    "WHEN 'fr' THEN 'zh' ELSE 'de' END"
)


@query(
    "q393_fleiss_kappa",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, list_distinct(string_split(text, ' ')) AS uw
      FROM documents
    ), s AS (
      SELECT doc_id, lang,
        len(list_filter(uw, x -> list_contains(['the','a','of','and','to','in','is','it','for','on'], x))) AS s_en,
        len(list_filter(uw, x -> list_contains(['der','die','das','und','ist','von','zu','mit','den','ein'], x))) AS s_de,
        len(list_filter(uw, x -> list_contains(['le','la','les','de','et','un','une','est','pour','dans'], x))) AS s_fr,
        len(list_filter(uw, x -> list_contains(['el','la','los','de','y','un','una','es','para','en'], x))) AS s_es,
        len(list_filter(uw, x -> list_contains(['的','是','了','在','和','有','我','不','人','这'], x))) AS s_zh
      FROM t
    ), lid AS (
      SELECT doc_id,
             CASE WHEN s_zh = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'zh'
                  WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
                  WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
                  WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
                  ELSE 'de' END AS cat
      FROM s
    ), r3 AS (
      SELECT doc_id,
             CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#r3'), 32, 1)) AS UBIGINT) < 4
                  THEN {_ROTATE.format(g='lang')} ELSE lang END AS cat
      FROM documents
    ), assign AS (
      SELECT doc_id, lang AS cat FROM documents
      UNION ALL SELECT doc_id, cat FROM lid
      UNION ALL SELECT doc_id, cat FROM r3
    ), cell AS (
      SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS nij
      FROM assign GROUP BY 1, 2
    ), per_item AS (
      SELECT doc_id, CAST(sum(nij) AS BIGINT) AS n_r,
             CAST(sum(nij * nij) AS BIGINT) AS sq
      FROM cell GROUP BY 1
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(sq) AS BIGINT) AS sq_sum,
             CAST(sum(CASE WHEN n_r <> 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS bad_items
      FROM per_item
    ), cats AS (
      SELECT cat, CAST(sum(nij) AS BIGINT) AS c_j FROM cell GROUP BY 1
    ), pe AS (
      SELECT CAST(sum(c_j * c_j) AS BIGINT) AS c2_sum FROM cats
    )
    SELECT cat AS category, c_j AS n_assigned,
           floor(c_j / (CAST(n_items AS DOUBLE) * 3.0) * 1e6) / 1e6 AS p_cat,
           floor((CAST(sq_sum AS DOUBLE) - 3.0 * n_items)
                 / (3.0 * 2.0 * n_items) * 1e6) / 1e6 AS p_bar,
           floor(CAST(c2_sum AS DOUBLE)
                 / ((CAST(n_items AS DOUBLE) * 3.0)
                    * (CAST(n_items AS DOUBLE) * 3.0)) * 1e6) / 1e6 AS p_e,
           floor(((CAST(sq_sum AS DOUBLE) - 3.0 * n_items)
                  / (3.0 * 2.0 * n_items)
                  - CAST(c2_sum AS DOUBLE)
                    / ((CAST(n_items AS DOUBLE) * 3.0)
                       * (CAST(n_items AS DOUBLE) * 3.0)))
                 / (1.0 - CAST(c2_sum AS DOUBLE)
                    / ((CAST(n_items AS DOUBLE) * 3.0)
                       * (CAST(n_items AS DOUBLE) * 3.0))) * 1e6) / 1e6
             AS fleiss_kappa,
           n_items, bad_items
    FROM cats CROSS JOIN tot CROSS JOIN pe ORDER BY category
    """,
)
def q393_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa across THREE deterministic raters of document
    language — gold labels, the stopword-vote LID (q79/q386's
    classifier), and an md5-perturbed gold (25% of docs rotated to the
    next language, the reproducible stand-in for a noisy third
    annotator) — the multi-rater agreement readout an annotation
    pipeline checks before trusting majority-vote labels (Cohen's kappa
    only handles rater PAIRS).  operators/hypothesis.fleiss_kappa:
    per-item category counts, P_bar and P_e both on exact int64
    numerators (sum n_ij^2 and sum c_j^2 — no float fold anywhere), the
    kappa a fixed scalar dag.  The in-plan bad_items column certifies
    every item saw exactly 3 assignments.  Scale: one groupBy to
    (item, category) cells; item- and category-axis aggregates."""
    from .operators.hypothesis import fleiss_kappa
    from .operators import text as tx

    d = table(spark, sf_dir, "documents")
    gold = d.select("doc_id", F.col("lang").alias("cat"))
    lid = tx.language_id(d, "doc_id", "text").select(
        "doc_id", F.col("pred_lang").alias("cat")
    )
    coin = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("#r3"))), 32, 1
        ),
        16,
        10,
    ).cast("int")
    rot = (
        F.when(F.col("lang") == "de", "en")
        .when(F.col("lang") == "en", "es")
        .when(F.col("lang") == "es", "fr")
        .when(F.col("lang") == "fr", "zh")
        .otherwise("de")
    )
    r3 = d.select(
        "doc_id", F.when(coin < 4, rot).otherwise(F.col("lang")).alias("cat")
    )
    assign = gold.unionByName(lid).unionByName(r3)
    return fleiss_kappa(assign, "doc_id", "cat", 3)


# ---------------------------------------------------------------------------
# q394: O'Brien-Fleming group-sequential monitor (K=4 calendar looks)
# ---------------------------------------------------------------------------

_OBF_CUTS = ["2024-01-08", "2024-01-15", "2024-01-22", "2024-01-31"]


def _q394_oracle() -> str:
    look_rows = " UNION ALL ".join(
        f"SELECT {i + 1} AS look, DATE '{c}' AS cutoff"
        for i, c in enumerate(_OBF_CUTS)
    )
    return f"""
    WITH looks AS ({look_rows}),
    base AS (
      SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS arm,
             CAST(round(value * 100, 0) AS BIGINT) AS v,
             CAST(ts AS DATE) AS d
      FROM events
    ),
    g AS (
      /* LEFT JOIN the looks axis (round-6 ADVICE mirror): a look whose
         cutoff precedes all data still emits a row (all-zero counts) */
      SELECT l.look,
             CAST(count(base.d) AS BIGINT) AS nt,
             CAST(coalesce(sum(arm), 0) AS BIGINT) AS n1,
             CAST(coalesce(sum(CASE WHEN arm = 1 THEN v ELSE 0 END), 0)
                  AS BIGINT) AS s1,
             CAST(coalesce(sum(v), 0) AS BIGINT) AS st,
             CAST(coalesce(sum(v * v), 0) AS BIGINT) AS sst
      FROM looks l LEFT JOIN base ON base.d <= l.cutoff
      GROUP BY l.look
    ),
    zt AS (
      SELECT look, nt - n1 AS n0, n1, nt, s1, st,
             CAST(sst AS DOUBLE)
               - CASE WHEN n1 > 0
                      THEN CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1
                      ELSE 0 END
               - CASE WHEN nt - n1 > 0
                      THEN CAST(st - s1 AS DOUBLE) * CAST(st - s1 AS DOUBLE)
                           / (nt - n1)
                      ELSE 0 END AS varnum,
             2.024 * sqrt(4.0 / CAST(look AS DOUBLE)) AS boundary
      FROM g
    ),
    zt2 AS (
      /* degenerate-look guard mirror: z defined only with both arms
         populated, nt > 2, positive within-arm variance */
      SELECT look, n0, n1, boundary,
             n0 > 0 AND n1 > 0 AND nt > 2 AND varnum > 0 AS ok,
             CASE WHEN n0 > 0 AND n1 > 0 AND nt > 2 AND varnum > 0 THEN
               (CAST(s1 AS DOUBLE) / n1 - CAST(st - s1 AS DOUBLE) / n0)
               / (sqrt(varnum / (nt - 2)) * sqrt(1.0 / n0 + 1.0 / n1))
             END AS z
      FROM zt
    ),
    flagged AS (
      SELECT look, n0, n1,
             floor(z * 1e6) / 1e6 AS z_score,
             floor(boundary * 1e6) / 1e6 AS boundary,
             CASE WHEN ok THEN abs(z) >= boundary ELSE false END AS crossed
      FROM zt2
    ),
    fc AS (
      SELECT CAST(coalesce(min(CASE WHEN crossed THEN look END), 0) AS BIGINT)
               AS first_crossing
      FROM flagged
    )
    SELECT f.look,
           ['{_OBF_CUTS[0]}', '{_OBF_CUTS[1]}', '{_OBF_CUTS[2]}',
            '{_OBF_CUTS[3]}'][f.look] AS cutoff,
           CAST(f.n0 AS BIGINT) AS n0, f.n1, f.z_score, f.boundary,
           f.crossed, fc.first_crossing
    FROM flagged f CROSS JOIN fc ORDER BY f.look
    """


@query("q394_group_sequential_obf", oracle=_q394_oracle())
def q394_group_sequential_obf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O'Brien-Fleming group-sequential experiment monitor at K=4
    pre-registered weekly calendar looks — the alpha-spending companion
    of the SPRT monitor (q375): boundaries c_k = 2.024*sqrt(4/k) (the
    classic OBF 1979 two-sided alpha=0.05, K=4 constants: 4.048, 2.862,
    2.337, 2.024) are nearly uncrossable at week 1 and relax to ~z_0.975
    by the final look, so an experiment can stop early only for an
    overwhelming effect while preserving overall alpha.
    operators/hypothesis.group_sequential_obf: ONE corpus scan — each
    event explodes to the looks containing it (map-side combined into
    K x 2 groups), cumulative cent sums exact int64, per-look z the
    pooled-sd scalar dag.  Scale: shuffle payload is K x 2 groups, not
    rows x K."""
    from .catalog import load_events
    from .operators.hypothesis import group_sequential_obf

    ev = load_events(spark, sf_dir)
    return group_sequential_obf(
        ev, "user_id", "value", "ts", _OBF_CUTS, z_base=2.024
    )
