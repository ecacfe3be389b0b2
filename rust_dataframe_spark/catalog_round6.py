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
           floor((12.0 / (CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) + 1.0))
                  * sum_r2n - 3.0 * (CAST(nt AS DOUBLE) + 1.0))
                 / (1.0 - tie_term
                    / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)
                       * CAST(nt AS DOUBLE) - CAST(nt AS DOUBLE)))
                 * 1e6) / 1e6 AS h_corrected,
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
