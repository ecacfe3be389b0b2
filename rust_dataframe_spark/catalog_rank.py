"""Catalog extension (round 2): retrieval / selection / ops queries beyond
the reference's frame-verb surface —

* relevance ranking: tf-idf, BM25, posting lists, bigram lift
  (operators/ranking.py)
* link-graph authority: fixed-point PageRank (operators/graph.py) and the
  authority-weighted selection loop (q149)
* sampling: per-row weighted, fixed-size per-stratum (operators/training.py)
* events: hopping windows (q136)
* pipeline ops: canonical-survivor dedup decision (q138), data-quality
  audit (q145), snapshot diff / CDC (q146)
* Spark 4 SQL surface: WITH RECURSIVE (q147), SQL-defined UDFs (q148)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .catalog import load_events, query, table
from .operators import ranking as rk
from .operators import training as tr
from .operators.graph import pagerank

_BM25_TERMS = ["vector", "join", "stream"]


@query(
    "q133_tfidf",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    s AS (SELECT doc_id, term, tf, df,
                 tf * ((n - df + 0.5) / (df + 0.5)) AS score
          FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, term ASC) AS rn FROM s)
    SELECT doc_id, term, tf, df, score FROM r WHERE rn <= 3
    ORDER BY doc_id, term
    """,
)
def q133_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf-idf
    (operators/ranking.tfidf_top_terms).  The idf is the log-free Robertson
    ratio (N - df + 0.5)/(df + 0.5) — monotone-equivalent ranking, and every
    step is an exactly-rounded IEEE op so the scores are bit-equal across
    engines with no rounding.  Term counts combine map-side; the vocabulary
    join is AQE-broadcast at this size and a term-keyed shuffle at corpus
    scale; N rides along as a 1-row crossJoin."""
    d = table(spark, sf_dir, "documents")
    out = rk.tfidf_top_terms(d, "doc_id", "text", top_n=3)
    return out.orderBy("doc_id", "term")


def _q134_oracle() -> str:
    in_list = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    cases = " ".join(
        f"max(CASE WHEN term = '{t}' THEN s END) AS s{i},"
        for i, t in enumerate(_BM25_TERMS)
    ).rstrip(",")
    total = " + ".join(f"COALESCE(s{i}, 0.0)" for i in range(len(_BM25_TERMS)))
    return f"""
    WITH dl AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
    corpus AS (SELECT count(*) AS n, sum(dl) / count(*) AS avgdl FROM dl),
    toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN ({in_list}) GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    s AS (SELECT doc_id, term,
                 ((n - df + 0.5) / (df + 0.5))
                 * ((tf * CAST(2.2 AS DOUBLE))
                    / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))) AS s
          FROM tf JOIN dfreq USING (term) CROSS JOIN corpus JOIN dl USING (doc_id)),
    p AS (SELECT doc_id, {cases} FROM s GROUP BY doc_id)
    SELECT doc_id, {total} AS score FROM p ORDER BY doc_id
    """


@query("q134_bm25", oracle=_q134_oracle())
def q134_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance (operators/ranking.bm25_score, k1=1.2 b=0.75) of every
    document for the query {vector, join, stream}.  Tokens are filtered to
    the query terms BEFORE any shuffle (cost is O(matching tokens)); the
    per-term contributions are pivoted to columns and added in fixed
    left-to-right order because a shuffle-ordered float sum is not
    reproducible across engines or retries — the same determinism discipline
    as the fixed-point PageRank next door."""
    d = table(spark, sf_dir, "documents")
    out = rk.bm25_score(d, "doc_id", "text", _BM25_TERMS, k1=1.2, b=0.75)
    return out.orderBy("doc_id")


@query(
    "q135_pagerank",
    oracle="""
    WITH e AS (SELECT DISTINCT l_orderkey % 500 AS src, l_partkey % 500 AS dst
               FROM lineitem WHERE l_orderkey % 500 <> l_partkey % 500),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
    c1 AS (SELECT e.dst AS node, sum((85 * r0.r) // (100 * deg.outdeg)) AS s
           FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src GROUP BY e.dst),
    r1 AS (SELECT n.node, CAST(150000 + COALESCE(c1.s, 0) AS BIGINT) AS r
           FROM nodes n LEFT JOIN c1 USING (node)),
    c2 AS (SELECT e.dst AS node, sum((85 * r1.r) // (100 * deg.outdeg)) AS s
           FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src GROUP BY e.dst),
    r2 AS (SELECT n.node, CAST(150000 + COALESCE(c2.s, 0) AS BIGINT) AS r
           FROM nodes n LEFT JOIN c2 USING (node))
    SELECT node, r FROM r2 ORDER BY node
    """,
)
def q135_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank, 2 iterations, damping 0.85 (operators/
    graph.pagerank) over a deterministic order->part link graph (keys mod
    500).  Integer ranks make the iteration bit-reproducible under any
    partitioning/retry order — float PageRank isn't — so scores can feed
    deterministic sampling cutoffs.  Edges are degree-annotated and
    src-partitioned once (persisted); each round moves only the O(nodes)
    rank table.  The oracle unrolls both rounds as chained CTEs."""
    li = table(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            (F.col("l_orderkey") % 500).alias("src"),
            (F.col("l_partkey") % 500).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return pagerank(edges, "src", "dst", n_iter=2).orderBy("node")


@query(
    "q136_hopping_window",
    oracle="""
    WITH h AS (
      SELECT unnest([time_bucket(INTERVAL '15 minutes', ts),
                     time_bucket(INTERVAL '15 minutes', ts) - INTERVAL '15 minutes'])
                 AS win_start,
             event_type, value
      FROM events
    )
    SELECT win_start, event_type, count(*) AS n_events,
           round(sum(value), 4) AS value_sum
    FROM h GROUP BY 1, 2 ORDER BY win_start, event_type
    """,
)
def q136_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) event-time windows: 30-minute width, 15-minute
    slide, so every event lands in exactly 2 windows — q84's tumbling shape
    generalized.  F.window's generator replicates rows BEFORE the partial
    agg, so the shuffle carries (window, type) partial sums, never raw
    events; identical code runs on readStream + withWatermark.  The oracle
    expands membership with unnest of the two slide-aligned buckets."""
    e = load_events(spark, sf_dir)
    return (
        e.groupBy(F.window("ts", "30 minutes", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(F.col("w.start").alias("win_start"), "event_type", "n_events", "value_sum")
        .orderBy("win_start", "event_type")
    )


@query(
    "q137_weighted_sample",
    oracle="""
    WITH w AS (
      SELECT doc_id, source, n_chars,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'wsamp1'), 1, 8))::UBIGINT
                 AS hv,
             CAST(floor(least(greatest(n_chars / 300.0, 0.0), 1.0) * 4294967296.0)
                  AS BIGINT) AS cutoff
      FROM documents
    )
    SELECT source, count(*) AS n, min(doc_id) AS min_id, max(doc_id) AS max_id,
           sum(n_chars) AS chars
    FROM w WHERE hv < cutoff
    GROUP BY source ORDER BY source
    """,
)
def q137_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row importance sampling (operators/training.weighted_sample):
    keep probability proportional to document length (n_chars/300, capped
    at 1) — the continuous form of q124's per-stratum mixture, the shape
    quality-score- or PageRank-weighted selection takes.  Cutoff arithmetic
    is exact (power-of-two scaling + explicit floor, since DuckDB CAST
    rounds while Spark truncates); one codegen'd filter, no shuffle."""
    d = table(spark, sf_dir, "documents")
    kept = tr.weighted_sample(
        d, "doc_id", F.col("n_chars") / F.lit(300.0), salt="wsamp1"
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


from .catalog_llm import _CORPUS_NEAR, _Q93_ORACLE, _corpus_near  # noqa: E402
from .operators import dedup as dd  # noqa: E402

_Q138_ORACLE = _Q93_ORACLE.replace(
    "SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a ORDER BY doc_id",
    ", clus AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a),"
    + _CORPUS_NEAR.replace("corpus AS (", "corpus2 AS (")
    + """,
    allc AS (SELECT c.doc_id, COALESCE(cl.cluster_id, c.doc_id) AS cluster_id,
                    len(c.text) AS keeper_len
             FROM corpus2 c LEFT JOIN clus cl USING (doc_id)),
    r AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
                        ORDER BY keeper_len DESC, doc_id ASC) AS rn,
                 count(*) OVER (PARTITION BY cluster_id) AS n_members
          FROM allc)
    SELECT cluster_id, doc_id AS keeper_id, n_members, keeper_len
    FROM r WHERE rn = 1 ORDER BY cluster_id""",
)


@query("q138_canonical_docs", oracle=_Q138_ORACLE)
def q138_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup pipeline end-to-end: MinHash-LSH near-dup pairs (q72)
    -> connected components (q93) -> ONE canonical survivor per cluster
    (operators/dedup.keep_canonical), keeping the longest member
    (tie-break smallest id) — the decision step that actually shrinks the
    corpus.  Docs outside any pair are their own singleton clusters via a
    left join (clusters side is tiny — broadcast); the winner pick is one
    cluster-keyed window."""
    corpus = _corpus_near(spark, sf_dir)
    pairs = dd.near_dup_pairs(
        corpus, "doc_id", "text", shingle_n=3, num_hashes=16, bands=4, threshold=0.8
    )
    clusters = dd.dup_clusters(pairs)
    kept = dd.keep_canonical(
        corpus, clusters, "doc_id",
        [F.length("text").desc(), F.col("doc_id").asc()],
    )
    return kept.select(
        "cluster_id",
        F.col("doc_id").alias("keeper_id"),
        "n_members",
        F.length("text").alias("keeper_len"),
    ).orderBy("cluster_id")


@query(
    "q139_posting_lists",
    oracle="""
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents),
    d AS (SELECT DISTINCT doc_id, term FROM toks)
    SELECT term, count(*) AS df, list(doc_id ORDER BY doc_id) AS postings
    FROM d GROUP BY term ORDER BY term
    """,
)
def q139_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (operators/ranking.posting_lists): term ->
    sorted posting list + document frequency, the serving artifact behind
    q133/q134.  (doc, term) pairs dedupe in a map-side-combined aggregate;
    the per-term collect is df-bounded (stopword sharding documented in the
    operator for web-scale lists)."""
    d = table(spark, sf_dir, "documents")
    return rk.posting_lists(d, "doc_id", "text").orderBy("term")


@query(
    "q140_bigram_lift",
    oracle="""
    WITH w AS (SELECT string_split(text, ' ') AS words FROM documents),
    g0 AS (SELECT words, unnest(range(1, greatest(len(words), 1))) AS i FROM w),
    g AS (SELECT words[i] AS w1, words[i+1] AS w2 FROM g0),
    nxy AS (SELECT w1, w2, count(*) AS n_xy FROM g GROUP BY w1, w2),
    nx AS (SELECT w1, count(*) AS n_x FROM g GROUP BY w1),
    ny AS (SELECT w2, count(*) AS n_y FROM g GROUP BY w2),
    t AS (SELECT count(*) AS t FROM g)
    SELECT w1, w2, n_xy, (n_xy * t) / (n_x * n_y) AS lift
    FROM nxy JOIN nx USING (w1) JOIN ny USING (w2) CROSS JOIN t
    WHERE n_xy >= 10
    ORDER BY lift DESC, w1, w2 LIMIT 20
    """,
)
def q140_bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining (operators/ranking.bigram_lift): top-20 adjacent
    word pairs by lift = (n_xy * T)/(n_x * n_y) — PMI without the log, so
    the score is one integer-product division and bit-equal across engines.
    Bigram generation is generate-and-explode (narrow); margins join on
    single words (vocabulary-sized)."""
    d = table(spark, sf_dir, "documents")
    out = rk.bigram_lift(d, "doc_id", "text", min_count=10)
    return out.orderBy(F.col("lift").desc(), "w1", "w2").limit(20)


@query(
    "q141_take_per_stratum",
    oracle="""
    WITH h AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'tps1'), 1, 8))::UBIGINT
                 AS hv
      FROM documents
    ),
    r AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source ORDER BY hv ASC, doc_id ASC)
                     AS rn
          FROM h)
    SELECT source, doc_id FROM r WHERE rn <= 5 ORDER BY source, doc_id
    """,
)
def q141_take_per_stratum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-SIZE per-stratum sample (operators/training.take_per_stratum):
    exactly 5 docs per source, ranked by the md5 draw — the balanced
    eval-set builder complementing q124's fixed-rate mixture.  Membership
    is a pure function of (key, salt): stable across engines and reruns,
    bounded churn on incremental ingest.  One stratum-keyed window
    shuffle."""
    d = table(spark, sf_dir, "documents").select("doc_id", "source")
    out = tr.take_per_stratum(d, "doc_id", "source", 5, salt="tps1")
    return out.select("source", "doc_id").orderBy("source", "doc_id")


from .operators import observability as ob  # noqa: E402


@query(
    "q145_constraint_audit",
    oracle="""
    WITH w AS (
      SELECT count(*) AS n,
             sum(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END) AS p0,
             sum(CASE WHEN l_discount >= 0 AND l_discount <= 0.1 THEN 1 ELSE 0 END) AS p1,
             sum(CASE WHEN l_extendedprice IS NOT NULL THEN 1 ELSE 0 END) AS p2,
             sum(CASE WHEN l_shipdate >= TIMESTAMP '1992-01-01'
                      AND l_shipdate <= TIMESTAMP '1998-12-31' THEN 1 ELSE 0 END) AS p3
      FROM lineitem
    ),
    rules AS (
      SELECT 'qty_positive' AS rule, n AS n_rows, p0 AS n_pass, n - p0 AS n_fail FROM w
      UNION ALL SELECT 'discount_range', n, p1, n - p1 FROM w
      UNION ALL SELECT 'price_not_null', n, p2, n - p2 FROM w
      UNION ALL SELECT 'ship_in_range', n, p3, n - p3 FROM w
      UNION ALL
      SELECT 'fk_lineitem_orders', count(*), count(o.o_orderkey),
             count(*) - count(o.o_orderkey)
      FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        ON l.l_orderkey = o.o_orderkey
    )
    SELECT rule, n_rows, n_pass, n_fail FROM rules ORDER BY rule
    """,
)
def q145_constraint_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality audit (operators/observability.
    constraint_audit + referential_orphans — the Deequ/expectations shape):
    null/range/ordering rules compile into ONE global aggregate over one
    scan (adding a rule adds an expression, not a pass); the FK rule is a
    lazy left join on distinct parent keys; all rows union into one report
    plan.  The pre-publish gate a 100 TB pipeline runs on every batch."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    rows = ob.constraint_audit(
        li,
        {
            "qty_positive": F.col("l_quantity") > 0,
            "discount_range": (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1),
            "price_not_null": F.col("l_extendedprice").isNotNull(),
            "ship_in_range": (F.col("l_shipdate") >= F.lit("1992-01-01").cast("timestamp"))
            & (F.col("l_shipdate") <= F.lit("1998-12-31").cast("timestamp")),
        },
    )
    fk = ob.referential_orphans(li, o, "l_orderkey", "o_orderkey", rule="fk_lineitem_orders")
    return rows.unionByName(fk).orderBy("rule")


@query(
    "q146_snapshot_diff",
    oracle="""
    WITH o AS (SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
               WHERE o_orderkey < 1500),
    n AS (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10
                      ELSE o_totalprice END AS o_totalprice,
                 o_orderpriority
          FROM orders WHERE o_orderkey >= 500 AND o_orderkey < 2000),
    j AS (SELECT COALESCE(n.o_orderkey, o.o_orderkey) AS k,
                 CASE WHEN o.o_orderkey IS NULL THEN 'added'
                      WHEN n.o_orderkey IS NULL THEN 'removed'
                      WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice
                        OR o.o_orderpriority IS DISTINCT FROM n.o_orderpriority
                           THEN 'changed'
                      ELSE 'unchanged' END AS change_type
          FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey)
    SELECT change_type, count(*) AS n, min(k) AS min_key, max(k) AS max_key
    FROM j GROUP BY change_type ORDER BY change_type
    """,
)
def q146_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff / CDC extraction (operators/merge.snapshot_diff): two
    overlapping order snapshots — the new one shifted forward and with some
    prices touched — classified added/removed/changed/unchanged by one
    null-safe full-outer join on the key.  The output feeds merge_upsert
    (q108) as the delta; together they are the no-table-format CDC loop."""
    o = table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") < 1500).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    new = (
        o.filter((F.col("o_orderkey") >= 500) & (F.col("o_orderkey") < 2000))
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 10)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderpriority",
        )
    )
    from .operators.merge import snapshot_diff

    d = snapshot_diff(old, new, "o_orderkey")
    return (
        d.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("change_type")
    )


@query(
    "q147_recursive_cte",
    oracle="""
    WITH RECURSIVE w(node, cur, depth) AS (
      SELECT o_orderkey AS node, o_orderkey AS cur, 0 AS depth
      FROM orders WHERE o_orderkey > 0 AND o_orderkey < 1000
      UNION ALL
      SELECT node, cur // 2, depth + 1 FROM w WHERE cur > 1
    ),
    d AS (SELECT node, max(depth) AS depth FROM w GROUP BY node)
    SELECT depth, count(*) AS n, min(node) AS min_node, max(node) AS max_node
    FROM d GROUP BY depth ORDER BY depth
    """,
)
def q147_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL WITH RECURSIVE (new in Spark 4) — an ancestor walk up the
    implicit binary tree parent = node div 2, aggregated to nodes-per-depth.
    The declarative sibling of the operator-level iterations (dup_clusters,
    pagerank): same union-per-round execution underneath, with the engine
    managing the loop.  For unbounded production graphs the operator path
    with localCheckpoint stays the scale answer (lineage/round control);
    recursive SQL is the right tool for bounded-depth hierarchy queries
    (BOMs, org charts, folder trees).  Oracle runs the identical query with
    DuckDB's `//` integer-division spelling."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        WITH RECURSIVE w(node, cur, depth) AS (
          SELECT o_orderkey AS node, o_orderkey AS cur, 0 AS depth
          FROM orders WHERE o_orderkey > 0 AND o_orderkey < 1000
          UNION ALL
          SELECT node, cur div 2, depth + 1 FROM w WHERE cur > 1
        ),
        d AS (SELECT node, max(depth) AS depth FROM w GROUP BY node)
        SELECT depth, count(*) AS n, min(node) AS min_node, max(node) AS max_node
        FROM d GROUP BY depth ORDER BY depth
        """
    )


@query(
    "q148_sql_udf",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem WHERE l_quantity > 40
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q148_sql_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar UDF (new in Spark 4: CREATE FUNCTION ... RETURN
    <expr>) — the declarative end of the function registry
    (context.register_udf covers Python/Pandas; this one never leaves
    Catalyst: the body INLINES into the plan, so it codegens like any
    built-in, with zero serialization cost — always prefer it over a Python
    UDF when the logic is expressible).  The oracle inlines the same
    expression."""
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS line_revenue")
    spark.sql(
        "CREATE TEMPORARY FUNCTION line_revenue(price DOUBLE, disc DOUBLE) "
        "RETURNS DOUBLE RETURN price * (1 - disc)"
    )
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag,
               round(sum(line_revenue(l_extendedprice, l_discount)), 2) AS revenue,
               count(*) AS n
        FROM lineitem WHERE l_quantity > 40
        GROUP BY l_returnflag ORDER BY l_returnflag
        """
    )


@query(
    "q149_authority_weighted_sample",
    oracle="""
    WITH e AS (SELECT DISTINCT l_orderkey % 500 AS src, l_partkey % 500 AS dst
               FROM lineitem WHERE l_orderkey % 500 <> l_partkey % 500),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
    c1 AS (SELECT e.dst AS node, sum((85 * r0.r) // (100 * deg.outdeg)) AS s
           FROM e JOIN deg USING (src) JOIN r0 ON r0.node = e.src GROUP BY e.dst),
    r1 AS (SELECT n.node, CAST(150000 + COALESCE(c1.s, 0) AS BIGINT) AS r
           FROM nodes n LEFT JOIN c1 USING (node)),
    c2 AS (SELECT e.dst AS node, sum((85 * r1.r) // (100 * deg.outdeg)) AS s
           FROM e JOIN deg USING (src) JOIN r1 ON r1.node = e.src GROUP BY e.dst),
    r2 AS (SELECT n.node, CAST(150000 + COALESCE(c2.s, 0) AS BIGINT) AS r
           FROM nodes n LEFT JOIN c2 USING (node)),
    w AS (SELECT node, r,
                 ('0x' || substr(md5(CAST(node AS VARCHAR) || 'auth1'), 1, 8))::UBIGINT
                     AS hv,
                 CAST(floor(least(greatest(r / 2000000.0, 0.0), 1.0) * 4294967296.0)
                      AS BIGINT) AS cutoff
          FROM r2)
    SELECT count(*) AS n_kept, sum(r) AS rank_mass,
           min(node) AS min_node, max(node) AS max_node
    FROM w WHERE hv < cutoff
    """,
)
def q149_authority_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authority-weighted selection end-to-end: fixed-point PageRank (q135)
    -> rank/2e6 as keep probability -> md5 weighted_sample (q137) — the
    quality-weighted corpus subsetting loop, and the payoff of keeping BOTH
    stages bit-deterministic: integer ranks + exact cutoff arithmetic mean
    the kept set is reproducible across engines, partitionings, and
    retries, so downstream training data is stable by construction."""
    li = table(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            (F.col("l_orderkey") % 500).alias("src"),
            (F.col("l_partkey") % 500).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    ranks = pagerank(edges, "src", "dst", n_iter=2)
    kept = tr.weighted_sample(
        ranks, "node", F.col("r") / F.lit(2000000.0), salt="auth1"
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("r").cast("bigint").alias("rank_mass"),
        F.min("node").alias("min_node"),
        F.max("node").alias("max_node"),
    )


# ---------------------------------------------------------------------------
# Streaming queries, driver-visible: each runs a real availableNow
# Structured-Streaming query and STILL has a full SQL oracle — the streaming
# result must equal the batch answer exactly (availableNow batch parity).
# ---------------------------------------------------------------------------


def _stream_events(spark: SparkSession, sf_dir: str):
    """events.parquet is TIMESTAMP(NANOS), which streaming file sources
    reject — materialize a micros copy once per sf_dir and stream that."""
    import os

    from .catalog_sources import _scratch
    from .streaming import ops as st

    path = _scratch("stream_events", sf_dir)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        load_events(spark, sf_dir).write.mode("overwrite").parquet(path)
    schema = spark.read.parquet(path).schema
    return st.read_stream_parquet(spark, path, schema)


@query(
    "q151_stream_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 4) AS value_sum
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
)
def q151_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q84's tumbling windows executed as a REAL Structured Streaming query
    (readStream -> watermark -> windowed agg -> availableNow into a memory
    sink) and checked against the same SQL oracle — the batch-parity claim
    made driver-visible: identical declarative code, identical answer, on
    either runtime."""
    from .streaming import ops as st

    stream = _stream_events(spark, sf_dir)
    out = st.run_available_now(
        st.tumbling_counts(stream, window="1 hour", watermark="2 hours"),
        "q151_sink",
    )
    return out.select(
        "win_start",
        "event_type",
        "n_events",
        F.round(F.col("value_sum"), 4).alias("value_sum"),
    ).orderBy("win_start", "event_type")


@query(
    "q152_stream_sessionization",
    oracle="""
    WITH d AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    )
    SELECT user_id,
           CAST(sum(new_session) AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM d GROUP BY user_id ORDER BY user_id
    """,
)
def q152_stream_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q85's sessionization as a streaming session_window query (stateful,
    gap-merged in the state store, availableNow) — aggregated to per-user
    session/event counts and checked against the same gaps-and-islands SQL
    oracle.  Watermark bounds state; identical results to batch."""
    from .streaming import ops as st

    stream = _stream_events(spark, sf_dir)
    sessions = st.run_available_now(
        st.session_counts(stream, gap="30 minutes", watermark="2 hours"),
        "q152_sink",
    )
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "q153_stream_dedup",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, ts FROM events)
    SELECT count(*) AS n_rows,
           sum(user_id) AS user_sum,
           CAST(min(ts) AS VARCHAR) AS min_ts,
           CAST(max(ts) AS VARCHAR) AS max_ts
    FROM d
    """,
)
def q153_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (streaming/ops.stream_dedup,
    dropDuplicatesWithinWatermark on (user_id, ts)) — state holds one key
    per watermark horizon and evicts as it advances, the bounded-state
    answer to unbounded dropDuplicates.  availableNow output must equal
    batch DISTINCT (the oracle)."""
    from .streaming import ops as st

    stream = _stream_events(spark, sf_dir)
    out = st.run_available_now(
        st.stream_dedup(stream, id_cols=("user_id", "ts")),
        "q153_sink",
        output_mode="append",
    )
    return out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("user_id").cast("bigint").alias("user_sum"),
        F.min("ts").cast("string").alias("min_ts"),
        F.max("ts").cast("string").alias("max_ts"),
    )


@query(
    "q154_stream_interval_join",
    oracle="""
    SELECT count(*) AS n_pairs,
           CAST(sum(epoch_us(p.ts) - epoch_us(v.ts)) AS BIGINT) AS lag_us_sum,
           min(v.user_id) AS min_user,
           max(v.user_id) AS max_user
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL '30 minutes'
    """,
)
def q154_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (streaming/ops.interval_join) as the
    view->purchase attribution query: two streams over the same event log,
    dual watermarks, purchase within 30 minutes of the view.  The time
    bound is what lets the state store evict (without it, stream-stream
    join state grows forever).  availableNow result equals the batch theta
    join (the oracle) exactly."""
    from .streaming import ops as st

    views = _stream_events(spark, sf_dir).filter(
        F.col("event_type") == "view"
    ).select("user_id", "ts")
    buys = _stream_events(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts")
    joined = st.interval_join(
        views, buys, "user_id", watermark="2 hours", tolerance="30 minutes"
    )
    out = st.run_available_now(joined, "q154_sink", output_mode="append")
    return out.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.unix_micros(F.col("r_ts")) - F.unix_micros(F.col("l_ts")))
        .cast("bigint")
        .alias("lag_us_sum"),
        F.min("user_id").alias("min_user"),
        F.max("user_id").alias("max_user"),
    )


# ---------------------------------------------------------------------------
# Round 4: graph triangles, sweep-line concurrency, BPE pair statistics
# ---------------------------------------------------------------------------


@query(
    "q198_triangle_count",
    oracle="""
    WITH e AS (
      SELECT l1.l_partkey AS u, l2.l_partkey AS v
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey AND l1.l_partkey < l2.l_partkey
      GROUP BY u, v
      HAVING count(DISTINCT l1.l_orderkey) >= 2
    )
    SELECT count(*) AS n_triangles FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    """,
)
def q198_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the part co-purchase graph (parts co-occurring in
    >= 2 orders), via operators/graph.triangle_count — the degree-ordered
    node-iterator++ formulation.

    Scale: the support>=2 threshold is load-bearing — co-occurrence graphs
    densify superlinearly with corpus size, and real pipelines always
    count triangles on the support-thresholded graph.  Degree orientation
    bounds wedge fanout at O(sqrt(m)) per node (a hub of degree d yields
    oriented out-edges, not d² wedges), which is what makes the count
    survive skewed degree distributions; shuffle keys are the wedge pivot
    then the closing (lo, hi) edge.  The oracle replays the same count with
    id-ordered canonical edges — degree order changes the plan, not the
    answer.
    """
    from .operators.graph import cooccurrence_edges, triangle_count

    li = table(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_support=2)
    return triangle_count(edges)


@query(
    "q199_max_concurrency",
    oracle="""
    WITH iv AS (
      SELECT event_type, ts AS s,
             ts + CAST(round(value * 10) AS INT) * INTERVAL 1 SECOND AS e
      FROM events
    ),
    pts AS (
      SELECT event_type, s AS t, 1 AS delta FROM iv
      UNION ALL
      SELECT event_type, e AS t, -1 AS delta FROM iv
    ),
    run AS (
      SELECT event_type,
             sum(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                              ROWS UNBOUNDED PRECEDING) AS conc
      FROM pts
    )
    SELECT event_type, max(conc) AS max_concurrent
    FROM run GROUP BY event_type ORDER BY event_type
    """,
)
def q199_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per event type (sessions last 10×value
    seconds), via operators/temporal.max_concurrency — the sweep-line
    (+1/-1 prefix-sum) shape for interval-overlap analytics.

    Scale: runs the two-level bucketed sweep (bucket="day") — points sort
    within (group, day) partitions, then O(days) bucket summaries combine
    with the parallel-prefix identity (previous buckets' net delta + local
    max prefix).  Parallelism is groups × days, not groups: the naive
    single-partition-per-group sweep measured 3.4 s at 10×, this 1.9 s.
    Ties sort the -1 first so back-to-back sessions never double-count
    (half-open [s, e) semantics, identical ORDER BY (t, delta) on both
    engines — the oracle's single-level window is the same function).
    """
    from .operators.temporal import max_concurrency

    ev = load_events(spark, sf_dir)
    iv = ev.select(
        "event_type",
        F.col("ts").alias("s"),
        (F.col("ts") + F.make_interval(secs=F.round(F.col("value") * 10).cast("int"))).alias("e"),
    )
    return (
        max_concurrency(iv, "event_type", "s", "e", bucket="day")
        .select(F.col("g").alias("event_type"), "max_concurrent")
        .orderBy("event_type")
    )


@query(
    "q200_bpe_pair_counts",
    oracle="""
    WITH words AS (
      SELECT w, count(*) AS c FROM (
        SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
        FROM documents
      ) t WHERE length(w) >= 2 GROUP BY w
    ),
    pairs AS (
      SELECT substring(w, CAST(i AS INT), 2) AS pair, c
      FROM words, unnest(generate_series(1, length(w) - 1)) AS t(i)
    )
    SELECT pair, sum(c) AS cnt FROM pairs GROUP BY pair
    ORDER BY cnt DESC, pair LIMIT 50
    """,
)
def q200_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 adjacent-symbol pair frequencies — the counting step of BPE
    tokenizer training (operators/text.bpe_pair_counts).  q162 applies a
    finished subword vocab; this is the statistic the training loop merges
    on.

    Scale: the corpus collapses to DISTINCT (word, count) first (Heaps'-law
    bounded — the same reason wordpiece tokenization scales), then a
    codegen'd transform-over-sequence explodes each distinct word into its
    len-1 pairs; no Python, no per-occurrence shuffle.  Top-50 under a
    total order is TakeOrderedAndProject.
    """
    from .operators.text import bpe_pair_counts

    d = table(spark, sf_dir, "documents")
    return bpe_pair_counts(d, "text", top_k=50)


_Q201_SALT = "temp1"


@query(
    "q201_temperature_mixture",
    oracle=f"""
    WITH s AS (
      SELECT source, sum(CAST(n_chars AS DECIMAL(28,4))) AS mass FROM documents GROUP BY source
    ),
    ws AS (
      SELECT source, mass,
             CAST(round(sqrt(CAST(mass AS DOUBLE)), 6) AS DECIMAL(28,6)) AS w
      FROM s
    ),
    tot AS (SELECT sum(mass) AS total, sum(w) AS wsum FROM ws),
    r AS (
      SELECT source,
             least(1.0,
                   0.5 * CAST(total AS DOUBLE) * CAST(w AS DOUBLE)
                   / (CAST(wsum AS DOUBLE) * CAST(mass AS DOUBLE))) AS rate
      FROM ws CROSS JOIN tot
    ),
    h AS (
      SELECT d.source, d.n_chars, r.rate,
             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '{_Q201_SALT}'), 1, 8))::UBIGINT
               / 4294967296.0 AS u
      FROM documents d JOIN r USING (source)
    )
    SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS chars_kept
    FROM h WHERE u < rate GROUP BY source ORDER BY source
    """,
)
def q201_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based (alpha=0.5) mixture sampling at half the corpus
    character budget (operators/text.temperature_mixture): kept share per
    source follows sqrt(mass) — the standard multilingual tail-upweighting
    rule — with q157's deterministic md5 coin.  Rates derive from exact
    decimal mass/weight sums (see the operator's determinism note: a raw
    double weight sum would flip coin-boundary rows between engines).
    Shape: one #sources aggregate broadcast back; the corpus pays one
    codegen'd filter — no sample tables, no corpus shuffle."""
    from .operators.text import temperature_mixture

    d = table(spark, sf_dir, "documents")
    kept = temperature_mixture(
        d, "source", "n_chars", alpha=0.5, budget_frac=0.5,
        key_col="doc_id", salt=_Q201_SALT,
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("chars_kept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q343: label propagation communities (deterministic synchronous LPA)
# ---------------------------------------------------------------------------


@query(
    "q343_label_propagation",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it FROM lineitem),
    e AS (SELECT a.it AS u, c.it AS v
          FROM b a JOIN b c ON a.g = c.g AND a.it < c.it
          GROUP BY 1, 2 HAVING count(*) >= 2),
    sym AS (SELECT u AS s, v AS d FROM e UNION SELECT v AS s, u AS d FROM e),
    l0 AS (SELECT DISTINCT s AS node, s AS label FROM sym),
    c1 AS (SELECT y.s AS node, l.label, count(*) AS cnt
           FROM sym y JOIN l0 l ON l.node = y.d GROUP BY 1, 2),
    l1 AS (SELECT node, label FROM (
             SELECT node, label, row_number() OVER
                    (PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn
             FROM c1) WHERE rn = 1),
    c2 AS (SELECT y.s AS node, l.label, count(*) AS cnt
           FROM sym y JOIN l1 l ON l.node = y.d GROUP BY 1, 2),
    l2 AS (SELECT node, label FROM (
             SELECT node, label, row_number() OVER
                    (PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn
             FROM c2) WHERE rn = 1),
    c3 AS (SELECT y.s AS node, l.label, count(*) AS cnt
           FROM sym y JOIN l2 l ON l.node = y.d GROUP BY 1, 2),
    l3 AS (SELECT node, label FROM (
             SELECT node, label, row_number() OVER
                    (PARTITION BY node ORDER BY cnt DESC, label ASC) AS rn
             FROM c3) WHERE rn = 1)
    SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS community
    FROM l3 ORDER BY node
    """,
)
def q343_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous label propagation (operators/graph.
    label_propagation) over the part co-purchase graph — community
    detection between pairwise similarity and full connected components
    (dup_clusters ignores edge multiplicity; LPA follows the plurality).
    Graph: parts sharing an order, support >= 2 (cooccurrence_edges —
    the support threshold is the densification sparsifier).  3 fixed
    rounds, plurality with (count DESC, label ASC) total tie order, so
    the answer is a pure function of the graph: the oracle replays the
    identical three rounds as unrolled CTEs.  Scale: edges partitioned
    by src once and persisted; each round moves only the O(nodes) label
    table + a map-side-partial (node,label) count."""
    from .operators.graph import cooccurrence_edges, label_propagation

    li = table(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_support=2)
    labels = label_propagation(edges, "u", "v", rounds=3)
    return labels.select(
        F.col("node").cast("bigint").alias("node"),
        F.col("label").cast("bigint").alias("community"),
    ).orderBy("node")


# ---------------------------------------------------------------------------
# q344: multi-seed shortest paths (Bellman-Ford rounds, min-plus semiring)
# ---------------------------------------------------------------------------


@query(
    "q344_sssp",
    oracle="""
    WITH e0 AS (SELECT 'p' || CAST(l_partkey AS VARCHAR) AS s,
                       's' || CAST(l_suppkey AS VARCHAR) AS d,
                       min(l_extendedprice) AS w
                FROM lineitem GROUP BY 1, 2),
    sym AS (SELECT s, d, w FROM e0 UNION ALL SELECT d AS s, s AS d, w FROM e0),
    d0 AS (SELECT DISTINCT 's' || CAST(s_suppkey AS VARCHAR) AS node,
                  CAST(0.0 AS DOUBLE) AS dist
           FROM supplier WHERE s_suppkey % 29 = 1),
    r1 AS (SELECT node, min(dist) AS dist FROM (
             SELECT node, dist FROM d0
             UNION ALL
             SELECT e.d AS node, d0.dist + e.w AS dist
             FROM d0 JOIN sym e ON e.s = d0.node) GROUP BY 1),
    r2 AS (SELECT node, min(dist) AS dist FROM (
             SELECT node, dist FROM r1
             UNION ALL
             SELECT e.d AS node, r1.dist + e.w AS dist
             FROM r1 JOIN sym e ON e.s = r1.node) GROUP BY 1),
    r3 AS (SELECT node, min(dist) AS dist FROM (
             SELECT node, dist FROM r2
             UNION ALL
             SELECT e.d AS node, r2.dist + e.w AS dist
             FROM r2 JOIN sym e ON e.s = r2.node) GROUP BY 1),
    r4 AS (SELECT node, min(dist) AS dist FROM (
             SELECT node, dist FROM r3
             UNION ALL
             SELECT e.d AS node, r3.dist + e.w AS dist
             FROM r3 JOIN sym e ON e.s = r3.node) GROUP BY 1)
    SELECT node, floor(dist * 1000000) / 1000000 AS dist
    FROM r4 ORDER BY node
    """,
)
def q344_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-seed weighted shortest paths after 4 Bellman-Ford rounds
    (operators/graph.sssp) over the bipartite part<->supplier graph
    (edge weight = cheapest observed line price) — supply-chain blast
    radius / cheapest-route queries.  The contract is round-exact (the
    min over paths of <= 4 edges), so the oracle unrolls the identical
    min-plus recurrence; each candidate distance is a fixed-order
    left-fold of <= 4 additions and min() never reassociates, so the
    doubles match bit-for-bit (floor-at-6 guards only the display).
    Scale: edges hash-partitioned by src once + persisted, each round
    one O(nodes) join + map-side min — the semiring iteration shape
    shared with bfs_levels."""
    from .operators.graph import sssp

    li = table(spark, sf_dir, "lineitem")
    e0 = li.groupBy(
        F.concat(F.lit("p"), F.col("l_partkey").cast("string")).alias("s"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("d"),
    ).agg(F.min("l_extendedprice").alias("w"))
    sym = e0.unionByName(
        e0.select(F.col("d").alias("s"), F.col("s").alias("d"), "w")
    )
    seeds = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 29 == 1)
        .select(
            F.concat(F.lit("s"), F.col("s_suppkey").cast("string")).alias("node")
        )
    )
    out = sssp(sym, "s", "d", "w", seeds=seeds, rounds=4)
    return out.select(
        "node", (F.floor(F.col("dist") * 1e6) / 1e6).alias("dist")
    ).orderBy("node")


# ---------------------------------------------------------------------------
# q345: market-basket association rules (a-priori level 1)
# ---------------------------------------------------------------------------


@query(
    "q345_assoc_rules",
    oracle="""
    WITH b AS (SELECT DISTINCT l.l_orderkey AS bk, p.p_brand AS it
               FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT count(DISTINCT bk) AS n FROM b),
    supp AS (SELECT it, CAST(count(*) AS BIGINT) AS s FROM b GROUP BY 1),
    freq AS (SELECT it, s FROM supp, n WHERE s >= n.n * 0.05),
    kept AS (SELECT b.bk, b.it FROM b JOIN freq ON freq.it = b.it),
    pairs AS (SELECT a.it AS u, c.it AS v, CAST(count(*) AS BIGINT) AS sn
              FROM kept a JOIN kept c ON a.bk = c.bk AND a.it < c.it
              GROUP BY 1, 2),
    bo AS (SELECT u, v, sn FROM pairs UNION ALL SELECT v AS u, u AS v, sn FROM pairs)
    SELECT bo.u AS antecedent, bo.v AS consequent, sn AS support_n,
           sn / fa.s AS confidence,
           (sn * n.n) / (fa.s * fb.s) AS lift
    FROM bo JOIN freq fa ON fa.it = bo.u
              JOIN freq fb ON fb.it = bo.v, n
    ORDER BY antecedent, consequent
    """,
)
def q345_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (operators/ranking.association_rules)
    over brand co-purchases: for each frequent-brand pair A -> B, support
    count, confidence and lift.  The a-priori prune (items below 5%
    support never reach pair enumeration) is the scale story — pair
    blowup is (frequent-items-per-basket)^2; counts are integers and the
    two ratios are single exactly-rounded IEEE divisions, so no rounding
    is needed anywhere.  Frequent-item and support joins broadcast; N
    rides as a 1-row broadcast."""
    from .operators.ranking import association_rules

    li = table(spark, sf_dir, "lineitem")
    pt = table(spark, sf_dir, "part")
    baskets = li.join(pt, li["l_partkey"] == pt["p_partkey"]).select(
        F.col("l_orderkey").alias("bk"), F.col("p_brand").alias("it")
    )
    out = association_rules(
        baskets, "bk", "it", min_support_frac=0.05, min_confidence=0.0
    )
    return out.orderBy("antecedent", "consequent")


# ---------------------------------------------------------------------------
# q351: k-core pruning of the co-purchase graph
# ---------------------------------------------------------------------------


@query(
    "q351_k_core",
    oracle="""
    WITH b AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS it FROM lineitem),
    e AS (SELECT a.it AS u, c.it AS v
          FROM b a JOIN b c ON a.g = c.g AND a.it < c.it
          GROUP BY 1, 2 HAVING count(*) >= 2),
    s0 AS (SELECT u AS s, v AS d FROM e
           UNION ALL SELECT v AS s, u AS d FROM e),
    k1 AS (SELECT s FROM s0 GROUP BY s HAVING count(*) >= 3),
    s1 AS (SELECT s0.s, s0.d FROM s0
           JOIN k1 a ON a.s = s0.s JOIN k1 c ON c.s = s0.d),
    k2 AS (SELECT s FROM s1 GROUP BY s HAVING count(*) >= 3),
    s2 AS (SELECT s1.s, s1.d FROM s1
           JOIN k2 a ON a.s = s1.s JOIN k2 c ON c.s = s1.d),
    k3 AS (SELECT s FROM s2 GROUP BY s HAVING count(*) >= 3),
    s3 AS (SELECT s2.s, s2.d FROM s2
           JOIN k3 a ON a.s = s2.s JOIN k3 c ON c.s = s2.d),
    k4 AS (SELECT s FROM s3 GROUP BY s HAVING count(*) >= 3),
    s4 AS (SELECT s3.s, s3.d FROM s3
           JOIN k4 a ON a.s = s3.s JOIN k4 c ON c.s = s3.d)
    SELECT CAST(s AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS deg
    FROM s4 GROUP BY s ORDER BY node
    """,
)
def q351_k_core(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the part co-purchase graph after 4 fixed pruning rounds
    (operators/graph.k_core) — the densification filter separating
    structural hubs from one-off co-occurrence noise before community /
    triangle analytics (q343/q198 run better on the core).  Same graph
    as q343; same round-exact contract as sssp/LPA, so the oracle
    replays the peel rounds as unrolled CTEs.  Per round: one map-side
    degree count + two node-keyed semi-joins."""
    from .operators.graph import cooccurrence_edges, k_core

    li = table(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey", min_support=2)
    out = k_core(edges, "u", "v", k=3, rounds=4)
    return out.select(
        F.col("node").cast("bigint").alias("node"), "deg"
    ).orderBy("node")


# ---------------------------------------------------------------------------
# q352: item-item collaborative filtering (cosine on co-purchase counts)
# ---------------------------------------------------------------------------


@query(
    "q352_item_item_cf",
    oracle="""
    WITH ui AS (SELECT DISTINCT o.o_custkey AS u, p.p_brand AS it
                FROM lineitem l
                JOIN orders o ON l.l_orderkey = o.o_orderkey
                JOIN part p ON l.l_partkey = p.p_partkey),
    supp AS (SELECT it, CAST(count(*) AS BIGINT) AS s FROM ui GROUP BY 1),
    pairs AS (SELECT a.it AS u, c.it AS v, CAST(count(*) AS BIGINT) AS sn
              FROM ui a JOIN ui c ON a.u = c.u AND a.it < c.it
              GROUP BY 1, 2),
    bo AS (SELECT u, v, sn FROM pairs UNION ALL SELECT v AS u, u AS v, sn FROM pairs),
    scored AS (SELECT bo.u AS item, bo.v AS other, sn AS n_both,
                      sn / sqrt(CAST(sa.s * sb.s AS DOUBLE)) AS cos_sim
               FROM bo JOIN supp sa ON sa.it = bo.u
                       JOIN supp sb ON sb.it = bo.v),
    top AS (SELECT item, other, n_both, cos_sim,
                   row_number() OVER (PARTITION BY item
                                      ORDER BY cos_sim DESC, other ASC) AS rnk
            FROM scored)
    SELECT item, other, n_both,
           floor(cos_sim * 1000000) / 1000000 AS cos_sim,
           CAST(rnk AS INT) AS rnk
    FROM top WHERE rnk <= 3 ORDER BY item, rnk
    """,
)
def q352_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: top-3 most-similar brands per
    brand by co-purchaser cosine (n_both / sqrt(n_a * n_b)) — the
    neighborhood-method recommender primitive (Sarwar et al. 2001) on
    the customer×brand interaction set.  Distinct (user, item) pairs
    collapse multiplicity first (one map-side distinct); pair counts
    reuse the cooccurrence single-shuffle shape; supports broadcast
    back; cosine is one integer product + sqrt + division (bit-stable,
    floor-at-6 for display).  The per-item top-3 is a bounded window
    keyed BY item — partitioned, never global.  At 100 TB the same plan
    holds with min-support pruning on the pair table (q345's a-priori
    sparsifier) before the window."""
    from .operators.graph import cooccurrence_edges

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    pt = table(spark, sf_dir, "part")
    ui = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(pt, li["l_partkey"] == pt["p_partkey"])
        .select(F.col("o_custkey").alias("u"), F.col("p_brand").alias("it"))
    )
    supp = (
        ui.distinct()
        .groupBy("it")
        .agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    )
    pairs = cooccurrence_edges(ui, "u", "it")
    bo = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"), "support")
    )
    scored = (
        bo.join(F.broadcast(supp.select(F.col("it").alias("u"), F.col("s").alias("sa"))), "u")
        .join(F.broadcast(supp.select(F.col("it").alias("v"), F.col("s").alias("sb"))), "v")
        .select(
            F.col("u").alias("item"),
            F.col("v").alias("other"),
            F.col("support").alias("n_both"),
            (
                F.col("support")
                / F.sqrt((F.col("sa") * F.col("sb")).cast("double"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("cos_sim").desc(), F.col("other").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "item",
            "other",
            "n_both",
            (F.floor(F.col("cos_sim") * 1e6) / 1e6).alias("cos_sim"),
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("item", "rnk")
    )
