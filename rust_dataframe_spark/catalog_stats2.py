"""Catalog round 6 (continued): q245-q249.

CUPED experiment variance reduction, blocked fuzzy string matching,
equi-depth histogram without a global sort, a Benford first-digit audit,
and the exact set-similarity join via prefix filtering — the guaranteed-
recall counterpart to the LSH family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import load_events, query, table

__all__: list[str] = []


# ---------------------------------------------------------------------------
# q245: CUPED variance reduction
# ---------------------------------------------------------------------------


@query(
    "q245_cuped",
    oracle="""
    WITH units AS (
      SELECT user_id, user_id % 2 AS arm,
             sum(CASE WHEN ts <  TIMESTAMP '2024-01-16' THEN value ELSE 0 END) AS x,
             sum(CASE WHEN ts >= TIMESTAMP '2024-01-16' THEN value ELSE 0 END) AS y
      FROM events GROUP BY 1, 2
    ),
    g AS (SELECT covar_pop(x, y) / var_pop(x) AS theta, avg(x) AS xbar
          FROM units),
    adj AS (SELECT arm, y, y - theta * (x - xbar) AS adj_y, theta
            FROM units CROSS JOIN g)
    SELECT arm AS arm, CAST(count(*) AS BIGINT) AS n,
           round(avg(y), 4) AS mean_y,
           round(avg(adj_y), 4) AS mean_adj,
           round(var_pop(y), 2) AS var_y,
           round(var_pop(adj_y), 2) AS var_adj,
           round(1 - var_pop(adj_y) / var_pop(y), 6) AS var_reduction,
           round(max(theta), 6) AS theta
    FROM adj GROUP BY 1 ORDER BY 1
    """,
)
def q245_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (operators/experiments.cuped):
    units are users, arm = user_id mod 2 (deterministic assignment), the
    experiment metric y is the user's event-value sum in the back half of
    January, the covariate x the front half.  θ = cov(x,y)/var(x) pooled,
    adjusted_y = y - θ(x - x̄); ``var_reduction`` is the fraction of metric
    variance the covariate removes (≈ corr²) — the experiment-duration
    win CUPED is used for.  Complements the bootstrap readout (q234) with
    the closed-form adjustment.  All plain partial aggregates: per-user
    rollup, two pooled scalars broadcast back, per-arm moments."""
    from .operators.experiments import cuped

    split = F.lit("2024-01-16").cast("timestamp")
    ev = load_events(spark, sf_dir)
    units = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < split, F.col("value")).otherwise(0.0)).alias("x"),
        F.sum(F.when(F.col("ts") >= split, F.col("value")).otherwise(0.0)).alias("y"),
    ).withColumn("arm", F.col("user_id") % 2)
    out = cuped(units, "arm", "y", "x")
    return out.select(
        "arm",
        "n",
        F.round("mean_y", 4).alias("mean_y"),
        F.round("mean_adj", 4).alias("mean_adj"),
        F.round("var_y", 2).alias("var_y"),
        F.round("var_adj", 2).alias("var_adj"),
        F.round("var_reduction", 6).alias("var_reduction"),
        F.round("theta", 6).alias("theta"),
    ).orderBy("arm")


# ---------------------------------------------------------------------------
# q246: blocked fuzzy string matching (Levenshtein within blocks)
# ---------------------------------------------------------------------------


@query(
    "q246_fuzzy_match",
    oracle="""
    WITH p AS (
      SELECT p_partkey, p_name, split_part(p_name, ' ', 1) AS blk
      FROM part WHERE p_partkey < 300
    )
    SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
    FROM p a JOIN p b ON a.blk = b.blk AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    ORDER BY id_a, id_b
    """,
)
def q246_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy string matching: part-name pairs within an edit
    distance of 4, candidate-limited to pairs sharing the first token
    (classic record-linkage blocking — the recall trade is explicit:
    pairs differing in the blocking key are unseen by design, exactly as
    in operators/dedup.blocked_weighted_jaccard).  Levenshtein runs only
    inside blocks, so cost is Σ|block|², never n² — and the shuffle key is
    the block token, AQE-splittable when one block runs hot.  Spark and
    DuckDB agree on levenshtein (unit-cost edit distance), making the
    verify stage engine-replayable."""
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            "p_name",
            F.substring_index("p_name", " ", 1).alias("blk"),
        )
    )
    a = p.select(
        F.col("p_partkey").alias("id_a"), F.col("p_name").alias("na"), "blk"
    )
    b = p.select(
        F.col("p_partkey").alias("id_b"), F.col("p_name").alias("nb"), "blk"
    )
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("na", "nb"))
        .filter(F.col("dist") <= 4)
        .select("id_a", "id_b", F.col("dist").cast("int").alias("dist"))
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# q247: equi-depth histogram without a global sort
# ---------------------------------------------------------------------------


@query(
    "q247_equidepth_hist",
    oracle="""
    WITH cuts AS (
      SELECT quantile_cont(l_extendedprice,
                           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cs
      FROM lineitem
    ),
    b AS (
      SELECT 1 + len(list_filter(cs, c -> l_extendedprice >= c)) AS bucket,
             l_extendedprice AS v
      FROM lineitem CROSS JOIN cuts
    )
    SELECT CAST(bucket AS INT) AS bucket, CAST(count(*) AS BIGINT) AS n,
           round(min(v), 2) AS lo, round(max(v), 2) AS hi
    FROM b GROUP BY 1 ORDER BY 1
    """,
)
def q247_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of extended price — the complement of
    the fixed-width hist (q23).  The naive form is ``ntile(10)`` over a
    global sort: one partition holds everything.  The scalable form used
    here: one exact-percentile aggregate produces the 9 cut points (a
    single row, broadcast), then bucket assignment is a codegen'd
    fold over the cut array — scan-parallel, no global sort, no collect.
    Spark `percentile(array)` == DuckDB `quantile_cont(list)` keeps both
    engines on identical cut bits; at 100 TB the cuts come from
    `percentile_approx` with a stated error bound."""
    li = table(spark, sf_dir, "lineitem")
    qs = [i / 10.0 for i in range(1, 10)]
    cuts = li.agg(
        F.percentile(
            "l_extendedprice", F.array(*[F.lit(q) for q in qs])
        ).alias("cs")
    )
    b = li.crossJoin(F.broadcast(cuts)).select(
        (
            1
            + F.aggregate(
                "cs",
                F.lit(0),
                lambda acc, c: acc
                + F.when(F.col("l_extendedprice") >= c, 1).otherwise(0),
            )
        ).alias("bucket"),
        F.col("l_extendedprice").alias("v"),
    )
    return (
        b.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("v"), 2).alias("lo"),
            F.round(F.max("v"), 2).alias("hi"),
        )
        .select(F.col("bucket").cast("int").alias("bucket"), "n", "lo", "hi")
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# q248: Benford first-digit audit
# ---------------------------------------------------------------------------


@query(
    "q248_benford",
    oracle="""
    WITH d AS (
      SELECT CAST(floor(o_totalprice / pow(10, floor(log10(o_totalprice))))
                  AS INT) AS digit
      FROM orders WHERE o_totalprice > 0
    ),
    c AS (SELECT digit, count(*) AS n FROM d GROUP BY 1)
    SELECT digit, CAST(n AS BIGINT) AS n,
           round(n * 1.0 / sum(n) OVER (), 6) AS obs_p,
           round(log10(1 + 1.0 / digit), 6) AS benford_p,
           round(n * 1.0 / sum(n) OVER () - log10(1 + 1.0 / digit), 6)
             AS deviation
    FROM c ORDER BY digit
    """,
)
def q248_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    fabricated-data / corruption screen: observed first-significant-digit
    frequencies vs log10(1+1/d).  The digit is extracted numerically
    (value / 10^⌊log10 v⌋), never via string formatting, so both engines
    agree bit-for-bit.  Scan → 9-row aggregate; the windowed total runs
    over 9 rows.  (TPC-H totals are sums of uniform draws, so they bulge
    mid-range — the deviation column showing that is the audit working,
    not failing.)"""
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.floor(
            F.col("o_totalprice")
            / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
        )
        .cast("int")
        .alias("digit")
    )
    c = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    tot = Window.partitionBy()
    return c.select(
        "digit",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("obs_p"),
        F.round(F.log10(1 + 1.0 / F.col("digit")), 6).alias("benford_p"),
        F.round(
            F.col("n") / F.sum("n").over(tot) - F.log10(1 + 1.0 / F.col("digit")),
            6,
        ).alias("deviation"),
    ).orderBy("digit")


# ---------------------------------------------------------------------------
# q249: exact set-similarity join via prefix filtering
# ---------------------------------------------------------------------------


@query(
    "q249_prefix_setjoin",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' '), x -> x != ''))
               AS toks
      FROM documents WHERE doc_id < 300
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.toks, b.toks)) * 1.0 /
                 (len(a.toks) + len(b.toks)
                  - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.toks, b.toks)) * 1.0 /
          (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
          >= 0.95
    ORDER BY id_a, id_b
    """,
)
def q249_prefix_setjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join at Jaccard ≥ 0.95 via prefix
    filtering (operators/setjoin.prefix_jaccard_join — AllPairs/PPJoin):
    tokens ordered rarest-first, only the ``|d| - ⌈t|d|⌉ + 1`` rarest per
    doc generate candidates, every qualifying pair provably survives —
    the guaranteed-recall counterpart to MinHash-LSH (q72), at the cost
    of an exact-verify join instead of banding.  The oracle brute-forces
    all pairs (fine at 300 docs); equality certifies zero false
    negatives.  Scale: candidates shuffle on prefix tokens (rare by
    construction), verification is codegen'd array_intersect on
    candidates only, and the vocabulary rank table is vocab-bounded."""
    from .operators.setjoin import prefix_jaccard_join

    d = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 300)
        .select(
            "doc_id",
            F.array_distinct(
                F.filter(F.split("text", " "), lambda x: x != "")
            ).alias("toks"),
        )
    )
    out = prefix_jaccard_join(d, "doc_id", "toks", threshold=0.95)
    return out.select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    ).orderBy("id_a", "id_b")
