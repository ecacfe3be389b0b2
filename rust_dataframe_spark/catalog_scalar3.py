"""Catalog extension 3: statistical aggregates, the remaining math/datetime
scalar stubs, JSON functions, array constructors, and IVF ANN.

Covers reference wishlist names (SURVEY §2.8, functions/scalar.rs stub lines):
corr:184, acos asin atan tan sinh cosh tanh degrees radians log2 (impl'd
kernels 106-458), expm1:238, hypot:274, pow:347, factorial:248, conv:183,
to_date:459, to_timestamp:461, date_format:209, minute:339, second:387,
hour:267, from_unix_time:262, next_day:344, trunc:470, months_between:342,
from_json:261, to_json:460, sequence:388, explode:237 (positional variant).

Oracle notes: sinh/cosh/tanh/expm1 are absent in DuckDB, so the oracle uses
their exp() identities; both sides round to 6dp which absorbs the <=1-ulp
libm differences.  crc32 / sha1 / soundex have no DuckDB equivalent at all —
they live in functions/scalar.py and are pinned by known-vector unit tests
instead of an oracle query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .catalog import query, table
from .operators import similarity as sim

# ---------------------------------------------------------------------------
# statistics
# ---------------------------------------------------------------------------


@query(
    "q26_stats_corr",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6)       AS corr_qp,
           round(covar_pop(l_quantity, l_extendedprice), 4)  AS covp_qp,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covs_qp,
           round(quantile_cont(l_quantity, 0.5), 4)          AS med_qty,
           round(quantile_cont(l_extendedprice, 0.25), 4)    AS p25_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q26_stats_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """corr (reference stub scalar.rs:184) plus covariance and exact
    interpolated percentiles (Spark `percentile` == DuckDB `quantile_cont`).

    Scale: all five are single-pass partial aggregates except percentile,
    which Spark computes with a per-group sorted sketch — for 100 TB prefer
    `percentile_approx` and document the error bound."""
    from .context import widen

    # exact percentile builds per-partition sort buffers; a single-file scan
    # would serialize them — widen() repairs narrow-scan parallelism
    # (no-op on real multi-file tables), measured 1.75s -> 1.35s at sf0.1
    li = widen(table(spark, sf_dir, "lineitem"))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
            F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("covp_qp"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("covs_qp"),
            F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("med_qty"),
            F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("p25_price"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# remaining math scalars
# ---------------------------------------------------------------------------


@query(
    "q55_scalar_math2",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(acos(1 - l_discount), 6)                                   AS v_acos,
           round(asin(l_discount), 6)                                       AS v_asin,
           round(atan(l_tax), 6)                                            AS v_atan,
           round(tan(l_discount), 6)                                        AS v_tan,
           round((exp(l_tax) - exp(-l_tax)) / 2, 6)                         AS v_sinh,
           round((exp(l_tax) + exp(-l_tax)) / 2, 6)                         AS v_cosh,
           round((exp(2 * l_tax) - 1) / (exp(2 * l_tax) + 1), 6)            AS v_tanh,
           round(degrees(l_discount), 6)                                    AS v_degrees,
           round(radians(l_quantity), 6)                                    AS v_radians,
           round(log2(l_quantity), 6)                                       AS v_log2,
           round(exp(l_discount) - 1, 6)                                    AS v_expm1,
           round(sqrt(l_quantity * l_quantity + l_linenumber * l_linenumber), 6) AS v_hypot,
           round(pow(l_linenumber, 2.5), 6)                                 AS v_pow,
           CAST(factorial(l_linenumber) AS BIGINT)                          AS v_fact,
           to_base(l_orderkey, 16)                                          AS v_conv
    FROM lineitem WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q55_scalar_math2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the math kernel/stub surface (reference functions/scalar.rs:
    acos 115, asin 128, atan 138, tan 442, sinh 407, cosh 195, tanh 452,
    degrees 216, radians 356, log2 308, expm1 238, hypot 274, pow 347,
    factorial 248, conv 183) — every one a built-in `F.*`, rounded to 6dp so
    libm ulp differences vanish."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    d, t, q, n = F.col("l_discount"), F.col("l_tax"), F.col("l_quantity"), F.col("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.acos(1 - d), 6).alias("v_acos"),
        F.round(F.asin(d), 6).alias("v_asin"),
        F.round(F.atan(t), 6).alias("v_atan"),
        F.round(F.tan(d), 6).alias("v_tan"),
        F.round(F.sinh(t), 6).alias("v_sinh"),
        F.round(F.cosh(t), 6).alias("v_cosh"),
        F.round(F.tanh(t), 6).alias("v_tanh"),
        F.round(F.degrees(d), 6).alias("v_degrees"),
        F.round(F.radians(q), 6).alias("v_radians"),
        F.round(F.log2(q), 6).alias("v_log2"),
        F.round(F.expm1(d), 6).alias("v_expm1"),
        F.round(F.hypot(q, n.cast("double")), 6).alias("v_hypot"),
        F.round(F.pow(n, F.lit(2.5)), 6).alias("v_pow"),
        F.factorial(n).alias("v_fact"),
        F.conv(F.col("l_orderkey").cast("string"), 10, 16).alias("v_conv"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# remaining datetime scalars
# ---------------------------------------------------------------------------


@query(
    "q56_datetime2",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_orderdate,
             strptime(strftime(o_orderdate, '%Y-%m-%d') || ' 12:34:56',
                      '%Y-%m-%d %H:%M:%S') AS ts2
      FROM orders WHERE o_orderkey < 500
    )
    SELECT o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d')                          AS d_str,
           CAST(strptime(strftime(o_orderdate, '%Y-%m-%d'), '%Y-%m-%d') AS DATE) AS d_back,
           ts2,
           hour(ts2)                                                  AS h,
           minute(ts2)                                                AS mi,
           second(ts2)                                                AS s,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')                 AS from_unix,
           strftime(o_orderdate, '%A')                                AS dayname,
           CAST(date_trunc('month', o_orderdate) AS DATE)             AS month_start,
           CAST(o_orderdate + ((7 - (isodow(o_orderdate) - 1) - 1) % 7 + 1) * INTERVAL 1 DAY
                AS DATE)                                              AS next_monday,
           round((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1)
                 + (day(o_orderdate) - 15) / 31.0, 6)                 AS mb
    FROM t ORDER BY o_orderkey
    """,
)
def q56_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining temporal stubs (reference functions/scalar.rs: date_format
    209, to_date 459, to_timestamp 461, hour 267 (impl), minute 339, second
    387, from_unix_time 262, next_day 344, trunc 470, months_between 342).

    months_between oracle uses Spark's documented 31-day-month fraction; the
    anchor (1995-01-15, mid-month) avoids the both-last-day special case."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d_str = F.date_format("o_orderdate", "yyyy-MM-dd")
    ts2 = F.to_timestamp(F.concat(d_str, F.lit(" 12:34:56")), "yyyy-MM-dd HH:mm:ss")
    return o.select(
        "o_orderkey",
        d_str.alias("d_str"),
        F.to_date(d_str, "yyyy-MM-dd").alias("d_back"),
        ts2.alias("ts2"),
        F.hour(ts2).alias("h"),
        F.minute(ts2).alias("mi"),
        F.second(ts2).alias("s"),
        F.from_unixtime(F.unix_timestamp("o_orderdate")).alias("from_unix"),
        F.date_format("o_orderdate", "EEEE").alias("dayname"),
        F.trunc("o_orderdate", "mm").alias("month_start"),
        F.next_day("o_orderdate", "Mon").alias("next_monday"),
        F.round(
            F.months_between(F.col("o_orderdate"), F.lit("1995-01-15").cast("timestamp")), 6
        ).alias("mb"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# JSON functions
# ---------------------------------------------------------------------------


@query(
    "q57_json",
    oracle="""
    WITH t AS (
      SELECT p_partkey,
             to_json(struct_pack(p_partkey := p_partkey, p_name := p_name,
                                 p_size := p_size)) AS js
      FROM part WHERE p_partkey < 300
    )
    SELECT p_partkey,
           js,
           json_extract_string(js, '$.p_name')            AS name_out,
           CAST(json_extract(js, '$.p_size') AS INT)      AS size_out,
           CAST(json_extract(js, '$.p_partkey') AS BIGINT) AS key_out
    FROM t ORDER BY p_partkey
    """,
)
def q57_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar stubs (reference functions/scalar.rs: to_json 460,
    from_json 261): serialize a struct, then re-parse it with both the typed
    path (from_json + schema) and the stringly path (get_json_object).

    Both engines emit compact key-ordered JSON for simple structs, so the
    serialized string itself is value-compared too."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    js = F.to_json(F.struct("p_partkey", "p_name", "p_size"))
    t = p.select("p_partkey", js.alias("js"))
    parsed = F.from_json(F.col("js"), "p_partkey bigint, p_name string, p_size int")
    return t.select(
        "p_partkey",
        "js",
        F.get_json_object("js", "$.p_name").alias("name_out"),
        parsed["p_size"].alias("size_out"),
        parsed["p_partkey"].alias("key_out"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# array constructors / positional explode
# ---------------------------------------------------------------------------


@query(
    "q66_arrays2",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           range(1, l_linenumber + 1)                                   AS seq,
           flatten([range(1, l_linenumber + 1), range(1, l_linenumber + 1)]) AS flat,
           list_transform(range(1, 4), x -> l_returnflag)               AS rep
    FROM lineitem WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q66_arrays2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array constructors (reference stubs: sequence scalar.rs:388,
    array_repeat array.rs:294 — Spark repeats the element, the convention we
    keep; flatten table.rs:109 was `unimplemented!`)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    seq = F.sequence(F.lit(1).cast("bigint"), F.col("l_linenumber").cast("bigint"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        seq.alias("seq"),
        F.flatten(F.array(seq, seq)).alias("flat"),
        F.array_repeat(F.col("l_returnflag"), 3).alias("rep"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q67_posexplode",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           unnest(range(0, l_linenumber)) AS pos,
           unnest(range(1, l_linenumber + 1)) AS val
    FROM lineitem WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber, pos
    """,
)
def q67_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (positional variant of the explode stub scalar.rs:237);
    DuckDB replays it with zipped parallel unnests (0-based pos)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    seq = F.sequence(F.lit(1).cast("bigint"), F.col("l_linenumber").cast("bigint"))
    return (
        li.select("l_orderkey", "l_linenumber", F.posexplode(seq).alias("pos", "val"))
        .orderBy("l_orderkey", "l_linenumber", "pos")
    )


# ---------------------------------------------------------------------------
# IVF approximate nearest neighbors (the ANN scale path beyond SRP buckets)
# ---------------------------------------------------------------------------


def _ivf_oracle() -> str:
    return """
    WITH c AS (SELECT vec_id AS cid,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)
                          / sqrt(list_dot_product(
                              list_transform(embedding, y -> CAST(y AS DOUBLE)),
                              list_transform(embedding, y -> CAST(y AS DOUBLE))))) AS cvn
               FROM embeddings WHERE vec_id < 8),
    e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
          FROM embeddings),
    q AS (SELECT emb AS qv FROM e WHERE vec_id = 0),
    sims AS (SELECT e.vec_id, c.cid, e.emb,
                    row_number() OVER (PARTITION BY e.vec_id ORDER BY
                        list_dot_product(emb, cvn) DESC, c.cid ASC) AS rn
             FROM e CROSS JOIN c),
    assign AS (SELECT vec_id, cid AS cell, emb FROM sims WHERE rn = 1),
    probe AS (SELECT cid FROM c, q
              ORDER BY list_dot_product(cvn, qv) DESC, cid ASC
              LIMIT 2)
    SELECT a.vec_id, a.cell,
           round(list_dot_product(a.emb, q.qv)
                 / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(q.qv, q.qv))), 6)
               AS cos_sim
    FROM assign a, q
    WHERE a.cell IN (SELECT cid FROM probe)
    ORDER BY cos_sim DESC, a.vec_id
    LIMIT 10
    """


@query("q86_ivf_topk", oracle=_ivf_oracle())
def q86_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (operators/similarity.ivf_topk): coarse-quantize every vector
    to its nearest centroid, probe only the 2 cells nearest the query, exact
    cosine top-10 inside.  Deterministic quantizer (centroids = vec_id < 8)
    so DuckDB replays assignment, probing, and search bit-for-bit; at scale
    the centroids come from sampled k-means and `cell` becomes a partition
    column, turning probes into partition pruning."""
    e = table(spark, sf_dir, "embeddings")
    cent_rows = e.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    centroids = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in cent_rows]
    qvec = dict(centroids)[0]  # query = vec 0, already fetched — one collect total
    return sim.ivf_topk(e, "vec_id", "embedding", qvec, centroids, nprobe=2, k=10)


@query(
    "q329_ivf_recall",
    oracle="""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings),
    c AS (SELECT vec_id AS cid,
                 list_transform(emb, x -> x / sqrt(list_dot_product(emb, emb))) AS cvn
          FROM e WHERE vec_id < 8),
    q AS (SELECT vec_id AS query_id, emb AS qv FROM e
          WHERE vec_id BETWEEN 100 AND 105),
    sims AS (SELECT e.vec_id, c.cid, e.emb,
                    row_number() OVER (PARTITION BY e.vec_id ORDER BY
                        list_dot_product(emb, cvn) DESC, c.cid ASC) AS rn
             FROM e CROSS JOIN c),
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
    eh AS (SELECT q.query_id, e.vec_id,
                  round(list_dot_product(e.emb, q.qv)
                        / (sqrt(list_dot_product(e.emb, e.emb))
                           * sqrt(list_dot_product(q.qv, q.qv))), 6) AS cs
           FROM q CROSS JOIN e WHERE e.vec_id <> q.query_id),
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
def q329_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality CERTIFICATE: measured recall@10 of the IVF index
    (operators/similarity.ivf_batch_topk — nprobe=2 of 8 cells, probe
    choice in-plan per query) against the exact kNN ground truth
    (knn_join), per query vector (operators/similarity.ann_recall).  The
    q264/q266/q284 discipline applied to the ANN family: the approximation
    ships WITH its measured quality on the same engine run, replayed
    end-to-end by the oracle — assignment, probing, both top-10s, and the
    recall join.  Both top-k frames are |queries| x k rows, so the
    certificate costs nothing beyond the searches it audits."""
    e = table(spark, sf_dir, "embeddings")
    cent_rows = e.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    centroids = [
        (int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in cent_rows
    ]
    queries = e.filter(F.col("vec_id").between(100, 105))
    approx = sim.ivf_batch_topk(
        queries, e, "vec_id", "embedding", centroids, nprobe=2, k=10
    )
    exact = sim.knn_join(queries, e, "vec_id", "embedding", 10)
    return sim.ann_recall(approx, exact, 10).orderBy("query_id")


@query(
    "q59_scalar_misc",
    oracle="""
    WITH t AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate,
             CASE WHEN l_linenumber = 3 THEN 'NaN'::DOUBLE ELSE l_quantity END AS maybe_nan
      FROM lineitem WHERE l_orderkey < 300
    )
    SELECT l_orderkey, l_linenumber,
           CAST(position('1' IN CAST(l_orderkey AS VARCHAR)) AS INT)        AS v_locate,
           CASE WHEN isnan(maybe_nan) THEN -1.0 ELSE maybe_nan END          AS v_nanvl,
           round_even(l_quantity + 0.5, 0)                                  AS v_rint,
           CAST((((-l_orderkey)::HUGEINT & 18446744073709551615) >> 3) AS BIGINT) AS v_srl,
           (l_shipdate AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York'  AS v_from_utc,
           CAST(timezone('Asia/Tokyo', l_shipdate) AS TIMESTAMP)            AS v_to_utc
    FROM t ORDER BY l_orderkey, l_linenumber
    """,
)
def q59_scalar_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last scalar stragglers (reference stubs: locate scalar.rs:290, nanvl
    343, rint 370, shift_right_unsigned 393, from_utc_timestamp 263,
    to_utc_timestamp 462).  rint is half-even (DuckDB round_even);
    shiftrightunsigned on negatives replayed with a HUGEINT mask; timezone
    conversions hit the 1992-98 US/Japan DST tables on both engines."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    maybe_nan = F.when(F.col("l_linenumber") == 3, F.lit(float("nan"))).otherwise(
        F.col("l_quantity")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.locate("1", F.col("l_orderkey").cast("string")).alias("v_locate"),
        F.nanvl(maybe_nan, F.lit(-1.0)).alias("v_nanvl"),
        F.rint(F.col("l_quantity") + 0.5).alias("v_rint"),
        F.shiftrightunsigned(-F.col("l_orderkey"), 3).alias("v_srl"),
        F.from_utc_timestamp("l_shipdate", "America/New_York").alias("v_from_utc"),
        F.to_utc_timestamp("l_shipdate", "Asia/Tokyo").alias("v_to_utc"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q106_scalar_string3",
    oracle="""
    SELECT s_suppkey,
           left(s_name, 3)                                        AS left3,
           right(s_name, 4)                                       AS right4,
           bin(s_suppkey)                                         AS bin_key,
           round_even(s_suppkey + 0.5, 0)                         AS bround_key,
           substr(s_name, 1, 1) || 'XX' || substr(s_name, 4)      AS overlay_name,
           CAST(len(regexp_extract_all(s_name, '[0-9]')) AS INT)  AS digit_cnt
    FROM supplier
    WHERE s_suppkey < 500
    ORDER BY s_suppkey
    """,
)
def q106_scalar_string3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/number stragglers beyond q49/q59: left/right, bin (base-2
    digits), bround (half-even banker's rounding — DuckDB round_even; the
    tie operand is ``+ 0.5``, exactly representable in binary, because a
    decimal like x.05 is NOT and the two engines see different sides of the
    tie),
    overlay (the oracle states overlay's definition as a substr composition,
    since DuckDB lacks the function), regexp_count."""
    s = table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 500)
    return s.select(
        "s_suppkey",
        F.left(F.col("s_name"), F.lit(3)).alias("left3"),
        F.right(F.col("s_name"), F.lit(4)).alias("right4"),
        F.bin("s_suppkey").alias("bin_key"),
        F.bround(F.col("s_suppkey") + 0.5, 0).alias("bround_key"),
        F.overlay(F.col("s_name"), F.lit("XX"), F.lit(2), F.lit(2)).alias("overlay_name"),
        F.regexp_count(F.col("s_name"), F.lit("[0-9]")).cast("int").alias("digit_cnt"),
    ).orderBy("s_suppkey")


@query(
    "q107_variant_json",
    oracle="""
    WITH j AS (
      SELECT o_orderkey,
             to_json(struct_pack(
               okey   := o_orderkey,
               price  := round(o_totalprice, 2),
               meta   := struct_pack(status := o_orderstatus, prio := o_orderpriority),
               tags   := [o_orderstatus, o_orderpriority]
             )) AS doc
      FROM orders WHERE o_orderkey < 1000
    )
    SELECT o_orderkey,
           CAST(json_extract(doc, '$.okey') AS BIGINT)      AS v_okey,
           CAST(json_extract(doc, '$.price') AS DOUBLE)     AS v_price,
           json_extract_string(doc, '$.meta.status')        AS v_status,
           json_extract_string(doc, '$.tags[1]')            AS v_tag1
    FROM j ORDER BY o_orderkey
    """,
)
def q107_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured columns via Spark 4 VariantType: JSON text ->
    ``parse_json`` (binary variant encoding) -> path extraction with
    ``variant_get``.  Both engines build the same JSON document from order
    fields, then extract scalars by path (nested object + array index).

    Scale: variant is the lakehouse answer to schema-on-read JSON at volume —
    the binary encoding parses once at ingest, and ``variant_get`` is
    codegen'd field access, far cheaper than repeated ``get_json_object``
    string re-parsing (q57's shape) on a 100 TB raw-JSON column.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("okey"),
            F.round("o_totalprice", 2).alias("price"),
            F.struct(
                F.col("o_orderstatus").alias("status"),
                F.col("o_orderpriority").alias("prio"),
            ).alias("meta"),
            F.array("o_orderstatus", "o_orderpriority").alias("tags"),
        )
    )
    v = F.parse_json(doc)
    return o.select(
        "o_orderkey",
        F.variant_get(v, "$.okey", "bigint").alias("v_okey"),
        F.variant_get(v, "$.price", "double").alias("v_price"),
        F.variant_get(v, "$.meta.status", "string").alias("v_status"),
        F.variant_get(v, "$.tags[1]", "string").alias("v_tag1"),
    ).orderBy("o_orderkey")


@query(
    "q114_url_parse",
    oracle="""
    WITH u AS (
      SELECT s_suppkey,
             'https://s' || s_suppkey || '.example.com/cat/' || s_nationkey ||
             '/item?bal=' || CAST(s_suppkey % 100 AS VARCHAR) || '&ok=1' AS url
      FROM supplier WHERE s_suppkey < 200
    )
    SELECT s_suppkey,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1)   AS host,
           regexp_extract(url, '^[a-z]+://[^/]+([^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1)            AS query,
           regexp_extract(url, '[?&]bal=([^&]*)', 1)     AS bal_param
    FROM u ORDER BY s_suppkey
    """,
)
def q114_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition via ``parse_url`` (host/path/query/named query
    param) — the crawl-pipeline primitive behind per-domain dedup, robots
    filtering, and URL canonicalization.  The oracle states the same
    extractions as anchored regexes."""
    s = table(spark, sf_dir, "supplier").filter(F.col("s_suppkey") < 200)
    url = F.concat(
        F.lit("https://s"),
        F.col("s_suppkey").cast("string"),
        F.lit(".example.com/cat/"),
        F.col("s_nationkey").cast("string"),
        F.lit("/item?bal="),
        (F.col("s_suppkey") % 100).cast("string"),
        F.lit("&ok=1"),
    )
    return s.select(
        "s_suppkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
        F.parse_url(url, F.lit("QUERY"), F.lit("bal")).alias("bal_param"),
    ).orderBy("s_suppkey")


@query(
    "q115_fill_ignore_nulls",
    oracle="""
    WITH g AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE round(o_totalprice, 2) END AS v
      FROM orders WHERE o_orderkey < 2000
    )
    SELECT o_orderkey, v,
           last_value(v IGNORE NULLS) OVER
             (PARTITION BY o_orderstatus ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
           first_value(v IGNORE NULLS) OVER
             (PARTITION BY o_orderstatus ORDER BY o_orderkey
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill
    FROM g ORDER BY o_orderkey
    """,
)
def q115_fill_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window variants as forward/backward gap-fill
    (operators/temporal.forward_fill): nulls take the nearest non-null
    neighbor in order — one shuffle, single-pass running frames."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    g = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None))
        .otherwise(F.round("o_totalprice", 2))
        .alias("v"),
    )
    w_ff = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_bf = (
        Window.partitionBy("o_orderstatus")
        .orderBy("o_orderkey")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return g.select(
        "o_orderkey",
        "v",
        F.last("v", ignorenulls=True).over(w_ff).alias("ffill"),
        F.first("v", ignorenulls=True).over(w_bf).alias("bfill"),
    ).orderBy("o_orderkey")


@query(
    "q116_try_functions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN (l_linenumber - l_linenumber) = 0 THEN NULL
                ELSE l_extendedprice / (l_linenumber - l_linenumber) END AS div_zero,
           round(l_extendedprice / 4, 6)                                 AS div_ok,
           TRY_CAST(l_returnflag AS INTEGER)                             AS cast_bad,
           TRY_CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT)               AS cast_ok,
           ([l_quantity])[5]                                             AS elem_oob,
           ([l_quantity])[1]                                             AS elem_ok
    FROM lineitem WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q116_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe ``try_*`` variants: errors become nulls instead of failed
    jobs — at 100 TB one malformed row must not kill a 6-hour pipeline, and
    try_* keeps ANSI mode's integrity everywhere else.  Division by zero,
    invalid cast, and out-of-bounds element access all null out; the oracle
    states each as its explicit null-guard.  div_ok divides by 4 (a
    2-decimal price over a power of two is an exact 4-decimal value) because
    an arbitrary quotient lands on rounding-tie boundaries where the two
    engines' double rounding disagrees at any width."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(F.col("l_extendedprice"), F.col("l_linenumber") - F.col("l_linenumber")).alias("div_zero"),
        F.round(F.try_divide(F.col("l_extendedprice"), F.lit(4)), 6).alias("div_ok"),
        F.col("l_returnflag").try_cast("int").alias("cast_bad"),
        F.col("l_orderkey").cast("string").try_cast("bigint").alias("cast_ok"),
        F.try_element_at(F.array("l_quantity"), F.lit(5)).alias("elem_oob"),
        F.try_element_at(F.array("l_quantity"), F.lit(1)).alias("elem_ok"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "q117_agg_misc",
    oracle="""
    SELECT l_returnflag,
           bool_and(l_quantity > 0)                       AS all_pos,
           bool_or(l_discount > 0.09)                     AS any_big_disc,
           count_if(l_quantity > 45)                      AS n_bulk,
           round(median(l_quantity), 4)                   AS med_qty,
           mode(l_quantity)                               AS mode_qty,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q117_agg_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate stragglers: bool_and/bool_or, count_if, median, mode (the
    data's per-group mode is unique, so both engines agree — mode under ties
    is engine-defined), and deterministic string aggregation (Spark side:
    sorted collect_set + concat_ws; DuckDB: string_agg DISTINCT ORDER BY)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.bool_and(F.col("l_quantity") > 0).alias("all_pos"),
            F.bool_or(F.col("l_discount") > 0.09).alias("any_big_disc"),
            F.count_if(F.col("l_quantity") > 45).alias("n_bulk"),
            F.round(F.median("l_quantity"), 4).alias("med_qty"),
            F.mode("l_quantity").alias("mode_qty"),
            F.concat_ws(",", F.array_sort(F.collect_set("l_linestatus"))).alias("statuses"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q118_datetime3",
    oracle="""
    SELECT o_orderkey,
           make_date(year(o_orderdate), month(o_orderdate), 1)           AS month_first,
           make_timestamp(year(o_orderdate), month(o_orderdate),
                          day(o_orderdate), 12, 0, 0.0)                  AS noon_ts,
           o_orderdate + INTERVAL 36 HOUR                                AS plus_36h,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate)          AS days_since,
           date_diff('hour', TIMESTAMP '1995-01-01', o_orderdate)        AS hours_since,
           epoch_us(o_orderdate)                                         AS micros
    FROM orders WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def q118_datetime3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime constructors + interval arithmetic: make_date /
    make_timestamp (field-wise construction), timestampadd/timestampdiff
    (DuckDB: interval addition / date_diff), unix_micros (epoch_us).
    Completes the temporal surface beyond q42/q46/q56."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_first"),
        F.make_timestamp(
            F.year(d), F.month(d), F.dayofmonth(d), F.lit(12), F.lit(0), F.lit(0.0)
        ).alias("noon_ts"),
        F.timestamp_add("HOUR", F.lit(36), d).alias("plus_36h"),
        F.timestamp_diff(
            "DAY", F.lit("1995-01-01").cast("timestamp"), d
        ).alias("days_since"),
        F.timestamp_diff(
            "HOUR", F.lit("1995-01-01").cast("timestamp"), d
        ).alias("hours_since"),
        F.unix_micros(d.cast("timestamp")).alias("micros"),
    ).orderBy("o_orderkey")


@query(
    "q119_inline_structs",
    oracle="""
    SELECT t.p_partkey, u.s.tag AS tag, u.s.val AS val
    FROM (
      SELECT p_partkey,
             [{'tag': 'retail', 'val': round(p_retailprice, 2)},
              {'tag': 'double', 'val': round(p_retailprice * 2, 2)}] AS arr
      FROM part WHERE p_partkey < 200
    ) t, unnest(t.arr) AS u(s)
    ORDER BY p_partkey, tag
    """,
)
def q119_inline_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``inline`` — the array-of-structs generator (one output row per struct,
    struct fields become columns); the last explode-family member beyond
    q61/q67.  DuckDB states it as unnest over a list of structs."""
    p = table(spark, sf_dir, "part").filter(F.col("p_partkey") < 200)
    arr = F.array(
        F.struct(F.lit("retail").alias("tag"), F.round("p_retailprice", 2).alias("val")),
        F.struct(
            F.lit("double").alias("tag"),
            F.round(F.col("p_retailprice") * 2, 2).alias("val"),
        ),
    )
    return (
        p.select("p_partkey", F.inline(arr))
        .select("p_partkey", "tag", "val")
        .orderBy("p_partkey", "tag")
    )


@query(
    "q123_decimal_e2e",
    oracle="""
    SELECT l_returnflag,
           count(*)                                                    AS n,
           sum(CAST(l_quantity AS DECIMAL(38,18)))                     AS qty_sum,
           min(CAST(l_quantity AS DECIMAL(38,18)))                     AS qty_min,
           max(CAST(l_quantity AS DECIMAL(38,18)))                     AS qty_max,
           sum(CAST(l_quantity AS DECIMAL(19,2))
               * CAST('1.25' AS DECIMAL(5,2)))                         AS qty_x
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def q123_decimal_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DecimalType(38,18) end-to-end: cast, arithmetic, parquet round-trip,
    aggregation — executable evidence for the numeric->Decimal(38,18) claim
    in sources/jdbc.py:21 (the reference degraded numerics to Float64,
    reader.rs:247).  Decimals come from exact integer-valued quantities and a
    scale-2 literal so every value is exact at both engines' result scales;
    avg/division are excluded deliberately (their result-scale rules differ
    between engines — documented, not hidden).  The frame is written to and
    read back from parquet before aggregating, proving DECIMAL(38,18)
    survives the storage format (logical type FIXED_LEN_BYTE_ARRAY/16+)."""
    import os as _os

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_quantity").cast("decimal(38,18)").alias("qty_dec"),
        (
            F.col("l_quantity").cast("decimal(19,2)")
            * F.expr("CAST('1.25' AS DECIMAL(5,2))")
        ).alias("qty_x"),
    )
    path = f"/tmp/spark_graft_io/decimal_{_os.path.basename(sf_dir.rstrip('/'))}"
    li.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("qty_dec").alias("qty_sum"),
            F.min("qty_dec").alias("qty_min"),
            F.max("qty_dec").alias("qty_max"),
            F.sum("qty_x").alias("qty_x"),
        )
        .orderBy("l_returnflag")
    )
