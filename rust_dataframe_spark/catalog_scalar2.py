"""Scalar catalog, part 2 (SURVEY §2.8 stub list): regexp, date arithmetic,
crypto/encoding, bitwise, misc string.  Every name below is a declared stub in
reference functions/scalar.rs (line numbers cited per query)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import query, table


@query(
    "q45_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+)', 1)          AS first_token,
           regexp_replace(p_name, '[aeiou]', '*', 'g')    AS devoweled,
           translate(p_brand, 'Brand#', 'BRAND_')         AS translated,
           repeat(p_type, 2)                              AS doubled,
           CAST(levenshtein(p_brand, 'Brand#1') AS INT)   AS lev_dist,
           CAST(instr(p_name, 'a') AS BIGINT)             AS a_pos
    FROM part WHERE p_partkey < 300 ORDER BY p_partkey
    """,
)
def q45_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract (stub scalar.rs:365), regexp_replace (:366), translate
    (:463), repeat (:367), levenshtein (:288), locate/instr (:290)."""
    p = table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.regexp_extract(F.col("p_name"), "([a-z]+)", 1).alias("first_token"),
            F.regexp_replace(F.col("p_name"), "[aeiou]", "*").alias("devoweled"),
            F.translate(F.col("p_brand"), "Brand#", "BRAND_").alias("translated"),
            F.repeat(F.col("p_type"), 2).alias("doubled"),
            F.levenshtein(F.col("p_brand"), F.lit("Brand#1")).alias("lev_dist"),
            F.instr(F.col("p_name"), "a").cast("bigint").alias("a_pos"),
        )
        .orderBy("p_partkey")
    )


@query(
    "q46_date_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) + 30                                    AS plus30,
           CAST(CAST(o_orderdate AS DATE) - INTERVAL 7 DAY AS DATE)          AS minus7,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INT)
                                                                             AS days_to_y2k,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE)        AS plus2m,
           last_day(CAST(o_orderdate AS DATE))                               AS month_end,
           CAST(weekofyear(o_orderdate) AS INT)                              AS week_no,
           CAST(dayofweek(o_orderdate) + 1 AS INT)                           AS dow,
           CAST(dayofyear(o_orderdate) AS INT)                               AS doy,
           CAST(epoch(o_orderdate) AS BIGINT)                                AS epoch_s
    FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey
    """,
)
def q46_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_add (stub scalar.rs:208), date_sub (:210), datediff (:212),
    add_months (:125), last_day (:285), weekofyear (:490), day_of_week (:214;
    DuckDB counts Sunday=0 vs Spark's Sunday=1, oracle offsets), day_of_year
    (:215), unix_timestamp (:473)."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.filter(F.col("o_orderkey") < 300)
        .select(
            "o_orderkey",
            F.date_add(d, 30).alias("plus30"),
            F.date_sub(d, 7).alias("minus7"),
            F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
            F.add_months(d, 2).alias("plus2m"),
            F.last_day(d).alias("month_end"),
            F.weekofyear(d).alias("week_no"),
            F.dayofweek(d).alias("dow"),
            F.dayofyear(d).alias("doy"),
            F.unix_timestamp(d).alias("epoch_s"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q47_crypto_encoding",
    oracle="""
    SELECT c_custkey,
           sha256(c_name)                         AS sha_name,
           md5(c_name)                            AS md5_name,
           to_base64(encode(c_name))              AS b64_name,
           hex(encode(c_name))                    AS hex_name,
           ascii(c_name)                          AS first_code,
           chr(65 + CAST(c_custkey % 26 AS INT))  AS letter
    FROM customer WHERE c_custkey < 300 ORDER BY c_custkey
    """,
)
def q47_crypto_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sha2 (stub scalar.rs:390), md5 (:338), base64 (:158), hex (:266),
    ascii, chr.  DuckDB lacks sha1/crc32 — those are covered by unit tests
    instead (tests/test_functions.py)."""
    c = table(spark, sf_dir, "customer")
    name = F.col("c_name")
    return (
        c.filter(F.col("c_custkey") < 300)
        .select(
            "c_custkey",
            F.sha2(name, 256).alias("sha_name"),
            F.md5(name).alias("md5_name"),
            F.base64(name.cast("binary")).alias("b64_name"),
            F.hex(name).alias("hex_name"),
            F.ascii(name).alias("first_code"),
            F.chr(F.lit(65) + (F.col("c_custkey") % 26).cast("int")).alias("letter"),
        )
        .orderBy("c_custkey")
    )


@query(
    "q48_bitwise",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_orderkey << 2                                   AS shl,
           l_orderkey >> 1                                   AS shr,
           l_orderkey & 255                                  AS band,
           l_orderkey | 16                                   AS bor,
           xor(l_orderkey, l_partkey)                        AS bxor,
           ~l_orderkey                                       AS bnot,
           CAST(bit_count(l_orderkey) AS INT)                AS popcnt
    FROM lineitem WHERE l_orderkey < 100 ORDER BY l_orderkey, l_linenumber
    """,
)
def q48_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shift_left/shift_right (stubs scalar.rs:391-393), bitwise_not (:159),
    bitwiseAND/OR/XOR column ops, bit_count."""
    li = table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    return (
        li.filter(k < 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.shiftleft(k, 2).alias("shl"),
            F.shiftright(k, 1).alias("shr"),
            (k.bitwiseAND(F.lit(255))).alias("band"),
            (k.bitwiseOR(F.lit(16))).alias("bor"),
            (k.bitwiseXOR(F.col("l_partkey"))).alias("bxor"),
            F.bitwise_not(k).alias("bnot"),
            F.bit_count(k).alias("popcnt"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q49_string_misc",
    oracle="""
    SELECT s_suppkey,
           array_to_string(list_transform(string_split(lower(s_name), ' '),
               x -> upper(x[1]) || x[2:]), ' ')     AS initcapped,
           rpad(s_name, 25, '.')                    AS rpadded,
           ltrim(concat('  ', s_name))              AS ltrimmed,
           rtrim(concat(s_name, '  '))              AS rtrimmed,
           substr(s_name, 1, 8)                     AS prefix8,
           split_part(s_name, '#', 2)               AS after_hash,
           CAST(strpos(s_name, '#') AS BIGINT)      AS hash_pos,
           concat_ws('/', s_name, CAST(s_nationkey AS VARCHAR)) AS slashed
    FROM supplier ORDER BY s_suppkey
    """,
)
def q49_string_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """initcap (stub scalar.rs:284; DuckDB lacks it — oracle emulates with a
    per-word lambda), rpad (:379), ltrim/rtrim (implemented kernels
    scalar.rs:332-337,380-385), substring_index/split_part (:441), locate
    (:290), concat_ws (:182)."""
    s = table(spark, sf_dir, "supplier")
    name = F.col("s_name")
    return s.select(
        "s_suppkey",
        F.initcap(F.lower(name)).alias("initcapped"),
        F.rpad(name, 25, ".").alias("rpadded"),
        F.ltrim(F.concat(F.lit("  "), name)).alias("ltrimmed"),
        F.rtrim(F.concat(name, F.lit("  "))).alias("rtrimmed"),
        F.substring(name, 1, 8).alias("prefix8"),
        F.substring_index(name, "#", -1).alias("after_hash"),
        F.instr(name, "#").cast("bigint").alias("hash_pos"),
        F.concat_ws("/", name, F.col("s_nationkey").cast("string")).alias("slashed"),
    ).orderBy("s_suppkey")


@query(
    "q24_cube_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS cnt,
           round(sum(l_quantity), 2) AS qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q24_cube_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cube/rollup grouping sets — absent from the reference (SURVEY §2.5
    'free upside'); one shuffle computes all 2^k grouping combinations."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


@query(
    "q25_with_id",
    oracle="SELECT count(*) AS n_rows, count(*) AS n_ids FROM lineitem",
)
def q25_with_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """with_id (reference dataframe.rs:234-249): ids themselves are
    partition-layout-dependent (chunk stride there, partition stride here), so
    the oracle checks the invariant — one distinct id per row."""
    li = table(spark, sf_dir, "lineitem")
    with_id = li.withColumn("rid", F.monotonically_increasing_id())
    return with_id.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("rid")).alias("n_ids"),
    )


@query(
    "q33_sort_nulls",
    oracle="""
    WITH t AS (
      SELECT o_orderkey,
             nullif(o_orderstatus, 'F') AS st,
             round(o_totalprice, 2) AS total
      FROM orders WHERE o_orderkey < 400
    )
    SELECT o_orderkey, st, total FROM t
    ORDER BY st DESC NULLS FIRST, total ASC NULLS LAST, o_orderkey
    LIMIT 150
    """,
)
def q33_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four nulls-placement sort variants exist in our API; the reference
    declared `nulls_first` but hard-coded it off at execution
    (expression.rs:305-318 — SURVEY §2.6 do-not-reproduce).  Nulls are
    manufactured with nullif so both engines sort the same data."""
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    return o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("F")).alias("st"),
        F.round("o_totalprice", 2).alias("total"),
    ).orderBy(
        F.col("st").desc_nulls_first(), F.col("total").asc_nulls_last(), F.col("o_orderkey")
    ).limit(150)
    # the LIMIT makes null placement load-bearing for the order-insensitive
    # value check: nulls-last would select a disjoint row set


@query(
    "q34_predicate_ast",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE NOT (l_returnflag = 'A')
      AND (l_quantity >= 49.0 OR l_discount <= 0.01)
      AND l_linenumber <> 7
      AND l_shipdate IS NOT NULL
    ORDER BY l_orderkey, l_linenumber
    LIMIT 200
    """,
)
def q34_predicate_ast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full BooleanFilter AST (reference expression.rs:745-870): Not, And,
    Or, Ne, Ge, Le over scalar and column operands — typed comparisons, not
    the reference's everything-to-Float64 coercion (expression.rs:843-845,
    SURVEY §2.3 deviation note)."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (~(F.col("l_returnflag") == "A"))
            & ((F.col("l_quantity") >= 49.0) | (F.col("l_discount") <= 0.01))
            & (F.col("l_linenumber") != 7)
            & F.col("l_shipdate").isNotNull()
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(200)
    )


@query(
    "q03_projection_verbs",
    oracle="""
    SELECT l_orderkey AS okey,
           l_linenumber,
           CAST(l_quantity AS INT) AS qty_int,
           round(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_orderkey < 200
    ORDER BY okey, l_linenumber
    """,
)
def q03_projection_verbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The projection verb chain as one query: select -> drop ->
    with_column_renamed -> cast (reference dataframe.rs:258-337, 116-124;
    CastOperation operation/scalar.rs:95-137).  Catalyst collapses the chain
    into a single Project over the pruned scan — verbs are free."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_tax")
        .drop("l_tax")
        .withColumnRenamed("l_orderkey", "okey")
        .withColumn("qty_int", F.col("l_quantity").cast("int"))
        .drop("l_quantity")
        .withColumn("price", F.round("l_extendedprice", 2))
        .drop("l_extendedprice")
        .select("okey", "l_linenumber", "qty_int", "price")
        .orderBy("okey", "l_linenumber")
    )


@query(
    "q17_join_cross",
    oracle="""
    SELECT r.r_name, count(*) AS n_pairs, min(n.n_name) AS first_nation
    FROM region r CROSS JOIN nation n
    GROUP BY r.r_name ORDER BY r.r_name
    """,
)
def q17_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (absent from the reference, SURVEY §2.4 'free upside') —
    only ever sane when one side is tiny; Spark plans
    BroadcastNestedLoopJoin.  Kept deliberately small (5 x 25)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return (
        r.crossJoin(n)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.min("n_name").alias("first_nation"))
        .orderBy("r_name")
    )


_Q04_SQL = """
    SELECT l_returnflag,
           count(*) AS n,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           round(avg(l_quantity), 6) AS avg_qty
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
"""


@query("q04_sql_api", oracle=_Q04_SQL)
def q04_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: the exact same ANSI text runs through
    ``spark.sql`` here and through DuckDB as the oracle — one dialect, two
    engines, byte-identical query string.  Tables are registered as temp
    views per scale-factor dir (Context.register_tables)."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q04_SQL)


@query(
    "q27_profile",
    oracle="""
    SELECT 'l_quantity' AS "column", count(*) AS n_rows,
           count(*) - count(l_quantity) AS n_nulls,
           count(DISTINCT l_quantity) AS n_distinct,
           CAST(min(l_quantity) AS VARCHAR) AS min, CAST(max(l_quantity) AS VARCHAR) AS max
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', count(*), count(*) - count(l_returnflag),
           count(DISTINCT l_returnflag),
           min(l_returnflag), max(l_returnflag)
    FROM lineitem
    UNION ALL
    SELECT 'l_linenumber', count(*), count(*) - count(l_linenumber),
           count(DISTINCT l_linenumber),
           CAST(min(l_linenumber) AS VARCHAR), CAST(max(l_linenumber) AS VARCHAR)
    FROM lineitem
    ORDER BY "column"
    """,
)
def q27_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (operators/histogram.profile): nulls/distincts/min/max
    for several columns in ONE scan (wide aggregate, then driver-side unpivot
    of the single stat row)."""
    from .operators.histogram import profile

    li = table(spark, sf_dir, "lineitem")
    return profile(li, ["l_quantity", "l_returnflag", "l_linenumber"]).orderBy("column")
