"""Array / collection function catalog (SURVEY §2.9).

The reference implements per-row kernels over ``List<primitive>`` columns
(functions/array.rs): contains, distinct, except, intersect, max, min,
position, remove, repeat, sort, union — and declares join/overlap/zip,
collect_list/collect_set, and the map_* family as stubs.  All are Spark
built-ins; the queries here exercise them on real columns (``documents.text``
tokenized, ``embeddings.embedding``).

Oracle notes: DuckDB's list functions differ in naming (list_contains,
list_position returning NULL-if-absent vs Spark's 0, list_has_any for
arrays_overlap) and in set-op ordering, so set-valued results are sorted and
joined to strings so value hashes are canonical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .catalog import query, table


@query(
    "q60_array_ops",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
    SELECT doc_id,
           CAST(len(words) AS INT)                                          AS n_words,
           list_contains(words, 'spark')                                    AS has_spark,
           CAST(coalesce(list_position(words, 'table'), 0) AS BIGINT)       AS pos_table,
           words[1]                                                         AS first_word,
           array_to_string(list_sort(list_distinct(words)), '|')            AS vocab,
           array_to_string(words[1:5], '|')                                 AS head5,
           array_to_string(list_filter(words, x -> x <> 'table'), '|')      AS no_table,
           array_to_string(list_reverse_sort(list_distinct(words)), '|')    AS vocab_desc
    FROM w WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def q60_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_contains/position/distinct/sort/remove/slice/element_at
    (reference functions/array.rs:15-355).  array_position keeps the
    reference's 1-based-0-if-absent convention (array.rs:233-259) — Spark's
    built-in has the identical convention; DuckDB returns NULL-if-absent so
    the oracle coalesces.

    Scale: all element-wise, no shuffle; stays in whole-stage codegen.
    """
    d = table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    return (
        d.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.size(words).alias("n_words"),
            F.array_contains(words, "spark").alias("has_spark"),
            F.array_position(words, "table").alias("pos_table"),
            F.element_at(words, 1).alias("first_word"),
            F.array_join(F.array_sort(F.array_distinct(words)), "|").alias("vocab"),
            F.array_join(F.slice(words, 1, 5), "|").alias("head5"),
            F.array_join(F.array_remove(words, "table"), "|").alias("no_table"),
            F.array_join(F.reverse(F.array_sort(F.array_distinct(words))), "|").alias(
                "vocab_desc"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "q61_explode_wordcount",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE length(word) > 0
    GROUP BY word
    ORDER BY cnt DESC, word
    LIMIT 20
    """,
)
def q61_explode_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (reference stub scalar.rs:237) -> the canonical word count.

    Scale: explode multiplies rows ~n_words x; the count aggregate is
    map-side-combined so the shuffle carries only distinct words per partition.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "word")
        .limit(20)
    )


@query(
    "q62_array_setops",
    oracle="""
    WITH w AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS words
               FROM documents)
    SELECT doc_id,
           list_has_any(words, ['spark', 'table', 'row', 'data'])           AS overlaps,
           coalesce(array_to_string(list_sort(list_distinct(
               list_filter(words, x -> list_contains(['spark','table','row','data'], x)))), '|'), '')
                                                                            AS inter,
           coalesce(array_to_string(list_sort(list_distinct(
               list_filter(words, x -> NOT list_contains(['spark','table','row','data'], x)))), '|'), '')
                                                                            AS exc,
           coalesce(array_to_string(list_sort(list_distinct(
               list_concat(words, ['spark','table','row','data']))), '|'), '') AS uni
    FROM w WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def q62_array_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_intersect/except/union/overlap (reference functions/array.rs:
    66-153, 356-399, stub 154-181).  Set-valued outputs are sorted+joined so
    both engines hash identically despite unspecified set ordering.  The
    oracle coalesces its joins to '': DuckDB's array_to_string([]) is NULL
    while Spark's array_join([]) is '' — surfaced by the sf0.1 full-catalog
    gate (the first zero-overlap doc appears only at that scale)."""
    d = table(spark, sf_dir, "documents")
    ref = F.array(*[F.lit(x) for x in ["spark", "table", "row", "data"]])
    words = F.array_distinct(F.split(F.col("text"), " "))
    return (
        d.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.arrays_overlap(words, ref).alias("overlaps"),
            F.array_join(F.array_sort(F.array_intersect(words, ref)), "|").alias("inter"),
            F.array_join(F.array_sort(F.array_except(words, ref)), "|").alias("exc"),
            F.array_join(F.array_sort(F.array_union(words, ref)), "|").alias("uni"),
        )
        .orderBy("doc_id")
    )


@query(
    "q63_collect_list_set",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           array_to_string(list_sort(list(DISTINCT source)), '|') AS sources,
           round(avg(n_chars), 4) AS avg_chars
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def q63_collect_list_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_set/collect_list aggregates (reference stubs array.rs:404-405,
    noted 'maybe aggregate' — they are).  Sorted before join since Spark's
    collect order is partition-dependent.

    Scale: collect_set on a bounded domain (20 sources) is safe; unbounded
    collect_list at 100 TB is an anti-pattern — documented here deliberately.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(F.array_sort(F.collect_set("source")), "|").alias("sources"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang")
    )


@query(
    "q64_array_numeric",
    oracle="""
    WITH e AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
               FROM embeddings)
    SELECT vec_id, label,
           CAST(len(emb) AS INT)                                AS dim,
           round(list_aggregate(emb, 'max'), 5)                 AS mx,
           round(list_aggregate(emb, 'min'), 5)                 AS mn,
           round(list_aggregate(emb, 'sum'), 5)                 AS total,
           round(list_dot_product(emb, emb), 5)                 AS norm_sq
    FROM e WHERE vec_id < 100 ORDER BY vec_id
    """,
)
def q64_array_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_max/array_min (reference functions/array.rs:182-229) plus
    higher-order aggregate/zip_with (the scale path for vector math — JVM
    codegen, no Python roundtrip)."""
    e = table(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(emb, emb, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    return (
        e.filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            "label",
            F.size("embedding").alias("dim"),
            F.round(F.array_max(emb), 5).alias("mx"),
            F.round(F.array_min(emb), 5).alias("mn"),
            F.round(F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x), 5).alias("total"),
            F.round(dot, 5).alias("norm_sq"),
        )
        .orderBy("vec_id")
    )


@query(
    "q65_map_functions",
    oracle="""
    WITH m AS (
      SELECT doc_id, lang, source, n_chars,
             map(['lang', 'source'], [lang, source]) AS meta
      FROM documents
    )
    SELECT doc_id,
           array_to_string(map_keys(meta), '|')     AS meta_keys,
           array_to_string(map_values(meta), '|')   AS meta_values,
           map_extract(meta, 'lang')[1]              AS lang_val
    FROM m WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def q65_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_from_arrays/map_keys/map_values/element_at (reference stubs
    functions/array.rs:408-412; MapType absent from its data model §1.3 —
    declared intent honoured with Spark's MapType)."""
    d = table(spark, sf_dir, "documents")
    meta = F.map_from_arrays(
        F.array(F.lit("lang"), F.lit("source")), F.array(F.col("lang"), F.col("source"))
    )
    return (
        d.filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.array_join(F.map_keys(meta), "|").alias("meta_keys"),
            F.array_join(F.map_values(meta), "|").alias("meta_values"),
            F.element_at(meta, "lang").alias("lang_val"),
        )
        .orderBy("doc_id")
    )


@query(
    "q120_map_hof",
    oracle="""
    SELECT o_orderkey,
           round(o_totalprice, 2) * 2                          AS tv_p,
           'K,P'                                               AS tk_keys,
           CASE WHEN round(o_totalprice, 2) > 150000 THEN 1 ELSE 0 END
             + CASE WHEN o_orderkey * 1.0 > 150000 THEN 1 ELSE 0 END AS mf_n,
           round(o_totalprice, 2) + o_orderkey * 1.0           AS mzw_p
    FROM orders WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def q120_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order map functions — transform_values, transform_keys,
    map_filter, map_zip_with (the lambda-taking family beyond q65's map
    constructors).  Outputs are flattened to scalars because MapType has no
    cross-engine canonical order to hash; the oracle states each result
    algebraically from the map's known entries.

    Scale: all four are elementwise codegen'd expressions — no shuffle, no
    Python.
    """
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    m = F.create_map(
        F.lit("p"), F.round("o_totalprice", 2),
        F.lit("k"), F.col("o_orderkey") * 1.0,
    )
    tv = F.transform_values(m, lambda k, v: v * 2)
    tk = F.transform_keys(m, lambda k, v: F.upper(k))
    mf = F.map_filter(m, lambda k, v: v > 150000)
    m2 = F.create_map(
        F.lit("p"), F.col("o_orderkey") * 1.0,
        F.lit("k"), F.round("o_totalprice", 2),
    )
    mzw = F.map_zip_with(m, m2, lambda k, v1, v2: v1 + v2)
    return o.select(
        "o_orderkey",
        F.element_at(tv, "p").alias("tv_p"),
        F.array_join(F.array_sort(F.map_keys(tk)), ",").alias("tk_keys"),
        F.size(mf).alias("mf_n"),
        F.element_at(mzw, "p").alias("mzw_p"),
    ).orderBy("o_orderkey")


@query(
    "q121_array_hof2",
    oracle="""
    WITH t AS (
      SELECT l_orderkey, l_linenumber,
             [l_quantity, l_discount * 100, l_tax * 100] AS arr
      FROM lineitem WHERE l_orderkey < 300
    )
    SELECT l_orderkey, l_linenumber,
           len(list_filter(arr, x -> x < 0)) = 0                    AS all_pos,
           len(list_filter(arr, x -> x > 40)) > 0                   AS any_big,
           CAST(len(list_filter(arr, x -> x < 10)) AS INT)          AS n_small,
           round(coalesce(list_aggregate(list_filter(arr, x -> x > 5), 'sum'), 0), 4)
                                                                    AS big_sum
    FROM t ORDER BY l_orderkey, l_linenumber
    """,
)
def q121_array_hof2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array predicate/filter higher-order functions — forall, exists,
    filter, and a filter→aggregate fold (q64 covered transform/aggregate/
    zip_with).  DuckDB states forall/exists as empty/non-empty list_filter.

    Scale: elementwise codegen, no shuffle — the same class as every HOF op.
    """
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    arr = F.array(
        F.col("l_quantity"), F.col("l_discount") * 100, F.col("l_tax") * 100
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.forall(arr, lambda x: x >= 0).alias("all_pos"),
        F.exists(arr, lambda x: x > 40).alias("any_big"),
        F.size(F.filter(arr, lambda x: x < 10)).alias("n_small"),
        F.round(
            F.aggregate(
                F.filter(arr, lambda x: x > 5), F.lit(0.0), lambda acc, x: acc + x
            ),
            4,
        ).alias("big_sum"),
    ).orderBy("l_orderkey", "l_linenumber")
