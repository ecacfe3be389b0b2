"""Tests for operators/ranking.py (tf-idf, BM25), operators/graph.py
(fixed-point PageRank) and training.weighted_sample."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rust_dataframe_spark.operators import ranking as rk
from rust_dataframe_spark.operators import training as tr
from rust_dataframe_spark.operators.cache import release
from rust_dataframe_spark.operators.graph import pagerank


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a c"),
            (2, "a b"),
            (3, "c c c d"),
        ],
        ["id", "text"],
    )


class TestTfIdf:
    def test_rare_term_outranks_common(self, spark):
        out = rk.tfidf_top_terms(_docs(spark), "id", "text", top_n=1)
        top = {r["id"]: r["term"] for r in out.collect()}
        # 'a' appears in 2 docs, 'c' in 2, 'b' in 2, 'd' in 1 -> doc 3's top
        # term must be the doc-unique 'd'... unless tf dominates: tf(c)=3.
        # idf_ratio(d) = (3-1+0.5)/1.5 = 5/3; score(d)=5/3.
        # idf_ratio(c) = (3-2+0.5)/2.5 = 0.6; score(c)=1.8 > 5/3.
        assert top[3] == "c"
        # doc 2: both terms tf=1, df=2 -> tie on score, term asc wins.
        assert top[2] == "a"

    def test_top_n_bounds_rows(self, spark):
        out = rk.tfidf_top_terms(_docs(spark), "id", "text", top_n=2)
        counts = out.groupBy("id").count().collect()
        assert all(r["count"] <= 2 for r in counts)

    def test_validates(self, spark):
        with pytest.raises(ValueError):
            rk.tfidf_top_terms(_docs(spark), "id", "text", top_n=0)


class TestBm25:
    def test_matching_docs_only_and_monotone_tf(self, spark):
        docs = spark.createDataFrame(
            [(1, "x x x y"), (2, "x y"), (3, "y z")], ["id", "text"]
        )
        out = {r["id"]: r["score"] for r in rk.bm25_score(docs, "id", "text", ["x"]).collect()}
        assert set(out) == {1, 2}
        # same dl=4 vs 2 penalizes doc1 a bit, but tf 3 vs 1 dominates with k1=1.2
        assert out[1] > out[2] > 0
        rk.bm25_score(docs, "id", "text", ["x"])  # idempotent build

    def test_validates(self, spark):
        d = _docs(spark)
        with pytest.raises(ValueError):
            rk.bm25_score(d, "id", "text", [])
        with pytest.raises(ValueError):
            rk.bm25_score(d, "id", "text", ["a", "a"])


class TestPagerank:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, ["src", "dst"])

    def test_star_exact_fixed_point(self, spark):
        # star: everyone points at 0; integer arithmetic makes ranks exact
        e = self._edges(spark, [(1, 0), (2, 0), (3, 0)])
        r = {row["node"]: row["r"] for row in pagerank(e, n_iter=2).collect()}
        release()
        base = 150_000
        # spokes have no in-links -> base after every iteration
        assert r[1] == r[2] == r[3] == base
        # iter2 hub: base + 3 * (85 * base) div 100
        assert r[0] == base + 3 * ((85 * base) // 100)

    def test_partitioning_invariant_bit_identical(self, spark):
        # the fixed-point claim: result independent of physical layout
        import random

        rng = random.Random(7)
        rows = list({(rng.randrange(40), rng.randrange(40)) for _ in range(300)})
        rows = [(a, b) for a, b in rows if a != b]
        e1 = self._edges(spark, rows)
        e2 = self._edges(spark, rows).repartition(17)
        r1 = sorted(map(tuple, pagerank(e1, n_iter=3).collect()))
        r2 = sorted(map(tuple, pagerank(e2, n_iter=3).collect()))
        release()
        assert r1 == r2

    def test_mass_bounds(self, spark):
        e = self._edges(spark, [(1, 2), (2, 3), (3, 1)])
        ranks = pagerank(e, n_iter=4).collect()
        release()
        # cycle with outdeg 1 everywhere: scale is the exact fixed point
        # (base + 85% of scale == scale), preserved bit-for-bit each round
        for row in ranks:
            assert row["r"] == 1_000_000

    def test_validates(self, spark):
        e = self._edges(spark, [(1, 2)])
        with pytest.raises(ValueError):
            pagerank(e, n_iter=0)
        with pytest.raises(ValueError):
            pagerank(e, damping_num=100, damping_den=100)


class TestWeightedSample:
    def test_extremes(self, spark):
        df = spark.range(200).withColumn("w1", F.lit(5.0)).withColumn("w0", F.lit(-1.0))
        assert tr.weighted_sample(df, "id", F.col("w1")).count() == 200  # clamp to 1
        assert tr.weighted_sample(df, "id", F.col("w0")).count() == 0  # clamp to 0

    def test_rate_tracks_weight(self, spark):
        df = spark.range(4000).withColumn("w", F.lit(0.25))
        n = tr.weighted_sample(df, "id", F.col("w"), salt="t").count()
        assert 800 <= n <= 1200  # ~1000 expected

    def test_deterministic_and_salt_sensitive(self, spark):
        df = spark.range(1000).withColumn("w", F.lit(0.5))
        a = {r["id"] for r in tr.weighted_sample(df, "id", F.col("w"), salt="s1").collect()}
        b = {r["id"] for r in tr.weighted_sample(df, "id", F.col("w"), salt="s1").collect()}
        c = {r["id"] for r in tr.weighted_sample(df, "id", F.col("w"), salt="s2").collect()}
        assert a == b
        assert a != c


class TestKmeansParallelInit:
    def _emb(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def test_returns_k_centroids_and_feeds_kmeans(self, spark):
        e = self._emb(spark)
        init = tr.kmeans_parallel_init(e, "vec_id", "embedding", k=6, rounds=2)
        assert [cid for cid, _ in init] == list(range(6))
        dim = len(e.select("embedding").first()["embedding"])
        assert all(len(cv) == dim for _, cv in init)
        cents, assigned = tr.kmeans(e, "vec_id", "embedding", k=6, n_iter=1, init=init)
        cells = {r["cell"] for r in assigned.collect()}
        assert cells <= set(range(6))
        assert assigned.count() == e.count()

    def test_deterministic_for_fixed_input(self, spark):
        e = self._emb(spark)
        a = tr.kmeans_parallel_init(e, "vec_id", "embedding", k=4, rounds=2)
        b = tr.kmeans_parallel_init(e, "vec_id", "embedding", k=4, rounds=2)
        assert a == b

    def test_beats_first_k_init_cost(self, spark):
        from rust_dataframe_spark.operators.training import _angular_cost

        e = self._emb(spark)
        k = 8
        kmpp = [cv for _, cv in tr.kmeans_parallel_init(e, "vec_id", "embedding", k=k)]
        first = [
            [float(x) for x in r["embedding"]]
            for r in e.orderBy("vec_id").limit(k).collect()
        ]

        def cost(centers):
            return e.select(
                _angular_cost("embedding", centers).alias("c")
            ).agg(F.sum("c")).collect()[0][0]

        # oversampled + weighted-greedy init should not be worse than the
        # arbitrary first-k baseline (wide margin: guards gross regressions)
        assert cost(kmpp) <= cost(first) * 1.05

    def test_validates(self, spark):
        e = self._emb(spark)
        with pytest.raises(ValueError):
            tr.kmeans_parallel_init(e, "vec_id", "embedding", k=0)
        with pytest.raises(ValueError):
            tr.kmeans(e, "vec_id", "embedding", k=3, init=[(0, [1.0])])


class TestPostingLists:
    def test_sorted_and_df_consistent(self, spark):
        out = rk.posting_lists(_docs(spark), "id", "text").collect()
        by_term = {r["term"]: r for r in out}
        assert by_term["a"]["postings"] == [1, 2]
        assert by_term["d"]["postings"] == [3]
        for r in out:
            assert r["df"] == len(r["postings"])
            assert r["postings"] == sorted(r["postings"])

    def test_min_df_prunes(self, spark):
        out = rk.posting_lists(_docs(spark), "id", "text", min_df=2).collect()
        assert {r["term"] for r in out} == {"a", "b", "c"}
        with pytest.raises(ValueError):
            rk.posting_lists(_docs(spark), "id", "text", min_df=0)


class TestBigramLift:
    def test_counts_and_lift(self, spark):
        docs = spark.createDataFrame(
            [(1, "x y x y"), (2, "x y z"), (3, "q")], ["id", "text"]
        )
        # bigrams: (x,y)x2, (y,x)x1 from doc1; (x,y), (y,z) from doc2; none from doc3
        out = {(r["w1"], r["w2"]): r for r in
               rk.bigram_lift(docs, "id", "text", min_count=1).collect()}
        assert out[("x", "y")]["n_xy"] == 3
        # T=5, n_x.(x)=3, n_.y(y)=3 -> lift = 15/9
        assert abs(out[("x", "y")]["lift"] - 15 / 9) < 1e-12
        assert ("q", "q") not in out  # single-word doc contributes nothing

    def test_min_count_filters(self, spark):
        docs = spark.createDataFrame([(1, "x y x y"), (2, "x y z")], ["id", "text"])
        out = rk.bigram_lift(docs, "id", "text", min_count=3).collect()
        assert {(r["w1"], r["w2"]) for r in out} == {("x", "y")}


class TestKeepCanonical:
    def test_singletons_and_winner(self, spark):
        from rust_dataframe_spark.operators import dedup as dd

        df = spark.createDataFrame(
            [(1, "short"), (2, "longer text"), (3, "solo")], ["doc_id", "text"]
        )
        clusters = spark.createDataFrame([(1, 1), (2, 1)], ["doc_id", "cluster_id"])
        out = dd.keep_canonical(
            df, clusters, "doc_id", [F.length("text").desc(), F.col("doc_id").asc()]
        )
        rows = {r["cluster_id"]: r for r in out.collect()}
        assert rows[1]["doc_id"] == 2 and rows[1]["n_members"] == 2  # longest wins
        assert rows[3]["doc_id"] == 3 and rows[3]["n_members"] == 1  # singleton


class TestTakePerStratum:
    def test_exact_k_and_deterministic(self, spark):
        df = spark.range(100).withColumn("s", (F.col("id") % 3).cast("string"))
        a = tr.take_per_stratum(df, "id", "s", 7, salt="x")
        assert a.groupBy("s").count().collect()[0]["count"] == 7
        assert a.count() == 21
        b = tr.take_per_stratum(df, "id", "s", 7, salt="x")
        assert sorted(r["id"] for r in a.collect()) == sorted(r["id"] for r in b.collect())

    def test_small_stratum_keeps_all(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")], ["id", "s"])
        out = tr.take_per_stratum(df, "id", "s", 5)
        assert out.count() == 3
        with pytest.raises(ValueError):
            tr.take_per_stratum(df, "id", "s", 0)


class TestPagerankDangling:
    def test_mass_conserved_with_redistribution(self, spark):
        # 1 -> 2 -> 3 (3 dangles): without redistribution mass leaks,
        # with it total stays within div-truncation of n * scale
        e = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
        leak = pagerank(e, n_iter=3)
        cons = pagerank(e, n_iter=3, redistribute_dangling=True)
        total_leak = sum(r["r"] for r in leak.collect())
        total_cons = sum(r["r"] for r in cons.collect())
        release()
        n, scale = 3, 1_000_000
        assert total_leak < n * scale - 100_000  # visible leak
        assert n * scale - 10 <= total_cons <= n * scale  # truncation only

    def test_no_dangling_nodes_identical(self, spark):
        e = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], ["src", "dst"])
        a = sorted(map(tuple, pagerank(e, n_iter=2).collect()))
        b = sorted(map(tuple, pagerank(e, n_iter=2, redistribute_dangling=True).collect()))
        release()
        assert a == b


class TestConstraintAudit:
    def test_counts_violations(self, spark):
        from rust_dataframe_spark.operators import observability as ob

        df = spark.createDataFrame(
            [(1, 5.0), (2, -1.0), (3, None)], ["id", "v"]
        )
        out = {r["rule"]: r for r in ob.constraint_audit(
            df, {"v_pos": F.col("v") > 0, "v_notnull": F.col("v").isNotNull()}
        ).collect()}
        assert out["v_pos"]["n_rows"] == 3
        assert out["v_pos"]["n_pass"] == 1          # null fails the predicate
        assert out["v_pos"]["n_fail"] == 2
        assert out["v_notnull"]["n_pass"] == 2
        with pytest.raises(ValueError):
            ob.constraint_audit(df, {})

    def test_referential_orphans(self, spark):
        from rust_dataframe_spark.operators import observability as ob

        child = spark.createDataFrame([(1,), (2,), (9,)], ["fk"])
        parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
        r = ob.referential_orphans(child, parent, "fk", "pk", rule="fk").collect()[0]
        assert (r["n_rows"], r["n_pass"], r["n_fail"]) == (3, 2, 1)


class TestSnapshotDiff:
    def test_classification_and_null_safety(self, spark):
        from rust_dataframe_spark.operators.merge import snapshot_diff

        old = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, None), (4, "d")], ["k", "v"]
        )
        new = spark.createDataFrame(
            [(2, "B"), (3, None), (4, "d"), (5, "e")], ["k", "v"]
        )
        out = {r["k"]: r["change_type"] for r in snapshot_diff(old, new, "k").collect()}
        assert out == {1: "removed", 2: "changed", 3: "unchanged", 4: "unchanged", 5: "added"}

    def test_compare_cols_validation(self, spark):
        from rust_dataframe_spark.operators.merge import snapshot_diff

        old = spark.createDataFrame([(1, "a")], ["k", "v"])
        new = spark.createDataFrame([(1, "a")], ["k", "v"])
        with pytest.raises(ValueError):
            snapshot_diff(old, new, "k", compare_cols=["nope"])


class TestEmptyInputs:
    """Operators must degrade to empty results, not crash, on empty frames
    (a filtered-to-nothing partition is normal at 100 TB)."""

    def test_ranking_ops_empty(self, spark):
        e = spark.createDataFrame([], "id bigint, text string")
        assert rk.tfidf_top_terms(e, "id", "text").count() == 0
        assert rk.bm25_score(e, "id", "text", ["x"]).count() == 0
        assert rk.posting_lists(e, "id", "text").count() == 0
        assert rk.bigram_lift(e, "id", "text").count() == 0

    def test_pagerank_empty_edges(self, spark):
        e = spark.createDataFrame([], "src bigint, dst bigint")
        assert pagerank(e, n_iter=1).count() == 0
        release()

    def test_sampling_ops_empty(self, spark):
        e = spark.createDataFrame([], "id bigint, s string, w double")
        assert tr.weighted_sample(e, "id", F.col("w")).count() == 0
        assert tr.take_per_stratum(e, "id", "s", 3).count() == 0


class TestSamplingMonotonicity:
    """Deterministic-draw invariants: for a fixed (key, salt), raising the
    keep probability can only ADD rows — the property that makes staged
    rollouts (sample 1% -> 10% -> 100%) supersets of each other."""

    def test_weighted_sample_monotone_in_weight(self, spark):
        df = spark.range(2000)
        lo = {r["id"] for r in tr.weighted_sample(df, "id", F.lit(0.2), salt="m").collect()}
        hi = {r["id"] for r in tr.weighted_sample(df, "id", F.lit(0.6), salt="m").collect()}
        assert lo <= hi and len(lo) < len(hi)

    def test_take_per_stratum_monotone_in_k(self, spark):
        df = spark.range(300).withColumn("s", (F.col("id") % 4).cast("string"))
        k3 = {r["id"] for r in tr.take_per_stratum(df, "id", "s", 3, salt="m").collect()}
        k9 = {r["id"] for r in tr.take_per_stratum(df, "id", "s", 9, salt="m").collect()}
        assert k3 <= k9 and len(k3) == 12 and len(k9) == 36

    def test_stratified_subset_of_weighted_equivalent(self, spark):
        # stratified_sample at rate p == weighted_sample with constant p:
        # identical draw, identical cutoff arithmetic -> identical rows
        df = spark.range(1000).withColumn("g", F.lit("x"))
        a = {r["id"] for r in tr.stratified_sample(df, "id", "g", {"x": 0.3}, salt="m").collect()}
        b = {r["id"] for r in tr.weighted_sample(df, "id", F.lit(0.3), salt="m").collect()}
        assert a == b


# --- round 4: triangles / sweep-line / BPE pairs ---------------------------


def test_triangle_count_known_graphs(spark):
    from rust_dataframe_spark.operators.graph import triangle_count

    # K4 has 4 triangles; listing edges in arbitrary orientation with a dup
    k4 = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 3)], ["u", "v"]
    )
    assert triangle_count(k4).collect()[0]["n_triangles"] == 4
    # a 4-cycle has none
    c4 = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (4, 1)], ["u", "v"])
    assert triangle_count(c4).collect()[0]["n_triangles"] == 0
    # self-loops are ignored
    loop = spark.createDataFrame([(1, 1), (1, 2), (2, 3), (1, 3)], ["u", "v"])
    assert triangle_count(loop).collect()[0]["n_triangles"] == 1


def test_cooccurrence_edges_support(spark):
    from rust_dataframe_spark.operators.graph import cooccurrence_edges

    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b"), (2, "c")],
        ["g", "item"],
    )
    rows = {(r["u"], r["v"]): r["support"]
            for r in cooccurrence_edges(df, "g", "item").collect()}
    # duplicate (1, b) must not inflate support; canonical u < v
    assert rows == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}
    strong = cooccurrence_edges(df, "g", "item", min_support=2).collect()
    assert [(r["u"], r["v"]) for r in strong] == [("a", "b")]


def test_max_concurrency_half_open(spark):
    import datetime

    from rust_dataframe_spark.operators.temporal import max_concurrency

    t = lambda sec: datetime.datetime(2024, 1, 1, 0, 0, sec)
    df = spark.createDataFrame(
        [
            ("a", t(0), t(10)),  # back-to-back: [0,10) then [10,20)
            ("a", t(10), t(20)),
            ("b", t(0), t(10)),  # true overlap
            ("b", t(5), t(15)),
            ("b", t(9), t(12)),
        ],
        ["g", "s", "e"],
    )
    got = {r["g"]: r["max_concurrent"] for r in max_concurrency(df, "g", "s", "e").collect()}
    assert got == {"a": 1, "b": 3}  # touching endpoints never overlap


def test_bpe_pair_counts_known(spark):
    from rust_dataframe_spark.operators.text import bpe_pair_counts

    df = spark.createDataFrame(
        [("abab abab",), ("xy! AB?",)], ["text"]
    )
    got = {r["pair"]: r["cnt"] for r in bpe_pair_counts(df, "text").collect()}
    # 'abab' x2 occurrences -> 1 distinct word, corpus count 2: ab x2, ba x1 per word
    assert got == {"ab": 2 * 2 + 1, "ba": 1 * 2, "xy": 1}


def test_max_concurrency_bucketed_matches_single_level(spark):
    """The two-level (bucketed) sweep must equal the single-level sweep,
    including intervals that straddle bucket boundaries."""
    import datetime

    from rust_dataframe_spark.operators.temporal import max_concurrency

    base = datetime.datetime(2024, 1, 1)
    h = datetime.timedelta
    df = spark.createDataFrame(
        [
            # day-straddling pile-up: 3 concurrent across midnight
            ("a", base + h(hours=22), base + h(hours=26)),
            ("a", base + h(hours=23), base + h(hours=25)),
            ("a", base + h(hours=23, minutes=30), base + h(hours=24, minutes=30)),
            ("a", base + h(hours=48), base + h(hours=49)),
            # peak entirely inside day 2
            ("b", base + h(hours=30), base + h(hours=31)),
            ("b", base + h(hours=30), base + h(hours=31)),
        ],
        ["g", "s", "e"],
    )
    flat = {r["g"]: r["max_concurrent"]
            for r in max_concurrency(df, "g", "s", "e").collect()}
    bucketed = {r["g"]: r["max_concurrent"]
                for r in max_concurrency(df, "g", "s", "e", bucket="day").collect()}
    assert flat == bucketed == {"a": 3, "b": 2}


def test_label_propagation_two_communities(spark):
    from rust_dataframe_spark.operators.graph import label_propagation

    # two K4s bridged by one weak edge: plurality beats the bridge, so the
    # communities stay separate (triangles are too sparse — there the
    # all-count-1 tie-break drags the small label across the bridge)
    k4a = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    k4b = [(10, 11), (10, 12), (10, 13), (11, 12), (11, 13), (12, 13)]
    edges = spark.createDataFrame(k4a + k4b + [(4, 10)], ["u", "v"])
    lab = {r["node"]: r["label"]
           for r in label_propagation(edges, rounds=4).collect()}
    assert lab[1] == lab[2] == lab[3] == lab[4] == 1
    assert lab[10] == lab[11] == lab[12] == lab[13] == 10


def test_label_propagation_plurality_tiebreak(spark):
    from rust_dataframe_spark.operators.graph import label_propagation

    # star: center 5 sees neighbors {1, 2, 3} all count 1 -> smallest label
    edges = spark.createDataFrame([(5, 1), (5, 2), (5, 3)], ["u", "v"])
    lab = {r["node"]: r["label"]
           for r in label_propagation(edges, rounds=1).collect()}
    assert lab[5] == 1
    # leaves each see only the center -> adopt 5
    assert lab[1] == lab[2] == lab[3] == 5


def test_sssp_known_path(spark):
    from rust_dataframe_spark.operators.graph import sssp

    # 1 -2.0-> 2 -3.0-> 3 ; 1 -10.0-> 3 ; directed
    edges = spark.createDataFrame(
        [(1, 2, 2.0), (2, 3, 3.0), (1, 3, 10.0)], ["src", "dst", "w"]
    )
    seeds = spark.createDataFrame([(1,)], ["node"])
    d = {r["node"]: r["dist"] for r in
         sssp(edges, seeds=seeds, rounds=4).collect()}
    assert d == {1: 0.0, 2: 2.0, 3: 5.0}
    # round-bounded contract: with rounds=1 only direct edges relax
    d1 = {r["node"]: r["dist"] for r in
          sssp(edges, seeds=seeds, rounds=1).collect()}
    assert d1 == {1: 0.0, 2: 2.0, 3: 10.0}


def test_sssp_multi_seed_min(spark):
    from rust_dataframe_spark.operators.graph import sssp

    edges = spark.createDataFrame(
        [(1, 5, 4.0), (2, 5, 1.0), (5, 6, 1.0)], ["src", "dst", "w"]
    )
    seeds = spark.createDataFrame([(1,), (2,)], ["node"])
    d = {r["node"]: r["dist"] for r in
         sssp(edges, seeds=seeds, rounds=3).collect()}
    assert d[5] == 1.0 and d[6] == 2.0  # best seed wins


def test_association_rules_known(spark):
    from rust_dataframe_spark.operators.ranking import association_rules

    # 4 baskets: a,b together in 2; c alone once; duplicate (1,a) row ignored
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b"),
            (3, "a"), (4, "c")]
    df = spark.createDataFrame(rows, ["bk", "it"])
    out = {(r["antecedent"], r["consequent"]):
           (r["support_n"], r["confidence"], r["lift"])
           for r in association_rules(df, "bk", "it",
                                      min_support_frac=0.0).collect()}
    # supp a=3, b=2, ab=2, N=4
    assert out[("a", "b")] == (2, 2 / 3, (2 * 4) / (3 * 2))
    assert out[("b", "a")] == (2, 1.0, (2 * 4) / (3 * 2))
    assert ("a", "c") not in out  # never co-occur
    # min_support prune: c (1/4 = 0.25) drops below 0.3 and with it
    # any pair involving it; a,b survive
    pruned = association_rules(df, "bk", "it", min_support_frac=0.3)
    ants = {r["antecedent"] for r in pruned.collect()}
    assert ants == {"a", "b"}
    # min_confidence filter keeps only the b->a direction
    conf = association_rules(df, "bk", "it", min_support_frac=0.0,
                             min_confidence=0.9).collect()
    assert [(r["antecedent"], r["consequent"]) for r in conf] == [("b", "a")]


def test_k_core_peels_tail(spark):
    from rust_dataframe_spark.operators.graph import k_core

    # K4 core plus a pendant chain: 2-core strips the chain, keeps K4
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    chain = [(4, 5), (5, 6)]
    edges = spark.createDataFrame(k4 + chain, ["u", "v"])
    out = {r["node"]: r["deg"] for r in k_core(edges, k=2, rounds=3).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}  # degree AFTER pruning

    # cascade: removing 6 (deg 1) leaves 5 at deg 1 -> next round removes it
    one_round = {r["node"] for r in k_core(edges, k=2, rounds=1).collect()}
    assert 5 in one_round and 6 not in one_round  # round-exact contract

    # k=4: nothing in this graph survives
    assert k_core(edges, k=4, rounds=3).count() == 0

    import pytest

    with pytest.raises(ValueError):
        k_core(edges, k=0)
