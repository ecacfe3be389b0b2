"""Link-graph operators: fixed-point PageRank.

Web-corpus pipelines weight documents by host/link authority (Common
Crawl-style harmonic/PageRank scores) before sampling; this is that step,
expressed Spark-first.  Extends the reference's surface (no graph ops there;
the connected-components family lives in operators/dedup.py and this module
shares its iterative shape — see dup_clusters / large-star small-star).

Determinism: ranks are **fixed-point integers** (``scale`` = 1e6 by
default), every update is integer multiply / integer ``div`` / integer sum.
Integer sums are associative, so the result is bit-identical regardless of
partitioning, retry history, or engine — floating-point PageRank is not
reproducible across retries on a real cluster (partial-sum order changes),
which matters when the scores feed a deterministic sampling cutoff
downstream (training.stratified_sample / weighted_sample).

Scale shape per iteration (the classic Spark PageRank layout):

* ``edges`` (with out-degree attached) are hash-partitioned by ``src`` ONCE
  and persisted — every iteration's rank join reuses that partitioning, so
  only the O(nodes) rank table moves per round, never the O(edges) table.
* contributions aggregate map-side into a dst-keyed shuffle of O(nodes) rows.
* lineage is truncated with ``localCheckpoint`` every ``checkpoint_every``
  rounds (same OOM guard as dedup.dup_clusters; plan depth stays bounded).

Dangling nodes (no out-links) follow the standard simplification: their mass
is dropped rather than redistributed, so ranks are a lower bound; the
teleport term keeps every node >= base.  Callers who need the stochastic
variant can add a dangling-mass accumulator (one 1-row aggregate per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cache import persist_tracked

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    n_iter: int = 2,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
    checkpoint_every: int = 5,
    redistribute_dangling: bool = False,
) -> DataFrame:
    """Iterative fixed-point PageRank over an edge list.

    Returns ``(node, r)`` where ``r`` is the integer rank after ``n_iter``
    rounds of ``r[v] = base + sum_{u->v} (damping_num * r[u]) div
    (damping_den * outdeg[u])`` with ``base = scale - scale * damping_num
    div damping_den`` and all-``scale`` initialization.

    ``redistribute_dangling=True`` adds the stochastic-matrix correction:
    each round, the damped rank mass of out-degree-0 nodes is shared
    equally (integer div) across all nodes — one extra 1-row aggregate per
    round (the dangling total), still exact integer arithmetic, so total
    mass is conserved up to div truncation instead of leaking.
    """
    if n_iter <= 0:
        raise ValueError(f"n_iter must be positive, got {n_iter}")
    if not (0 < damping_num < damping_den):
        raise ValueError("damping must satisfy 0 < num < den")
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    nodes = persist_tracked(nodes)
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__outdeg"))
    e = persist_tracked(
        edges.join(deg, src)
        .select(F.col(src).alias("__esrc"), F.col(dst).alias("node"), "__outdeg")
        .repartition(F.col("__esrc"))
    )
    base = scale - (scale * damping_num) // damping_den
    ranks = nodes.withColumn("r", F.lit(scale).cast("bigint"))
    contrib_expr = F.expr(f"({damping_num} * __r) div ({damping_den} * __outdeg)")
    if redistribute_dangling:
        n_nodes = nodes.count()
        dangling = persist_tracked(
            nodes.join(deg.select(F.col(src).alias("node")), "node", "left_anti")
        )
    for i in range(n_iter):
        rsrc = ranks.select(F.col("node").alias("__esrc"), F.col("r").alias("__r"))
        sums = (
            e.join(rsrc, "__esrc")
            .select("node", contrib_expr.alias("__c"))
            .groupBy("node")
            .agg(F.sum("__c").alias("__s"))
        )
        share = 0
        if redistribute_dangling:
            row = dangling.join(ranks, "node").agg(F.sum("r").alias("t")).collect()[0]
            # damped dangling mass, split equally: exact integer arithmetic
            share = (damping_num * int(row["t"] or 0)) // (damping_den * n_nodes)
        ranks = nodes.join(sums, "node", "left").select(
            "node",
            (F.lit(base + share) + F.coalesce(F.col("__s"), F.lit(0)))
            .cast("bigint")
            .alias("r"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iter:
            ranks = ranks.localCheckpoint()
    return ranks
