"""Grid-cell spatial join — radius-bounded point-pair search.

The all-pairs "which points are within r of each other" question is O(n²)
written naively; the distributed classic is **grid bucketing**: hash every
point into a square cell of side ``r``, and any pair within distance r is
guaranteed to fall in the same or an adjacent cell (3×3 neighborhood).  The
join key becomes the cell id, the candidate set per point is bounded by
local density (not n), and verification (exact distance) runs only on
candidates — the same bucket-then-verify discipline as the LSH/SRP dedup
family (operators/dedup.py, operators/similarity.py).

Scale: one explode(×9) on the left side, one shuffle keyed by cell, exact
distance check in whole-stage codegen.  Dense cells are data skew — AQE
skew-join splitting applies because the join is a plain equi-join on the
cell key.  Cell side = r is optimal for this 9-cell scheme; at planetary
scale swap the flat grid for a hierarchical one (geohash prefixes) with the
same neighborhood algebra.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, functions as F

__all__ = ["grid_neighbor_pairs", "dbscan"]


def grid_neighbor_pairs(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    *,
    radius: float,
) -> DataFrame:
    """All unordered point pairs with Euclidean distance < ``radius``.

    Returns ``(id_a, id_b, dist)`` with ``id_a < id_b``, one row per
    qualifying pair (each pair found exactly once: the left side explodes
    into its 9 neighbor cells, the right side stays in its true cell, and
    the ``id_a < id_b`` predicate dedups the symmetric hit).
    """
    pts = df.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).alias("px"),
        F.col(y_col).alias("py"),
        F.floor(F.col(x_col) / F.lit(radius)).alias("cx"),
        F.floor(F.col(y_col) / F.lit(radius)).alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in itertools.product((-1, 0, 1), repeat=2)
        ]
    )
    left = pts.select(
        F.col("pid").alias("id_a"),
        F.col("px").alias("xa"),
        F.col("py").alias("ya"),
        F.explode(offsets).alias("o"),
        "cx",
        "cy",
    ).select(
        "id_a",
        "xa",
        "ya",
        (F.col("cx") + F.col("o.dx")).alias("jx"),
        (F.col("cy") + F.col("o.dy")).alias("jy"),
    )
    right = pts.select(
        F.col("pid").alias("id_b"),
        F.col("px").alias("xb"),
        F.col("py").alias("yb"),
        F.col("cx").alias("jx"),
        F.col("cy").alias("jy"),
    )
    dist = F.sqrt(
        (F.col("xa") - F.col("xb")) ** 2 + (F.col("ya") - F.col("yb")) ** 2
    )
    return (
        left.join(right, ["jx", "jy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("dist"))
        .filter(F.col("dist") < radius)
    )


def dbscan(
    df: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    *,
    eps: float,
    min_pts: int,
) -> DataFrame:
    """Grid-bucketed DBSCAN: density clustering as a composition of the
    two primitives this repo already runs at scale — the 3x3 grid-cell
    radius join above (candidate-then-verify neighbor search, O(local
    density) per point) and large-star/small-star connected components
    (operators/dedup.dup_clusters_star, O(log^2 n) rounds on any graph
    shape).  No KD-trees, no driver-side region growing: the classic
    single-node DBSCAN recursion is replaced by one CC pass over the
    core-core epsilon graph, which computes the identical clustering
    (a DBSCAN cluster IS a connected component of core points, plus
    their borders).

    Contract (strict ``dist < eps`` neighborhoods, matching
    :func:`grid_neighbor_pairs`):

    * **core**  — at least ``min_pts`` points within eps (self included);
      carries ``cluster_id`` = min core id of its component.
    * **border** — non-core with >= 1 core neighbor; joins its MINIMUM
      core neighbor's cluster (deterministic tie-break — plain DBSCAN
      leaves border assignment order-dependent, which would break the
      cross-engine exact gate).
    * **noise** — neither; ``cluster_id`` NULL.

    Returns ``(id, role, cluster_id)``.  Scale: one grid equi-join for
    neighbors (AQE-splittable on hot cells), integer degree counts,
    CC over the core subgraph only (edges bounded by true near-pairs,
    the same graph LSH dedup clusters), one broadcast-friendly label
    join back to borders.
    """
    from .dedup import dup_clusters_star

    pairs = grid_neighbor_pairs(df, id_col, x_col, y_col, radius=eps).select(
        "id_a", "id_b"
    )
    from .cache import persist_tracked

    pairs = persist_tracked(pairs)
    sym = pairs.unionByName(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    deg = sym.groupBy(F.col("id_a").alias("pid")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nb")
    )
    pts = df.select(F.col(id_col).alias("pid"))
    roles = persist_tracked(
        pts.join(deg, "pid", "left").select(
            "pid",
            ((F.coalesce(F.col("nb"), F.lit(0)) + 1) >= min_pts).alias(
                "is_core"
            ),
        )
    )
    core_ids = roles.filter("is_core").select(F.col("pid").alias("cid"))
    core_edges = (
        pairs.join(core_ids, pairs.id_a == core_ids.cid)
        .drop("cid")
        .join(core_ids, pairs.id_b == core_ids.cid)
        .drop("cid")
    )
    comp = dup_clusters_star(core_edges, "id_a", "id_b").select(
        F.col("doc_id").alias("pid"), "cluster_id"
    )
    # isolated cores (density from non-core neighbors only) root themselves
    core_labeled = (
        roles.filter("is_core")
        .join(comp, "pid", "left")
        .select(
            "pid",
            F.coalesce(F.col("cluster_id"), F.col("pid")).alias("cluster_id"),
        )
    )
    border = (
        roles.filter(~F.col("is_core"))
        .join(sym, roles.pid == sym.id_a)
        .join(
            core_labeled.select(
                F.col("pid").alias("npid"), F.col("cluster_id").alias("ncl")
            ),
            F.col("id_b") == F.col("npid"),
        )
        .groupBy(roles.pid)
        .agg(F.min("ncl").alias("cluster_id"))
    )
    out_core = core_labeled.select(
        "pid", F.lit("core").alias("role"), "cluster_id"
    )
    out_border = border.select("pid", F.lit("border").alias("role"), "cluster_id")
    out_noise = (
        roles.filter(~F.col("is_core"))
        .join(border.select("pid"), "pid", "left_anti")
        .select("pid", F.lit("noise").alias("role"), F.lit(None).cast("bigint").alias("cluster_id"))
    )
    return (
        out_core.unionByName(out_border)
        .unionByName(out_noise)
        .select(F.col("pid").alias("id"), "role", "cluster_id")
    )
