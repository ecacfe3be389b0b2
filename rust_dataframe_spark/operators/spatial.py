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

__all__ = ["grid_neighbor_pairs"]


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
