"""Distributed dense linear algebra primitives over array columns.

The PCA / covariance preprocessing step of an embedding pipeline needs
X^T X (the Gram matrix) and the column-mean vector — both are
**reductions to d×d / d scalars**, which distribute perfectly: every row
contributes its outer product, partial aggregation combines map-side, and
the result is tiny regardless of row count.

Implementation shape: double ``posexplode`` turns each vector into its
(i, j, x_i·x_j) outer-product entries, then one groupBy((i, j)) sums them.
The d² expansion per row is the honest cost of a d²-cell reduction — the
rows carry 3 narrow columns, combine map-side, and shuffle only d² partial
sums per partition.  For large d (≥ ~128) do it block-wise: slice the
vector into b-sized blocks and compute b×b panels per pass (same operator,
``F.slice`` the input), trading passes for per-row expansion.  An
alternative d²-aggregate-columns formulation keeps rows narrow but
explodes the codegen surface; the explode form is the one that scales in
*d* gracefully.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["gram_matrix", "covariance_matrix"]


def gram_matrix(df: DataFrame, vec_col: str) -> DataFrame:
    """(i, j, g) entries of X^T X = Σ_rows x xᵀ, 0-based, all d² cells
    (including both symmetric halves — consumers index freely)."""
    e = df.select(
        F.posexplode(F.col(vec_col)).alias("i", "xi"),
        F.col(vec_col).alias("__v"),
    ).select("i", "xi", F.posexplode("__v").alias("j", "xj"))
    return e.groupBy("i", "j").agg(F.sum(F.col("xi") * F.col("xj")).alias("g"))


def covariance_matrix(df: DataFrame, vec_col: str) -> DataFrame:
    """(i, j, cov) population covariance matrix of the vector column:
    cov_ij = Σ x_i x_j / n − mean_i·mean_j.  One Gram pass + one mean
    pass, joined on the (broadcast-sized) d-row mean table — no second
    data scan beyond the means."""
    n_means = df.select(
        F.posexplode(F.col(vec_col)).alias("k", "x")
    ).groupBy("k").agg(F.avg("x").alias("m"), F.count(F.lit(1)).alias("n"))
    g = gram_matrix(df, vec_col)
    mi = n_means.select(
        F.col("k").alias("i"), F.col("m").alias("mi"), F.col("n").alias("n")
    )
    mj = n_means.select(F.col("k").alias("j"), F.col("m").alias("mj"))
    return (
        g.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (F.col("g") / F.col("n") - F.col("mi") * F.col("mj")).alias("cov"),
        )
    )
