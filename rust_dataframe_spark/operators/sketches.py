"""Count-min sketch: fixed-size mergeable frequency summaries.

The approximate-counting complement of the HLL/theta sketches in
tests/test_functions.py: HLL answers "how many DISTINCT", count-min answers
"how often does THIS item occur" with bounded memory — ``depth x width``
integer cells regardless of vocabulary size.  Guarantees (standard CM):
``true <= est`` always, and ``est <= true + (2/width) * N`` with probability
``1 - 2^-depth`` — the one-sided error is what makes it safe for
heavy-hitter screening (no true heavy hitter is ever missed).

Engine-replayable by construction: cell hashing is the repo's md5 pattern
(``conv(substr(md5(token || '|' || row), 1, 8), 16, 10) % width``), so a SQL
oracle rebuilds the identical sketch and the estimates match exactly.

Scale shape: the build is explode -> ONE map-side-combined aggregate into at
most depth*width cells (a few KB) — the sketch of a 100 TB corpus fits in a
broadcast; per-partition or per-day sketches merge by cell-wise addition
(associative, commutative), which is the point: count once, merge forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "countmin_build",
    "countmin_merge",
    "countmin_lookup",
    "countmin_inner_product",
    "misra_gries",
]


def _cell(token_col, row: int, width: int, salt: str):
    return (
        F.conv(
            F.substring(F.md5(F.concat(token_col, F.lit(f"|{salt}|{row}"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % width
    )


def countmin_build(
    df: DataFrame,
    token_col: str,
    *,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Build a count-min sketch over a token column.  Returns the sparse cell
    table (row, bucket, c) — absent cells are zero.  One explode-free pass:
    each token lands in ``depth`` cells via independent salted hashes."""
    if depth < 1 or width < 2:
        raise ValueError(f"need depth >= 1 and width >= 2, got {depth}x{width}")
    rows = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _cell(F.col(token_col), r, width, salt).alias("bucket"))
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def countmin_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with the same (depth, width, salt): cell-wise
    addition.  Associative/commutative — fold per-day or per-partition
    sketches in any order."""
    return (
        a.unionByName(b)
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def countmin_lookup(
    sketch: DataFrame,
    terms: DataFrame,
    term_col: str,
    *,
    depth: int = 4,
    width: int = 256,
    salt: str = "cm",
) -> DataFrame:
    """Point-estimate the count of each term: min over the depth rows of the
    term's cell (missing cell = 0).  ``terms`` is a frame of probe terms —
    the same hash expressions recompute the cells, so lookups never need the
    original data."""
    cells = F.array(
        *[
            F.struct(F.lit(r).alias("row"), _cell(F.col(term_col), r, width, salt).alias("bucket"))
            for r in range(depth)
        ]
    )
    probes = terms.select(F.col(term_col), F.explode(cells).alias("rb")).select(
        F.col(term_col), F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    joined = probes.join(sketch, ["row", "bucket"], "left").select(
        F.col(term_col), F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    return joined.groupBy(term_col).agg(F.min("c").alias("est"))


def countmin_inner_product(a: DataFrame, b: DataFrame, *, depth: int = 4) -> DataFrame:
    """Equi-join CARDINALITY estimate from two count-min sketches — the
    Cormode-Muthukrishnan inner product: ``est = min_r sum_b A[r][b] *
    B[r][b]``.  Because every key adds its full count to one bucket per
    row, ``true = sum_k cntA(k)*cntB(k) <= est`` always (collisions only
    ADD), and ``est <= true + (2/width) * N_A * N_B`` with probability
    ``1 - 2^-depth`` — a join-size upper bound from two few-KB summaries,
    the statistic a 100 TB planner wants BEFORE committing to a join
    strategy (broadcast vs shuffle vs refuse) without touching either
    table again.

    Both sketches must share (depth, width, salt); pass the same ``depth``
    here — a sketch row with NO colliding buckets has inner product 0, and
    since the cell tables are sparse that row is simply absent from the
    join, so "fewer than depth rows present" means the estimate is 0.
    Returns one row ``(est bigint)``.  Cost: the sparse cell tables join
    on (row, bucket) — at most depth*width rows per side regardless of
    data size."""
    bb = b.select(
        F.col("row"), F.col("bucket"), F.col("c").alias("__cb")
    )
    per_row = (
        a.join(bb, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("c") * F.col("__cb")).alias("__ip"))
    )
    return per_row.agg(
        F.when(F.count(F.lit(1)) < depth, F.lit(0))
        .otherwise(F.coalesce(F.min("__ip"), F.lit(0)))
        .cast("bigint")
        .alias("est")
    )


def misra_gries(df: DataFrame, token_col: str, k: int) -> DataFrame:
    """Misra-Gries heavy-hitters summary of size <= k, distributed via the
    mergeable-summaries construction: each partition streams its tokens
    through a classic k-counter MG (decrement-all on overflow), then the
    per-partition summaries merge in one shot — cell-wise sum, subtract the
    (k+1)-th largest combined estimate, keep positive.  The mass argument
    survives the one-shot P-way merge: every unit of undercount retires
    k+1 units of token mass, so for every token

        true - N/(k+1)  <=  est  <=  true

    and any token with true frequency > N/(k+1) is GUARANTEED present —
    the property q340's certificate audits against exact counts.

    Returns (token, est) with at most k rows.  ``est`` values depend on
    partition layout (any MG execution does); the two-sided bound above is
    layout-independent, which is what callers should consume.

    Scale shape: one mapInPandas pass (no shuffle) reduces the corpus to
    <= partitions * k rows; the merge shuffles only those.  The
    frequent-words / hot-key / trending-token screen for streams too large
    to count exactly — and the summary is re-mergeable across days.
    """
    if k < 1:
        raise ValueError("k must be >= 1")

    def _partial(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for t in pdf[token_col]:
                if t in counters:
                    counters[t] += 1
                elif len(counters) < k:
                    counters[t] = 1
                else:
                    dead = []
                    for key in counters:
                        counters[key] -= 1
                        if counters[key] == 0:
                            dead.append(key)
                    for key in dead:
                        del counters[key]
        if counters:
            yield pd.DataFrame(
                {"token": list(counters), "est": list(counters.values())}
            )

    parts = df.select(F.col(token_col).alias(token_col)).mapInPandas(
        _partial, "token string, est bigint"
    )
    combined = parts.groupBy("token").agg(F.sum("est").alias("est"))
    top = combined.orderBy(F.desc("est"), "token").limit(k + 1)
    theta = top.agg(
        F.when(F.count(F.lit(1)) == k + 1, F.min("est")).otherwise(0).alias("theta")
    )
    return (
        combined.crossJoin(F.broadcast(theta))
        .select("token", (F.col("est") - F.col("theta")).alias("est"))
        .filter(F.col("est") > 0)
    )
