"""Temporal join operators Spark lacks as built-ins: as-of join and
interval/range join — composed from shuffle-bounded DataFrame primitives
(SURVEY §2.4 notes both as absent from the reference too; they're table
stakes for time-series and training-data feature pipelines).

* **asof_join** — for every left row, the nearest right row at-or-before
  (backward) / at-or-after (forward) its timestamp, per key.  Implemented
  with the union + running ``last(ignorenulls)`` window trick: ONE shuffle on
  the key (same cost as a plain equi join), no range explosion, no UDF.  The
  naive alternative — non-equi join + per-left-row argmax — is O(n*m) per
  key and collapses at scale.
* **range_join** — equi-join rows to the interval(s) containing them.  The
  naive BETWEEN theta-join degenerates to a broadcast nested loop; this
  implementation buckets both sides by a fixed width (intervals explode into
  every bucket they overlap), equi-joins on the bucket, then applies the
  exact BETWEEN as a post-filter — turning an O(n*m) comparison into a
  shuffle-on-bucket hash join.  Pick ``bucket_width`` ≈ median interval
  length; wider means fewer replicas, narrower means tighter post-filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join", "range_join", "interval_overlap_join", "scd2_intervals", "forward_fill", "interpolate_linear", "ewma", "cusum", "holt_linear", "sequence_gaps"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    *,
    direction: str = "backward",
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right row whose
    ``ts_col`` is <= (backward) or >= (forward) the left row's, matching on
    ``key_col``.  Ties at equal timestamps match (inclusive).  Unmatched left
    rows keep nulls (left-join semantics).

    Right payload columns come back prefixed with ``right_prefix`` (including
    the matched right timestamp as ``<prefix><ts_col>``).

    Scale: one shuffle (window partitioned by key).  For a hot key, pre-split
    it by coarse time bucket (partitionBy(key, window(ts))) and as-of join
    within buckets, seeding each bucket with the previous bucket's last row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    payload = [c for c in right.columns if c not in (key_col, ts_col)]
    clash = {right_prefix + c for c in payload + [ts_col]} & set(left.columns)
    if clash:
        raise ValueError(f"left columns collide with prefixed right columns: {sorted(clash)}")

    r = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.col(ts_col).alias(right_prefix + ts_col),
        *[F.col(c).alias(right_prefix + c) for c in payload],
    ).withColumn("__side", F.lit(0))
    l = left.withColumn("__side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)

    def w_for(d: str):
        ts_order = F.col(ts_col).asc() if d == "backward" else F.col(ts_col).desc()
        # right rows (__side 0) sort before left rows at equal ts -> inclusive
        return (
            Window.partitionBy(key_col)
            .orderBy(ts_order, F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    if direction in ("backward", "forward"):
        w = w_for(direction)
        filled = [
            F.last(F.col(right_prefix + c), ignorenulls=True).over(w).alias(right_prefix + c)
            for c in [ts_col] + payload
        ]
        return (
            u.select(*left.columns, F.col("__side"), *filled)
            .filter(F.col("__side") == 1)
            .drop("__side")
        )

    # nearest: evaluate both fills (one shuffle — both windows share the
    # hash partitioning by key; Catalyst plans one exchange + two sorts),
    # then pick per row by absolute time gap; ties prefer the backward
    # (at-or-before) match, matching the inclusive semantics above.
    wb, wf = w_for("backward"), w_for("forward")
    both = u.select(
        *left.columns,
        F.col("__side"),
        *[
            F.last(F.col(right_prefix + c), ignorenulls=True).over(wb).alias("__b_" + c)
            for c in [ts_col] + payload
        ],
        *[
            F.last(F.col(right_prefix + c), ignorenulls=True).over(wf).alias("__f_" + c)
            for c in [ts_col] + payload
        ],
    ).filter(F.col("__side") == 1)
    t = F.col(ts_col).cast("double")
    bt = F.col("__b_" + ts_col).cast("double")
    ft = F.col("__f_" + ts_col).cast("double")
    use_back = bt.isNotNull() & (ft.isNull() | ((t - bt) <= (ft - t)))
    chosen = [
        F.when(use_back, F.col("__b_" + c)).otherwise(F.col("__f_" + c)).alias(
            right_prefix + c
        )
        for c in [ts_col] + payload
    ]
    return both.select(*left.columns, *chosen)


def range_join(
    left: DataFrame,
    value_col: str,
    bands: DataFrame,
    lo_col: str,
    hi_col: str,
    *,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each left row to every band whose [lo, hi] interval (inclusive)
    contains ``value_col``.  Implemented as a bucketed equi join: bands
    replicate into each ``bucket_width``-sized bucket they overlap, rows hash
    to their single bucket, the exact BETWEEN filters the bucket-collisions.

    With a small band table Catalyst broadcasts it and the bucket column
    folds away; the bucketing is what keeps this a hash join when BOTH sides
    are large (the case Spark would otherwise plan as a nested loop).
    """
    bw = float(bucket_width)
    b = bands.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bw).cast("long"),
                F.floor(F.col(hi_col) / bw).cast("long"),
            )
        ),
    )
    lb = left.withColumn("__b", F.floor(F.col(value_col) / bw).cast("long"))
    out = lb.join(
        b,
        (lb["__b"] == b["__b"])
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) <= F.col(hi_col)),
        how,
    )
    return out.drop("__b")


def scd2_intervals(
    changes: DataFrame,
    key_cols: list[str],
    *,
    ts_col: str = "ts",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Change log -> SCD-2 temporal table: each change row becomes a validity
    interval ``[valid_from, valid_to)`` per key, where ``valid_to`` is the
    next change's timestamp (null = currently valid).

    Simultaneous changes make ``lead`` nondeterministic — pass
    ``tiebreak_cols`` (a unique column) whenever ``ts_col`` can tie.

    One window (``lead`` over the key partition ordered by time) — a single
    shuffle on the key, no self-join.  Pair with an as-of join
    (:func:`asof_join`) to query "the attribute as of time t" downstream.
    """
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak_cols)
    return changes.select(
        "*",
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        (F.lead(ts_col).over(w).isNull()).alias("is_current"),
    ).drop(ts_col)


def forward_fill(
    df: DataFrame,
    value_col: str,
    *,
    partition_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Gap-fill: replace nulls in ``value_col`` with the most recent non-null
    value in order (``last ... IGNORE NULLS`` over a running frame) — the
    sensor/telemetry forward-fill pattern.

    One shuffle on the partition key; the frame is running, so Spark
    evaluates it in a single pass per partition (no per-row rescans).
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(value_col, F.last(value_col, ignorenulls=True).over(w))


def interpolate_linear(
    df: DataFrame,
    value_col: str,
    time_col: str,
    *,
    partition_cols: list[str],
    order_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Linear gap interpolation: nulls in ``value_col`` are replaced by the
    time-weighted blend of the nearest non-null neighbors on each side —
    v_prev + (v_next - v_prev) * (t - t_prev) / (t_next - t_prev) — falling
    back to forward-/backward-fill at series edges.  ``time_col`` must be
    numeric (epoch micros via F.unix_micros for timestamps).

    Two running windows per series (one forward, one reversed, both
    ``last IGNORE NULLS`` single-pass frames), one shuffle on the partition
    key — same cost envelope as forward_fill, strictly better estimates for
    telemetry/sensor gaps.
    """
    order = order_cols or [time_col]
    out = out_col or value_col
    fwd = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.col(c).asc() for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.col(c).desc() for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v = F.col(value_col)
    t_at_v = F.when(v.isNotNull(), F.col(time_col))  # time of the known points
    pv = F.last(v, ignorenulls=True).over(fwd)
    pt = F.last(t_at_v, ignorenulls=True).over(fwd)
    nv = F.last(v, ignorenulls=True).over(bwd)
    nt = F.last(t_at_v, ignorenulls=True).over(bwd)
    interp = (
        F.when(v.isNotNull(), v)
        .when(pv.isNull(), nv)  # leading gap: backward-fill
        .when(nv.isNull(), pv)  # trailing gap: forward-fill
        .when(nt == pt, pv)  # degenerate: same anchor on both sides
        .otherwise(pv + (nv - pv) * (F.col(time_col) - pt) / (nt - pt))
    )
    return df.withColumn(out, interp)


def max_concurrency(
    df: DataFrame,
    group_col: str,
    start_col: str,
    end_col: str,
    *,
    bucket: str | None = None,
) -> DataFrame:
    """Peak number of simultaneously-open intervals per group — the
    sweep-line / prefix-sum shape (capacity planning, peak-sessions,
    max-overlap joins all reduce to it).

    Each interval ``[start, end)`` emits (+1 at start, -1 at end); a running
    sum ordered by ``(time, delta)`` — the -1 sorts first at ties, closing
    before opening, which is exactly the half-open convention — sweeps the
    timeline, and the group's answer is the max of the running sum.

    ``bucket`` (a ``date_trunc`` unit, e.g. ``"day"``) enables the
    two-level decomposition for mega-groups: points sweep within each
    (group, bucket) — parallelism = groups × buckets instead of groups —
    and buckets combine with the classic parallel-prefix identity: a
    bucket's global max = (running sum of all previous buckets' net delta)
    + (its internal max prefix).  The second level is O(buckets) rows.
    Measured at 10× (1M events, 5 groups): single-level 3.4 s, bucketed
    1.9 s — the single-level sweep serializes on 5 partition-sized sorts.
    """
    s = df.select(
        F.col(group_col).alias("g"), F.col(start_col).alias("t"), F.lit(1).alias("delta")
    )
    e = df.select(
        F.col(group_col).alias("g"), F.col(end_col).alias("t"), F.lit(-1).alias("delta")
    )
    pts = s.unionAll(e)
    if bucket is None:
        w = (
            Window.partitionBy("g")
            .orderBy("t", "delta")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            pts.withColumn("conc", F.sum("delta").over(w))
            .groupBy("g")
            .agg(F.max("conc").cast("bigint").alias("max_concurrent"))
        )
    pts = pts.withColumn("b", F.date_trunc(bucket, "t"))
    win = (
        Window.partitionBy("g", "b")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    per_bucket = (
        pts.withColumn("conc", F.sum("delta").over(win))
        .groupBy("g", "b")
        .agg(F.max("conc").alias("mx"), F.sum("delta").alias("net"))
    )
    carry = (
        Window.partitionBy("g")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        per_bucket.withColumn(
            "offset", F.coalesce(F.sum("net").over(carry), F.lit(0))
        )
        .groupBy("g")
        .agg(F.max(F.col("offset") + F.col("mx")).cast("bigint").alias("max_concurrent"))
    )


def ewma(
    df: DataFrame,
    part_col: str,
    order_col: str,
    value_col: str,
    *,
    alpha: float = 0.25,
    out_col: str = "ewma",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Exponentially weighted moving average per key:
    ``y_1 = x_1;  y_t = alpha*x_t + (1-alpha)*y_{t-1}`` — the standard
    time-series smoother/decay metric (pandas ``ewm(adjust=False)``).

    Spark has no native recursive window, so the recurrence is computed as a
    LEFT FOLD over the ordered history: ``collect_list`` over a running
    rows-frame, then one ``F.aggregate`` pass ``v*alpha + s*(1-alpha)``
    seeded by the first element.  Both steps are order-pinned by the window
    sort, so the op sequence — and therefore every IEEE rounding — is
    replayable bit-for-bit by any engine with list folds (DuckDB
    list_reduce).

    Cost: the fold is O(t) per row -> O(n^2) per key.  Fine for dashboards
    and bounded histories (hundreds of rows/key); for long histories use the
    streaming form (stateful one-pass recurrence via
    streaming.stateful_running_counts' shape) or a rows-frame CAP (pass the
    history through ``F.slice`` first) — the unbounded batch recurrence
    fundamentally serializes per key, which is why it is NOT the 100 TB
    default but a per-key diagnostic.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    order = [F.col(order_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = (
        Window.partitionBy(part_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = F.collect_list(F.col(value_col).cast("double")).over(w)
    a = F.lit(float(alpha))
    folded = F.aggregate(
        hist,
        F.lit(None).cast("double"),
        lambda s, v: F.when(s.isNull(), v).otherwise(v * a + s * (F.lit(1.0) - a)),
    )
    # floor-at-6, NOT round-at-6: engines agree bit-for-bit on the folded
    # double, but their round() tie-breaks differ (Spark HALF_UP on the
    # decimal repr vs DuckDB) — at sf0.1 a value landing on x.xxxxx5 split
    # them in the full-catalog gate.  floor of the same double is the same
    # everywhere.
    return df.withColumn(out_col, F.floor(folded * F.lit(1e6)) / F.lit(1e6))


def cusum(
    df: DataFrame,
    part_col: str,
    order_col: str,
    value_col: str,
    *,
    target: float,
    slack: float,
    out_col: str = "cusum",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """One-sided CUSUM change detector per key:
    ``s_1 = max(0, x_1 - (target + slack)); s_t = max(0, s_{t-1} + x_t -
    (target + slack))`` — the classic drift alarm (signal when s crosses a
    threshold h): small persistent shifts accumulate where a fixed
    per-point threshold stays silent.

    Same engineering as :func:`ewma`: Spark has no recursive window, so the
    recurrence is an order-pinned list fold (``collect_list`` running frame
    + ``F.aggregate``), every op replayable bit-for-bit by a SQL engine
    with list folds; ``target + slack`` folds to one literal on both
    engines.  Same O(history^2)-per-key caveat, same streaming escape hatch
    (a one-double-state applyInPandasWithState op, stream_ewma's shape).
    """
    order = [F.col(order_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = (
        Window.partitionBy(part_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = F.collect_list(F.col(value_col).cast("double")).over(w)
    drift = F.lit(float(target) + float(slack))
    folded = F.aggregate(
        hist,
        F.lit(0.0),
        lambda s, v: F.greatest(F.lit(0.0), s + v - drift),
    )
    return df.withColumn(out_col, F.round(folded, 6))


def holt_linear(
    df: DataFrame,
    part_col: str,
    order_col: str,
    value_col: str,
    *,
    alpha: float = 0.5,
    beta: float = 0.3,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Holt double-exponential smoothing per key — level AND trend:
    ``l_t = a*x_t + (1-a)*(l_{t-1} + t_{t-1})``,
    ``t_t = b*(l_t - l_{t-1}) + (1-b)*t_{t-1}`` (init l_1 = x_1, t_1 = 0),
    plus the one-step-ahead forecast ``l_t + t_t`` — the trending-series
    smoother EWMA (level-only) cannot follow.

    The TWO-state recurrence folds as a list-typed accumulator ``[l, t]``
    over single-element ``[x]`` lists — the trick that fits multi-state
    recurrences into engines whose fold requires accumulator type ==
    element type (DuckDB list_reduce), keeping the op sequence replayable
    bit-for-bit.  ``l_t`` appears twice in the step; it is spelled
    identically both times on both engines, so the duplicated arithmetic
    rounds identically.  Same O(history^2) batch-fold caveat and streaming
    escape hatch as :func:`ewma`/:func:`cusum`.
    """
    if not (0.0 < alpha <= 1.0) or not (0.0 <= beta <= 1.0):
        raise ValueError(f"need 0 < alpha <= 1 and 0 <= beta <= 1, got {alpha}, {beta}")
    order = [F.col(order_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = (
        Window.partitionBy(part_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hist = F.collect_list(F.col(value_col).cast("double")).over(w)
    a, b = F.lit(float(alpha)), F.lit(float(beta))
    one_a, one_b = F.lit(1.0 - float(alpha)), F.lit(1.0 - float(beta))

    def step(acc, v):
        x = F.element_at(v, 1)
        l_prev, t_prev = F.element_at(acc, 1), F.element_at(acc, 2)
        l_new = a * x + one_a * (l_prev + t_prev)
        return F.array(
            l_new,
            b * ((a * x + one_a * (l_prev + t_prev)) - l_prev) + one_b * t_prev,
        )

    init = F.array(F.element_at(hist, 1), F.lit(0.0))
    state = F.aggregate(F.transform(hist, lambda x: F.array(x)), init, step)
    level = F.element_at(state, 1)
    trend = F.element_at(state, 2)
    return (
        df.withColumn("level", F.round(level, 6))
        .withColumn("trend", F.round(trend, 6))
        .withColumn("forecast_1", F.round(level + trend, 6))
    )


def interval_overlap_join(
    left: DataFrame,
    l_lo: str,
    l_hi: str,
    right: DataFrame,
    r_lo: str,
    r_hi: str,
    *,
    bucket_width: float,
    suffix: str = "_r",
) -> DataFrame:
    """Interval×interval overlap join: every (left, right) pair whose
    ``[lo, hi]`` intervals intersect (inclusive).  The interval-set
    generalization of :func:`range_join` (point-in-interval).

    Shape: both sides explode into the fixed-width buckets they span and
    equi-join on the bucket — the naive theta join
    (``l_lo <= r_hi AND r_lo <= l_hi``) plans as a nested loop and dies at
    scale.  A pair overlapping several shared buckets would duplicate; the
    **first-overlap-bucket rule** dedups for free: a pair is emitted only
    from the bucket containing ``max(l_lo, r_lo)`` (the overlap's left
    edge), which by construction both sides cover — no distinct needed.
    ``bucket_width`` ≈ median interval length balances replication (long
    intervals × many buckets) against bucket collision checks.

    Interval columns must be numeric (cast timestamps to epoch first).
    Right columns come back suffixed on name collision.
    """
    bw = float(bucket_width)
    lcols = left.columns
    rename = {c: c + suffix for c in right.columns if c in lcols}
    r = right
    for old, new in rename.items():
        r = r.withColumnRenamed(old, new)
    rlo = rename.get(r_lo, r_lo)
    rhi = rename.get(r_hi, r_hi)

    def spanned(df, lo, hi):
        return df.withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / bw).cast("long"),
                    F.floor(F.col(hi) / bw).cast("long"),
                )
            ),
        )

    lb = spanned(left, l_lo, l_hi)
    rb = spanned(r, rlo, rhi)
    overlap = (F.col(l_lo) <= F.col(rhi)) & (F.col(rlo) <= F.col(l_hi))
    first_bucket = F.floor(
        F.greatest(F.col(l_lo), F.col(rlo)) / bw
    ).cast("long") == F.col("__b")
    return lb.join(rb, "__b").filter(overlap & first_bucket).drop("__b")


def sequence_gaps(df: DataFrame, id_col: str) -> DataFrame:
    """Missing ranges in a supposed-to-be-dense integer id sequence —
    gaps-and-islands WITHOUT a single-partition window.

    The naive form is ``lead(id) over (order by id)``: one task sees every
    id.  Here: range-partition the distinct ids, run the lead per
    partition (parallel), and stitch partition boundaries by joining each
    partition's LAST id to the next non-empty partition's first id — an
    O(partitions) driver-side map folded in as a literal CASE, exactly the
    ``global_cumsum`` two-phase discipline.  Returns ``(gap_start,
    gap_end, gap_len)``.

    Shape: one range shuffle of the distinct ids + a per-partition window;
    at 100 TB the practical deployment runs this per partition-directory
    with the same boundary stitching across directories.

    Like ``global_cumsum``, the ranged frame is persisted before the
    boundary collect so the stitch job and the output job read the same
    materialized range exchange (boundary sampling is per physical plan;
    two instantiations can disagree at scale — ADVICE r4).
    """
    from pyspark.sql import Window

    from .cache import persist_tracked

    spark = df.sparkSession
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    k = df.select(F.col(id_col).alias("id")).distinct()
    ranged = persist_tracked(
        k.repartitionByRange(n, F.col("id")).withColumn(
            "__pid", F.spark_partition_id()
        )
    )
    firsts = sorted(
        ranged.groupBy("__pid").agg(F.min("id").alias("f")).collect(),
        key=lambda r: r["__pid"],
    )
    # next non-empty partition's first id, per present partition
    nxt_first = {}
    for i, r in enumerate(firsts):
        nxt_first[r["__pid"]] = firsts[i + 1]["f"] if i + 1 < len(firsts) else None
    case = None
    for pid, val in nxt_first.items():
        clause = (F.col("__pid") == pid, F.lit(val))
        case = F.when(*clause) if case is None else case.when(*clause)
    case = F.lit(None) if case is None else case
    w = Window.partitionBy("__pid").orderBy("id")
    g = ranged.withColumn("nxt", F.coalesce(F.lead("id").over(w), case))
    return (
        g.filter(F.col("nxt") - F.col("id") > 1)
        .select(
            (F.col("id") + 1).alias("gap_start"),
            (F.col("nxt") - 1).alias("gap_end"),
            (F.col("nxt") - F.col("id") - 1).cast("bigint").alias("gap_len"),
        )
        .drop("__pid")
    )
