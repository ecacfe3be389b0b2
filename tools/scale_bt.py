"""Bradley-Terry item-axis scale measurement (VERDICT r7 #8).

q404's catalog fixture fixes the item axis at 20, so the generic
fresh-entropy corpus copies cannot exercise the operator's real growth
dimension.  This harness grows BOTH axes the way an eval pipeline would
— more models being ranked x more pairwise comparisons — and measures
warm wall time per scale plus the per-round cost (iters 2 vs 4) to show
the cost is linear in rounds with O(1) plan depth:

    scale S: items = 20 * ceil(sqrt(S)),  pairs = 20_000 * S

Pairs are generated deterministically executor-side from spark.range
(BT's own generative form: P(a beats b) ~ (a+1)/(a+b+2), winner chosen
by a hash coin), so every item wins at least once with overwhelming
probability at these densities and the fit recovers the ordering.
Methodology mirrors bench.py: pass 1 warms JIT/codegen (untimed),
pass 2 reported.

Usage: python tools/scale_bt.py [--scales 1 10 50] [--iters 2]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rust_dataframe_spark.context import get_spark
from rust_dataframe_spark.operators.ranking import bradley_terry


def pair_stream(spark, n_items: int, n_pairs: int):
    r = spark.range(n_pairs)
    a = (F.col("id") * 2654435761 % n_items).alias("a")
    b = ((F.col("id") * 40503 + 17) % n_items).alias("b")
    d = r.select(a, b, "id").filter(F.col("a") != F.col("b"))
    coin = (F.col("id") * 7919 + 13) % (F.col("a") + F.col("b") + 2)
    return d.select(
        F.when(coin <= F.col("a"), F.col("a")).otherwise(F.col("b")).alias(
            "winner"
        ),
        F.when(coin <= F.col("a"), F.col("b")).otherwise(F.col("a")).alias(
            "loser"
        ),
    )


def main(argv: list[str]) -> int:
    scales = [1, 10, 50]
    iters = 2
    if "--scales" in argv:
        i = argv.index("--scales")
        scales = [int(x) for x in argv[i + 1:] if x.isdigit()]
    if "--iters" in argv:
        iters = int(argv[argv.index("--iters") + 1])
    spark = get_spark("scale-bt")
    spark.sparkContext.setLogLevel("ERROR")

    def run(n_items: int, n_pairs: int, rounds: int) -> float:
        t0 = time.time()
        out = bradley_terry(
            pair_stream(spark, n_items, n_pairs),
            "winner",
            "loser",
            iters=rounds,
            quant_scale=1 << 20,
        )
        out.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for s in scales:
        n_items = 20 * math.ceil(math.sqrt(s))
        n_pairs = 20_000 * s
        run(n_items, n_pairs, iters)  # warm pass
        wall = run(n_items, n_pairs, iters)
        wall2x = run(n_items, n_pairs, iters * 2)
        print(
            f"scale={s} items={n_items} pairs={n_pairs} "
            f"iters={iters}: {wall:.1f}s  iters={iters * 2}: {wall2x:.1f}s "
            f"(per-round ratio {wall2x / wall:.2f}x)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
