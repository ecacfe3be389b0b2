"""Time a subset of catalog queries with bench.py's exact methodology
(warm pass + N timed passes, per-query median, noop sink, build/read
split).  Usage:

    python tools/bench_subset.py [--reps N] q396_unigram_em q374_dbscan ...

Prints one JSON line {name: {"total": s, "build": s, "read": s}}.
Measurement-only tool; never used by the driver bench.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_dataframe_spark import catalog
from rust_dataframe_spark.context import get_spark


def main() -> None:
    args = sys.argv[1:]
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    names = [n for n in args if n in catalog.QUERIES]
    missing = [n for n in args if n not in catalog.QUERIES]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    catalog.QUERIES["q31_topk"](spark, sf_dir).collect()

    def run_once(name: str) -> tuple[float, float, float]:
        t0 = time.time()
        df = catalog.QUERIES[name](spark, sf_dir)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        # mirror bench.py: per-query persist release outside the timed
        # window (see the round-12 measurement-bug note in bench.py)
        from rust_dataframe_spark.operators.cache import release
        release(blocking=True)
        spark.catalog.clearCache()
        return t2 - t0, t1 - t0, t2 - t1

    for name in names:  # warm pass
        run_once(name)
    spark.catalog.clearCache()
    passes = []
    for _ in range(reps):
        passes.append({n: run_once(n) for n in names})
        spark.catalog.clearCache()

    def med(name: str, k: int) -> float:
        return round(
            sorted(p[name][k] for p in passes)[len(passes) // 2], 3
        )

    out = {
        n: {"total": med(n, 0), "build": med(n, 1), "read": med(n, 2)}
        for n in names
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
