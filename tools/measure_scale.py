"""Measure per-query warm noop-sink timings across scaled copies of sf0.1
(built by tools/scale_up.py) — the data source for SCALE.md's measured
curves.  Same methodology as bench.py: pass 1 warms JIT/codegen/footers,
pass 2 is reported.

Usage:
    python tools/measure_scale.py q294_rolling_uniques q296_bitmap_semijoin \
        --dirs /root/testdata/sf0.1 /tmp/spark_graft_sf10x [...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_dataframe_spark import catalog
from rust_dataframe_spark.context import get_spark
from rust_dataframe_spark.operators import cache as opcache


def main(argv: list[str]) -> int:
    if "--dirs" in argv:
        i = argv.index("--dirs")
        names, dirs = argv[:i], argv[i + 1 :]
    else:
        names, dirs = argv, ["/root/testdata/sf0.1", "/tmp/spark_graft_sf10x"]
    spark = get_spark("measure-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def run_once(name: str, sf_dir: str) -> float:
        t0 = time.time()
        df = catalog.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    for name in names:
        cells = []
        for d in dirs:
            try:
                run_once(name, d)  # warm (untimed)
                opcache.release()
                spark.catalog.clearCache()
                t = run_once(name, d)
                opcache.release()
                spark.catalog.clearCache()
                cells.append(f"{t:.1f}s")
            except Exception as e:
                cells.append(f"ERR:{type(e).__name__}")
        print(f"{name}: " + " | ".join(cells), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
