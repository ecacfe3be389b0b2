"""Dump .explain('formatted') for named queries to plans/<ver>/<name>_<tag>.txt.

Usage: python tools/save_plans.py <tag> <query> [<query> ...]

Plans are captured at sf0.001 (plan SHAPE is scale-invariant; the tiny SF
keeps fixture builds fast) on the lazily returned frame — the same object
bench.py executes into the noop sink.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_dataframe_spark import catalog
from rust_dataframe_spark.context import get_spark

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", os.environ.get("PLAN_VER", "r13"))
SF_DIR = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("save-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = catalog.QUERIES[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(OUT, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print("wrote", name, tag)


if __name__ == "__main__":
    main()
