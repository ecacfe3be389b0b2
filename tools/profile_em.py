"""Phase-level profiling of the unigram EM family at sf0.1 (measurement
tool only — guide §1).  Times each sub-plan of the q336 E-step and the
q396 loop components with the noop sink."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rust_dataframe_spark.catalog_llm import _Q336_WEIGHTS
from rust_dataframe_spark.context import get_spark
from rust_dataframe_spark.operators import text as tx

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def t(label, fn, n=3):
    fn()  # warm
    xs = []
    for _ in range(n):
        t0 = time.time()
        fn()
        xs.append(time.time() - t0)
    print(f"{label:48s} {sorted(xs)[n//2]:7.3f}s  (min {min(xs):.3f})")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("profile-em")
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{SF}/documents.parquet")
    d.count()

    words = d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
    freq = words.groupBy("word").agg(
        F.count(F.lit(1)).cast("bigint").alias("freq")
    )
    t("scan only", lambda: noop(d))
    t("explode words", lambda: noop(words))
    t("freq groupBy", lambda: noop(freq))

    ec = tx.unigram_expected_counts(d, "doc_id", "text", _Q336_WEIGHTS)
    t("expected_counts (full E-step)", lambda: noop(ec))
    t("expected_counts + orderBy (q336)",
      lambda: noop(ec.orderBy("word", "piece")))

    ll = tx.unigram_corpus_ll(d, "doc_id", "text", _Q336_WEIGHTS)
    t("corpus_ll", lambda: noop(ll))

    m = tx.unigram_m_step(ec)
    t("m_step(E) (q392 core)", lambda: noop(m))

    t("unigram_em 2 rounds (q396 core)",
      lambda: noop(tx.unigram_em(d, "doc_id", "text", _Q336_WEIGHTS, 2,
                                 quant_scale=32)))


if __name__ == "__main__":
    main()
