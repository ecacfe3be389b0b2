"""Fresh-ENTROPY scaled copies (VERDICT r6 #2) — close SCALE.md's own
caveat that key-shifted replication saturates the distinct axes.

Like tools/scale_up.py this builds an N-times copy of a testdata dir, but
each replica i > 0 also regenerates the CONTENT that drives the
per-distinct-unit disciplines, so the distinct axes genuinely grow:

* ``documents.text`` — Heaps-law-style vocabulary growth: per replica,
  each word keeps its original form with probability ~55% (the shared
  Zipf head) and otherwise mints a replica-specific token derived from
  ``md5(word, replica)`` (6 hex chars + replica tag).  Distinct words
  therefore grow ~0.45 * V per replica (beta ~ 1 for the fresh tail —
  an upper bound on real Heaps beta ~ 0.5, i.e. HARDER than real text).
  New words => new shingles/gram digests (q72, q326) and new lattice
  DPs (q336/q392/q396).
* ``embeddings.embedding`` — per-(vector, dim, replica) deterministic
  md5 noise (±0.05) on every coordinate: new coordinates => new grid
  cells and epsilon-graph edges (q374), new SRP/IVF geometry.
* ``lineitem.l_quantity`` / ``l_extendedprice`` — per-replica md5 cent
  offsets: the distinct-cents rank axes (q390) grow instead of
  saturating.
* ``events.value`` — same cent-offset scheme (rank/OBF/drift families).

Everything is seeded md5 — no RNG state, byte-reproducible.

Usage:
    python tools/scale_fresh.py [factor] [src_sf_dir] [out_dir]
Defaults: 10 /root/testdata/sf0.1 /tmp/spark_graft_fresh
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from rust_dataframe_spark.context import get_spark

SHIFTS = {
    "lineitem": (["l_orderkey"], 10_000_000),
    "orders": (["o_orderkey"], 10_000_000),
    "documents": (["doc_id"], 10_000_000),
    "embeddings": (["vec_id"], 10_000_000),
    "events": (["event_id"], 100_000_000),
}
COPY = ["region", "nation", "customer", "supplier", "part"]


def _h(cols: list, salt: str) -> F.Column:
    """Deterministic 0..2^31 int from md5 of the given columns + salt."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("#", *[c.cast("string") for c in cols], F.lit(salt))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")


def _fresh_text(df, i: int):
    """Rewrite text with replica-specific vocabulary growth (doc column
    stays a space-joined word sequence, same word count)."""
    words = F.split(F.col("text"), " ")
    minted = F.transform(
        words,
        lambda w: F.when(
            _h([w], f"keep{i}") % 100 < 55, w
        ).otherwise(
            F.concat(
                F.lit("w"),
                F.substring(
                    F.md5(F.concat(w, F.lit(f"#v{i}"))), 1, 6
                ),
                F.lit(f"r{i}"),
            )
        ),
    )
    return df.withColumn("text", F.array_join(minted, " "))


def _fresh_embedding(df, i: int):
    """Per-(vec_id, dim, replica) +-0.05 md5 noise on every coordinate."""
    return df.withColumn(
        "embedding",
        F.transform(
            F.col("embedding"),
            lambda x, j: (
                x.cast("double")
                + (
                    (_h([F.col("vec_id"), j], f"emb{i}") % 1001).cast("double")
                    / 1000.0
                    - 0.5
                )
                * 0.1
            ).cast("float"),
        ),
    )


def _cent_offset(df, col: str, keys: list[str], i: int, spread_cents: int):
    """Deterministic per-replica cent offset keeping values positive."""
    off = (_h([F.col(k) for k in keys], f"{col}{i}") % spread_cents).cast(
        "double"
    ) / 100.0
    return df.withColumn(col, F.round(F.col(col) + off, 2))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark_graft_fresh"
    spark = get_spark("scale-fresh")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(out, exist_ok=True)

    for t in COPY:
        spark.read.parquet(f"{src}/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")
        print(f"{t}: copied")

    for t, (cols, stride) in SHIFTS.items():
        df = spark.read.parquet(f"{src}/{t}.parquet")
        parts = []
        for i in range(factor):
            p = df
            for c in cols:
                p = p.withColumn(c, F.col(c) + F.lit(i * stride))
            if i > 0:  # replica 0 is the original — curves share a 1x point
                if t == "documents":
                    p = _fresh_text(p, i)
                elif t == "embeddings":
                    p = _fresh_embedding(p, i)
                elif t == "lineitem":
                    p = _cent_offset(p, "l_quantity", ["l_orderkey", "l_linenumber"], i, 900)
                    p = _cent_offset(p, "l_extendedprice", ["l_orderkey", "l_linenumber"], i, 99_000)
                elif t == "events":
                    p = _cent_offset(p, "value", ["event_id"], i, 9_000)
            parts.append(p)
        big = parts[0]
        for p in parts[1:]:
            big = big.unionByName(p)
        big.repartition(max(4, factor)).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: x{factor} fresh-entropy")
    print(f"done: {out}")


if __name__ == "__main__":
    main()
