"""User-defined TABLE functions (Spark 4 Python UDTF) — one row in, many
rows out, usable in SQL ``FROM``/``LATERAL`` position.

Completes the UDF family the reference only sketched (its Context kept a
``functions: HashMap<String, String>`` placeholder, context.rs:8-23; this
repo already covers scalar UDF, Pandas UDF, and grouped-agg UDAF —
UDTF is the remaining shape).

Caveat, stated where users will read it: a UDTF runs row-at-a-time Python.
Every UDTF here exists as a demonstration of the API surface; the engine's
own operators express the same logic with codegen'd built-ins (n-gram
generation: ``operators/dedup.shingle`` / ``repeated_ngram_spans``), which
is the hot-path form.  Reach for a UDTF only when the row-to-rows logic is
genuinely irreducible to ``explode``/``posexplode``/``inline`` over array
expressions.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

__all__ = ["NgramsUDTF", "register_udtfs"]


@udtf(returnType="pos int, ngram string")
class NgramsUDTF:
    """``ngrams(text, n)`` — word n-grams with 0-based start positions.

    Mirrors operators/dedup.shingle exactly (same tokenization, same
    positions) so the catalog oracle and the built-in path agree.
    """

    def eval(self, text: str, n: int):
        if text is None or n is None or n <= 0:
            return
        words = text.split(" ")
        for i in range(max(len(words) - n + 1, 0)):
            yield i, " ".join(words[i : i + n])


def register_udtfs(spark: SparkSession) -> None:
    """Idempotently register every UDTF under its SQL name."""
    spark.udtf.register("ngrams", NgramsUDTF)
