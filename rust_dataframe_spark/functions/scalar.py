"""Scalar function catalog: the reference's full name surface -> Spark.

The reference implements a kernel subset and declares ~80 more names as empty
stubs "borrowing" the PySpark 2.4 function list (functions/scalar.rs; SURVEY
§2.8).  This module exposes every one of those names as a callable producing a
``pyspark.sql.Column`` — implemented names and stub names alike, since the
capability target is the declared surface.

Semantic adapters (SURVEY §7.3 — we keep Spark/SQL semantics, documented):

* ``substring`` — the reference is 0-based char-wise (scalar.rs:428-440);
  SQL/Spark are 1-based.  We keep 1-based and expose ``substring_zero_based``
  for reference-compatible call sites.
* ``round`` — reference only supports scale 0 (scalar.rs:397-406); ours takes
  any scale.
* division by zero — reference Arrow kernels error; Spark yields NULL (SQL
  semantics, matches the DuckDB oracle).
* comparisons — the reference casts both sides to Float64 (expression.rs:
  843-845, breaking strings); Spark compares typed values.  No adapter:
  Spark is simply correct here.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["SCALAR_FUNCTIONS", "substring_zero_based", "get"]


def substring_zero_based(col, pos: int, length: int) -> Column:
    """Reference-compatible substring (0-based start, scalar.rs:428-440)."""
    return F.substring(col, pos + 1, length)


# name -> callable returning a Column.  Names follow the reference's snake_case
# (functions/scalar.rs); values are the Spark built-ins (SURVEY §2.8 mapping).
SCALAR_FUNCTIONS: dict[str, object] = {
    # arithmetic kernels (impl in reference scalar.rs:16-103)
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "divide": lambda a, b: a / b,
    # math kernels (impl)
    "abs": F.abs, "acos": F.acos, "asin": F.asin, "atan": F.atan, "atan2": F.atan2,
    "cbrt": F.cbrt, "ceil": F.ceil, "cos": F.cos, "cosh": F.cosh,
    "degrees": F.degrees, "exp": F.exp, "expm1": F.expm1, "floor": F.floor,
    "hypot": F.hypot, "log": F.log, "log10": F.log10, "log2": F.log2,
    "radians": F.radians, "round": F.round, "sin": F.sin, "sinh": F.sinh,
    "sqrt": F.sqrt, "tan": F.tan, "tanh": F.tanh,
    # string kernels (impl)
    "lower": F.lower, "upper": F.upper, "ltrim": F.ltrim, "rtrim": F.rtrim,
    "trim": F.trim, "substring": F.substring,
    # temporal kernel (impl: hour only)
    "hour": F.hour,
    # ---- declared stubs (scalar.rs line numbers in SURVEY §2.8) ----
    "add_months": F.add_months, "base64": F.base64, "bitwise_not": F.bitwise_not,
    "coalesce": F.coalesce, "concat": F.concat, "concat_ws": F.concat_ws,
    "conv": F.conv, "corr": F.corr, "crc32": F.crc32,
    "current_date": F.current_date, "current_timestamp": F.current_timestamp,
    "date_add": F.date_add, "date_format": F.date_format, "date_sub": F.date_sub,
    "date_trunc": F.date_trunc, "date_diff": F.datediff,
    "day_of_month": F.dayofmonth, "day_of_week": F.dayofweek,
    "day_of_year": F.dayofyear, "explode": F.explode, "factorial": F.factorial,
    "format_number": F.format_number, "format_string": F.format_string,
    "from_json": F.from_json, "from_unix_time": F.from_unixtime,
    "from_utc_timestamp": F.from_utc_timestamp, "greatest": F.greatest,
    "hash": F.hash, "hex": F.hex, "initcap": F.initcap, "last_day": F.last_day,
    "least": F.least, "length": F.length, "levenshtein": F.levenshtein,
    "lit": F.lit, "locate": F.locate, "lpad": F.lpad, "md5": F.md5,
    "minute": F.minute,
    "monotonically_increasing_id": F.monotonically_increasing_id,
    "month": F.month, "months_between": F.months_between, "nanvl": F.nanvl,
    "next_day": F.next_day, "ntile": F.ntile, "pow": F.pow, "quarter": F.quarter,
    "rand": F.rand, "randn": F.randn, "regexp_extract": F.regexp_extract,
    "regexp_replace": F.regexp_replace, "repeat": F.repeat, "reverse": F.reverse,
    "rint": F.rint, "rpad": F.rpad, "second": F.second, "sequence": F.sequence,
    "sha1": F.sha1, "sha2": F.sha2, "shift_left": F.shiftleft,
    "shift_right": F.shiftright, "shift_right_unsigned": F.shiftrightunsigned,
    "shuffle": F.shuffle, "signum": F.signum, "size": F.size, "slice": F.slice,
    "sort_array": F.sort_array, "soundex": F.soundex, "split": F.split,
    "struct": F.struct, "substring_index": F.substring_index,
    "to_date": F.to_date, "to_json": F.to_json, "to_timestamp": F.to_timestamp,
    "to_utc_timestamp": F.to_utc_timestamp, "translate": F.translate,
    "trunc": F.trunc, "unbase64": F.unbase64, "unhex": F.unhex,
    "unix_timestamp": F.unix_timestamp, "week_of_year": F.weekofyear,
    "when": F.when, "window": F.window, "year": F.year,
    # ordering helpers (stubs asc scalar.rs:127 / desc :227)
    "asc": lambda c: F.col(c).asc() if isinstance(c, str) else c.asc(),
    "desc": lambda c: F.col(c).desc() if isinstance(c, str) else c.desc(),
}


def get(name: str):
    """Look up a scalar function by reference name."""
    return SCALAR_FUNCTIONS[name]
