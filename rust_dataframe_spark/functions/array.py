"""Array/map function catalog (SURVEY §2.9, reference functions/array.rs).

Implemented reference kernels and declared stubs alike map to Spark built-ins.
Semantics notes:

* ``array_position`` — both sides are 1-based with 0 for absent
  (array.rs:233-259 == Spark).
* ``array_repeat`` — Spark repeats the *element*; the reference's kernel
  repeated the whole list (array.rs:294-323).  We keep Spark semantics and
  expose ``repeat_list`` for the reference behavior.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["ARRAY_FUNCTIONS", "repeat_list", "get"]


def repeat_list(col, n: int) -> Column:
    """Reference-style array_repeat: concatenate the list with itself n times
    (array.rs:294-323)."""
    return F.flatten(F.array_repeat(col, n))


ARRAY_FUNCTIONS: dict[str, object] = {
    # impl in reference
    "array_contains": F.array_contains,
    "array_distinct": F.array_distinct,
    "array_except": F.array_except,
    "array_intersect": F.array_intersect,
    "array_max": F.array_max,
    "array_min": F.array_min,
    "array_position": F.array_position,
    "array_remove": F.array_remove,
    "array_repeat": F.array_repeat,
    "array_sort": F.array_sort,
    "array_union": F.array_union,
    # stubs in reference
    "array_join": F.array_join,
    "arrays_overlap": F.arrays_overlap,
    "arrays_zip": F.arrays_zip,
    "collect_list": F.collect_list,
    "collect_set": F.collect_set,
    "map_concat": F.map_concat,
    "map_from_arrays": F.map_from_arrays,
    "map_from_entries": F.map_from_entries,
    "map_keys": F.map_keys,
    "map_values": F.map_values,
    # free upside: higher-order functions (the scale path for vector math)
    "transform": F.transform,
    "filter": F.filter,
    "aggregate": F.aggregate,
    "zip_with": F.zip_with,
    "exists": F.exists,
    "forall": F.forall,
    "flatten": F.flatten,
    "explode": F.explode,
    "explode_outer": F.explode_outer,
    "posexplode": F.posexplode,
    "element_at": F.element_at,
    "slice": F.slice,
    "size": F.size,
}


def get(name: str):
    return ARRAY_FUNCTIONS[name]
