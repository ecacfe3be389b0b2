"""Minimal JSON-Schema validation — the data-quality filter for
structured-output / function-calling training data.

Tool-use corpora are JSON documents that must match a declared schema;
rows that don't are training poison (the model learns that schema
violations are acceptable).  This validator implements the draft-07
core subset those corpora actually use — ``type`` (object / array /
string / number / integer / boolean / null, or a list of types),
``properties`` + ``required`` + boolean ``additionalProperties``,
``items`` (single-schema form), ``enum`` (deep equality), ``minimum``
/ ``maximum``, ``minLength`` / ``maxLength``, ``minItems`` /
``maxItems``, ``pattern`` (Python ``re.search``, the spec's regex
dialect for this subset) — and GATES LOUD on the composition keywords
it does not implement (``$ref``, ``anyOf``, ``oneOf``, ``allOf``,
``not``, ``if``): a validator that silently ignores an unknown
constraint passes garbage, the worst failure mode for a filter.

:func:`validate_json` returns the list of violations as
``(json_path, message)`` — empty means valid — so the Spark layer is
a vectorized verdict column, not an exception storm.  JSON ``true``
is NOT an integer 1 here (bool is checked before int — the classic
Python pitfall a naive isinstance validator gets wrong).

Oracles replay verdicts closed-form.  Reference parity: no schema
surface in the reference; extends the training-data layer (SURVEY §8).
"""

from __future__ import annotations

import re

__all__ = ["SchemaError", "validate_json", "is_valid_json"]

_UNSUPPORTED = {"$ref", "anyOf", "oneOf", "allOf", "not", "if", "then",
                "else", "patternProperties", "dependencies"}


class SchemaError(ValueError):
    """The SCHEMA itself is malformed or uses unsupported keywords."""


def _type_ok(v, t: str) -> bool:
    if t == "object":
        return isinstance(v, dict)
    if t == "array":
        return isinstance(v, list)
    if t == "string":
        return isinstance(v, str)
    if t == "boolean":
        return isinstance(v, bool)
    if t == "integer":
        return isinstance(v, int) and not isinstance(v, bool)
    if t == "number":
        return isinstance(v, (int, float)) and not isinstance(v, bool)
    if t == "null":
        return v is None
    raise SchemaError(f"unknown type {t!r}")


def validate_json(value, schema: dict, path: str = "$") -> list[tuple[str,
                                                                      str]]:
    """Violations as (json_path, message); [] = valid."""
    if not isinstance(schema, dict):
        raise SchemaError(f"schema at {path} is not an object")
    bad = _UNSUPPORTED & set(schema)
    if bad:
        raise SchemaError(
            f"unsupported schema keywords {sorted(bad)} at {path} — "
            "refusing to half-validate (fail-loud)"
        )
    errs: list[tuple[str, str]] = []
    t = schema.get("type")
    if t is not None:
        types = t if isinstance(t, list) else [t]
        if not any(_type_ok(value, x) for x in types):
            errs.append((path, f"type is not {t}"))
            return errs  # structural mismatch: deeper checks meaningless
    if "enum" in schema:
        if not any(
            type(value) is type(e) and value == e
            if isinstance(e, bool) or isinstance(value, bool)
            else value == e
            for e in schema["enum"]
        ):
            errs.append((path, "value not in enum"))
    if isinstance(value, str):
        n = len(value)
        if "minLength" in schema and n < schema["minLength"]:
            errs.append((path, f"length {n} < minLength"))
        if "maxLength" in schema and n > schema["maxLength"]:
            errs.append((path, f"length {n} > maxLength"))
        if "pattern" in schema and not re.search(schema["pattern"], value):
            errs.append((path, "pattern mismatch"))
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        if "minimum" in schema and value < schema["minimum"]:
            errs.append((path, f"{value} < minimum"))
        if "maximum" in schema and value > schema["maximum"]:
            errs.append((path, f"{value} > maximum"))
    if isinstance(value, dict):
        props = schema.get("properties", {})
        for k in schema.get("required", []):
            if k not in value:
                errs.append((f"{path}.{k}", "required property missing"))
        for k, v in value.items():
            if k in props:
                errs.extend(validate_json(v, props[k], f"{path}.{k}"))
            elif schema.get("additionalProperties", True) is False:
                errs.append((f"{path}.{k}", "additional property refused"))
    if isinstance(value, list):
        n = len(value)
        if "minItems" in schema and n < schema["minItems"]:
            errs.append((path, f"{n} items < minItems"))
        if "maxItems" in schema and n > schema["maxItems"]:
            errs.append((path, f"{n} items > maxItems"))
        items = schema.get("items")
        if isinstance(items, dict):
            for i, v in enumerate(value):
                errs.extend(validate_json(v, items, f"{path}[{i}]"))
        elif items is not None:
            raise SchemaError("tuple-form items unsupported (fail-loud)")
    return errs


def is_valid_json(value, schema: dict) -> bool:
    return not validate_json(value, schema)
