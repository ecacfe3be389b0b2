"""Round-9 chat-transcript + JSON-Schema tests (operators/chat.py,
operators/jsonschema.py) behind q433/q434."""

import json

import pytest

from rust_dataframe_spark.operators.chat import (
    ChatError,
    chat_turns,
    render_chatml,
    validate_conversation,
)
from rust_dataframe_spark.operators.jsonschema import (
    SchemaError,
    is_valid_json,
    validate_json,
)

OK = [
    {"role": "system", "content": "be nice"},
    {"role": "user", "content": "hi there"},
    {"role": "assistant", "content": "hello!"},
    {"role": "user", "content": "bye"},
    {"role": "assistant", "content": "later"},
]


class TestChat:
    def test_valid_passes(self):
        validate_conversation(OK)
        validate_conversation(OK[1:])  # no system prompt is fine

    def test_defect_messages(self):
        cases = [
            ([], "non-empty"),
            ([{"role": "user", "content": "x"}], "ends on a user"),
            ([{"role": "user", "content": "x"},
              {"role": "user", "content": "y"}], "alternation"),
            ([{"role": "assistant", "content": "x"}], "alternation"),
            ([{"role": "user", "content": "x"},
              {"role": "assistant", "content": "  "}], "empty content"),
            ([{"role": "tool", "content": "x"}], "whitelist"),
            ([{"role": "user", "content": "x"},
              {"role": "system", "content": "y"}], "position 0"),
        ]
        for turns, frag in cases:
            with pytest.raises(ChatError, match=frag):
                validate_conversation(turns)

    def test_render_spans_exact(self):
        text, spans = render_chatml(OK)
        assert [text[s:e] for s, e in spans] == ["hello!", "later"]
        # spans cover ONLY assistant content — no delimiters inside
        for s, e in spans:
            assert "<|im_" not in text[s:e]
        assert text.count("<|im_start|>") == len(OK)
        assert text.count("<|im_end|>\n") == len(OK)

    def test_spark_quarantine_rows(self, spark):
        from pyspark.sql import Row

        good = json.dumps(OK).encode()
        bad = json.dumps([{"role": "user", "content": "x"}]).encode()
        df = spark.createDataFrame([
            Row(doc_id=1, payload=bytearray(good)),
            Row(doc_id=2, payload=bytearray(bad)),
        ])
        out = chat_turns(df).orderBy("doc_id", "turn_idx").collect()
        assert [r.turn_idx for r in out if r.doc_id == 1] == [0, 1, 2, 3, 4]
        quarantine = [r for r in out if r.doc_id == 2]
        assert len(quarantine) == 1
        assert quarantine[0].valid == 0
        assert "ends on a user" in quarantine[0].defect


SCHEMA = {
    "type": "object",
    "required": ["name"],
    "additionalProperties": False,
    "properties": {
        "name": {"type": "string", "pattern": "^[a-z_]+$"},
        "limit": {"type": "integer", "minimum": 1, "maximum": 100},
        "tags": {"type": "array", "items": {"type": "string"},
                 "maxItems": 2},
        "mode": {"enum": ["fast", "slow", 2]},
    },
}


class TestJsonSchema:
    def test_valid(self):
        assert is_valid_json(
            {"name": "ok", "limit": 5, "tags": ["a"], "mode": 2}, SCHEMA
        )

    def test_each_constraint(self):
        errs = dict(validate_json(
            {"name": "Bad!", "limit": 0, "tags": ["a", "b", "c"],
             "mode": "off", "x": 1},
            SCHEMA,
        ))
        assert "pattern" in errs["$.name"]
        assert "minimum" in errs["$.limit"]
        assert "maxItems" in errs["$.tags"]
        assert "enum" in errs["$.mode"]
        assert "additional" in errs["$.x"]
        assert any("required" in m for _, m in validate_json({}, SCHEMA))

    def test_bool_is_not_integer(self):
        assert validate_json(True, {"type": "integer"})
        assert not validate_json(True, {"type": "boolean"})
        # and JSON true never satisfies enum [1], nor 1 enum [true]
        assert validate_json(True, {"enum": [1]})
        assert validate_json(1, {"enum": [True]})
        assert not validate_json(1, {"enum": [1]})

    def test_nested_paths_and_items(self):
        schema = {"type": "array",
                  "items": {"type": "object", "required": ["k"],
                            "properties": {"k": {"type": "integer"}}}}
        errs = validate_json([{"k": 1}, {"k": "x"}, {}], schema)
        assert ("$[1].k", "type is not integer") in errs
        assert ("$[2].k", "required property missing") in errs

    def test_type_union(self):
        s = {"type": ["string", "null"]}
        assert not validate_json(None, s)
        assert not validate_json("x", s)
        assert validate_json(3, s)

    def test_unsupported_keywords_gate(self):
        for kw in ("$ref", "anyOf", "oneOf", "allOf", "not"):
            with pytest.raises(SchemaError, match="unsupported"):
                validate_json({}, {kw: []})
        with pytest.raises(SchemaError, match="tuple-form"):
            validate_json([1], {"items": [{"type": "integer"}]})
