"""Chat-transcript operators: conversation validation, turn explode,
and deterministic template rendering — the RLHF/SFT data shape.

Post-training corpora are conversations: JSON arrays of ``{"role",
"content"}`` turns.  Before they become training rows they need (a)
STRUCTURAL VALIDATION — role whitelist, optional leading system turn,
strict user/assistant alternation ending on assistant (a transcript
that ends on a user turn has no training target), non-empty content —
(b) a TURN EXPLODE for per-turn analytics (lengths, role balance), and
(c) TEMPLATE RENDERING into the flat token stream actually trained on,
with deterministic delimiters and a documented loss-mask convention
(assistant spans are the only loss-bearing spans).

:func:`validate_conversation` raises :class:`ChatError` with the exact
defect (silently dropping malformed transcripts hides data bugs;
filtering belongs in an explicit WHERE over the validity column).
:func:`render_chatml` renders the widely used ChatML-style layout::

    <|im_start|>role\\ncontent<|im_end|>\\n

per turn, and returns ``(text, [(start, end), ...])`` — the character
spans of assistant CONTENT (the loss mask), exact by construction.
:func:`chat_turns` is the vectorized 1->N Spark explode carrying a
per-conversation ``valid``/``defect`` verdict instead of raising, so a
corpus pass quarantines rather than dies.

Oracles replay turn layout, span arithmetic and token counts
closed-form.  Per-row string work, no shuffle.  Reference parity: no
conversation surface in the reference; extends the training-data layer
(SURVEY §8).
"""

from __future__ import annotations

import json

__all__ = [
    "ChatError",
    "validate_conversation",
    "render_chatml",
    "chat_turns",
    "CHAT_TURN_SCHEMA",
]

_ROLES = {"system", "user", "assistant"}


class ChatError(ValueError):
    """Malformed conversation structure."""


def validate_conversation(turns: list) -> None:
    """Raise :class:`ChatError` naming the first defect; return None
    when the transcript is trainable (see module docstring)."""
    if not isinstance(turns, list) or not turns:
        raise ChatError("conversation is not a non-empty list")
    for i, t in enumerate(turns):
        if not isinstance(t, dict) or "role" not in t or "content" not in t:
            raise ChatError(f"turn {i} lacks role/content")
        if t["role"] not in _ROLES:
            raise ChatError(f"turn {i} role {t['role']!r} not in whitelist")
        if not isinstance(t["content"], str) or not t["content"].strip():
            raise ChatError(f"turn {i} has empty content")
    body = turns[1:] if turns[0]["role"] == "system" else turns
    if any(t["role"] == "system" for t in body):
        raise ChatError("system turn not at position 0")
    if not body:
        raise ChatError("no turns after the system prompt")
    for i, t in enumerate(body):
        want = "user" if i % 2 == 0 else "assistant"
        if t["role"] != want:
            raise ChatError(
                f"alternation break at turn {i}: got {t['role']!r}, "
                f"want {want!r}"
            )
    if body[-1]["role"] != "assistant":
        raise ChatError("transcript ends on a user turn (no target)")


def render_chatml(turns: list) -> tuple[str, list[tuple[int, int]]]:
    """ChatML-style rendering + assistant-content loss spans."""
    validate_conversation(turns)
    parts: list[str] = []
    spans: list[tuple[int, int]] = []
    pos = 0
    for t in turns:
        head = f"<|im_start|>{t['role']}\n"
        tail = "<|im_end|>\n"
        if t["role"] == "assistant":
            start = pos + len(head)
            spans.append((start, start + len(t["content"])))
        chunk = head + t["content"] + tail
        parts.append(chunk)
        pos += len(chunk)
    return "".join(parts), spans


CHAT_TURN_SCHEMA = (
    "doc_id bigint, turn_idx int, role string, n_chars int, "
    "n_words int, valid int, defect string"
)


def chat_turns(mm_df, id_col: str = "doc_id", payload_col: str = "payload"):
    """1->N turn explode with a per-conversation verdict: valid
    transcripts yield one row per turn (defect NULL); invalid ones
    yield a single row (turn_idx -1, role NULL) carrying the defect
    message — quarantine, don't die."""

    def _explode(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "turn_idx": [], "role": [],
                    "n_chars": [], "n_words": [], "valid": [], "defect": []}
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    turns = json.loads(bytes(p).decode("utf-8"))
                    validate_conversation(turns)
                except (ChatError, ValueError) as e:
                    rows["doc_id"].append(doc_id)
                    rows["turn_idx"].append(-1)
                    rows["role"].append(None)
                    rows["n_chars"].append(None)
                    rows["n_words"].append(None)
                    rows["valid"].append(0)
                    rows["defect"].append(str(e))
                    continue
                for ti, t in enumerate(turns):
                    rows["doc_id"].append(doc_id)
                    rows["turn_idx"].append(ti)
                    rows["role"].append(t["role"])
                    rows["n_chars"].append(len(t["content"]))
                    rows["n_words"].append(len(t["content"].split()))
                    rows["valid"].append(1)
                    rows["defect"].append(None)
            yield pd.DataFrame(rows)

    return mm_df.mapInPandas(_explode, CHAT_TURN_SCHEMA)
