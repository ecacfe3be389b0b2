"""RFC 5322 / MIME email extraction — the mailing-list-archive corpus
shape (mbox-style message explode, multipart walk, transfer-decoding,
quote stripping).

Mailing-list archives are a classic LLM text source and arrive as mbox
files: messages separated by ``From `` lines, each an RFC 5322 message
whose body may be a MIME multipart tree with base64 / quoted-printable
transfer encodings and charset-tagged parts.  This module implements:

- :func:`split_mbox` — the mboxrd convention: messages split on
  ``\\nFrom `` separators, ``>From `` unstuffing applied to body lines
  (the historical escaping that protects literal From-lines); a payload
  that does not start with ``From `` raises.
- :func:`parse_email` — stdlib ``email`` parse with ``policy.default``;
  extracts Subject / From / Date / Message-ID, walks the MIME tree and
  concatenates ONLY ``text/plain`` leaves (decoded per their declared
  transfer encoding and charset — the stdlib handles base64/QP; we
  enforce that a multipart with no text/plain leaf is a data defect:
  html-only mail gates loud rather than silently yielding nothing).
- :func:`strip_quotes` — drops quoted reply lines (``>`` prefixes) and
  the ``wrote:`` attribution line immediately above a quote block, plus
  signature blocks below the ``-- `` marker — the dedup-critical
  cleanup (quoted text re-counts the parent message).

The Spark layer explodes one mbox payload into one row per message.
Oracles replay counts/strings closed-form.  Reference parity: no mail
surface in the reference; extends the ingestion layer (SURVEY §8).
"""

from __future__ import annotations

__all__ = ["MailError", "split_mbox", "parse_email", "strip_quotes",
           "mbox_messages", "MAIL_SCHEMA"]


class MailError(ValueError):
    """Malformed mbox/MIME structure."""


def split_mbox(data: bytes) -> list[bytes]:
    """Split an mbox payload into raw RFC 5322 messages (mboxrd
    unstuffing applied)."""
    data = bytes(data)
    if not data.startswith(b"From "):
        raise MailError("payload does not start with an mbox From line")
    msgs: list[bytes] = []
    for chunk in data.split(b"\nFrom "):
        if not chunk.strip():
            continue
        if not msgs:
            chunk = chunk[chunk.index(b"\n") + 1 :]  # drop 'From ...' line
        else:
            chunk = chunk[chunk.index(b"\n") + 1 :]
        # mboxrd unstuffing: '>From ' at line start -> 'From '
        lines = chunk.split(b"\n")
        out = []
        for ln in lines:
            stripped = ln
            probe = ln
            n = 0
            while probe.startswith(b">"):
                probe = probe[1:]
                n += 1
            if n and probe.startswith(b"From "):
                stripped = ln[1:]
            out.append(stripped)
        msgs.append(b"\n".join(out))
    if not msgs:
        raise MailError("mbox carries no messages")
    return msgs


def parse_email(raw: bytes) -> dict:
    """Headers + concatenated text/plain body (see module docstring)."""
    import email
    from email import policy

    try:
        msg = email.message_from_bytes(bytes(raw), policy=policy.default)
    except Exception as e:  # stdlib raises a zoo of types here
        raise MailError(f"unparseable message: {e}") from e
    parts: list[str] = []
    n_attachments = 0
    for part in msg.walk():
        if part.is_multipart():
            continue
        ctype = part.get_content_type()
        if ctype == "text/plain" and not part.get_filename():
            try:
                parts.append(part.get_content())
            except Exception as e:
                raise MailError(f"undecodable text part: {e}") from e
        else:
            n_attachments += 1
    if not parts:
        raise MailError(
            f"no text/plain leaf (content-type {msg.get_content_type()!r}) "
            "— html-only or binary mail gates loud"
        )
    return {
        "subject": str(msg.get("Subject", "")),
        "from": str(msg.get("From", "")),
        "date": str(msg.get("Date", "")),
        "message_id": str(msg.get("Message-ID", "")),
        "text": "\n".join(parts),
        "n_attachments": n_attachments,
    }


def strip_quotes(text: str) -> str:
    """Drop quoted reply blocks, their attribution line, and the
    signature below ``-- `` (see module docstring)."""
    lines = text.split("\n")
    out: list[str] = []
    for i, ln in enumerate(lines):
        s = ln.rstrip("\r")
        if s == "-- ":
            break  # signature marker: everything below is signature
        if s.lstrip().startswith(">"):
            continue
        nxt = lines[i + 1].lstrip() if i + 1 < len(lines) else ""
        if s.rstrip().endswith("wrote:") and nxt.startswith(">"):
            continue  # attribution line above a quote block
        out.append(s)
    # collapse runs of blank lines the removals leave behind
    cleaned: list[str] = []
    for ln in out:
        if ln.strip() or (cleaned and cleaned[-1].strip()):
            cleaned.append(ln)
    while cleaned and not cleaned[-1].strip():
        cleaned.pop()
    return "\n".join(cleaned)


MAIL_SCHEMA = (
    "doc_id bigint, msg_idx int, subject string, sender string, "
    "message_id string, n_attachments int, n_tokens int, text string"
)


def mbox_messages(mm_df, id_col: str = "doc_id",
                  payload_col: str = "payload"):
    """1->N message explode: mbox split -> MIME walk -> quote strip ->
    whitespace token count."""

    def _explode(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "msg_idx": [], "subject": [],
                    "sender": [], "message_id": [], "n_attachments": [],
                    "n_tokens": [], "text": []}
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                for mi, raw in enumerate(split_mbox(bytes(p))):
                    m = parse_email(raw)
                    clean = strip_quotes(m["text"])
                    rows["doc_id"].append(doc_id)
                    rows["msg_idx"].append(mi)
                    rows["subject"].append(m["subject"])
                    rows["sender"].append(m["from"])
                    rows["message_id"].append(m["message_id"])
                    rows["n_attachments"].append(m["n_attachments"])
                    rows["n_tokens"].append(len(clean.split()))
                    rows["text"].append(clean)
            yield pd.DataFrame(rows)

    return mm_df.mapInPandas(_explode, MAIL_SCHEMA)
