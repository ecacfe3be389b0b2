"""SRT / WebVTT subtitle parsing — the caption format speech/video
training pipelines align transcripts with (subtitle-aligned clips are
the standard weak supervision for ASR and video-text models).

Pure-stdlib, fail-loud parsers for the two formats that cover real
caption corpora:

- **SRT**: numbered cue blocks, ``HH:MM:SS,mmm --> HH:MM:SS,mmm``
  timestamp lines (comma decimal), blank-line separation.  Cue numbers
  are validated to be strictly increasing (a shuffled or spliced file
  fails loud); timestamps must be well-ordered within a cue
  (``end > start``).
- **WebVTT** (W3C): ``WEBVTT`` signature line, ``.``-decimal
  timestamps, optional cue identifiers, cue settings after the arrow
  (kept verbatim), ``NOTE``/``STYLE``/``REGION`` blocks skipped,
  hour field optional (``MM:SS.mmm``).

Both return ``[(cue_idx, start_ms, end_ms, text)]`` with cue text
joined by a single ``\\n`` per line and inline whitespace normalized;
``cue_idx`` is the 0-based document order (not the SRT number — those
restart in spliced files and are validated instead of trusted).

The Spark operator explodes one subtitle payload row into one row per
cue (1->N mapInPandas), after which cue-to-frame alignment is a plain
range join (``start_ms <= frame_ts < end_ms``) — deliberately left to
the DataFrame layer where Catalyst can plan it, not hidden inside the
parser.

Reference parity: no subtitle surface in the reference; extends the
multimodal matrix (SURVEY §8).
"""

from __future__ import annotations

import re

__all__ = [
    "SubtitleError",
    "parse_srt",
    "parse_vtt",
    "subtitle_cues",
    "CUE_SCHEMA",
]


class SubtitleError(ValueError):
    """Malformed SRT/VTT structure."""


_SRT_TS = re.compile(
    r"^(\d{1,2}):([0-5]\d):([0-5]\d),(\d{3})$"
)
_VTT_TS = re.compile(
    r"^(?:(\d{1,4}):)?([0-5]\d):([0-5]\d)\.(\d{3})$"
)


def _ms(m, *, vtt: bool) -> int:
    if vtt:
        hh = int(m.group(1) or 0)
    else:
        hh = int(m.group(1))
    return ((hh * 60 + int(m.group(2))) * 60 + int(m.group(3))) * 1000 + int(
        m.group(4)
    )


def _norm_text(lines: list[str]) -> str:
    return "\n".join(" ".join(ln.split()) for ln in lines if ln.strip())


def parse_srt(text: str) -> list[tuple[int, int, int, str]]:
    """Parse SubRip: returns ``[(cue_idx, start_ms, end_ms, text)]``."""
    blocks = re.split(r"\n\s*\n", text.replace("\r\n", "\n").strip())
    out: list[tuple[int, int, int, str]] = []
    last_num = 0
    for b in blocks:
        lines = b.split("\n")
        if len(lines) < 2:
            raise SubtitleError(f"SRT cue block too short: {b[:40]!r}")
        try:
            num = int(lines[0].strip())
        except ValueError as e:
            raise SubtitleError(
                f"SRT cue number expected, got {lines[0]!r}"
            ) from e
        if num <= last_num:
            raise SubtitleError(
                f"SRT cue numbers not increasing at {num} (after {last_num})"
            )
        last_num = num
        parts = lines[1].split("-->")
        if len(parts) != 2:
            raise SubtitleError(f"SRT timing line malformed: {lines[1]!r}")
        m1 = _SRT_TS.match(parts[0].strip())
        m2 = _SRT_TS.match(parts[1].strip())
        if not m1 or not m2:
            raise SubtitleError(f"SRT timestamp malformed: {lines[1]!r}")
        s, e = _ms(m1, vtt=False), _ms(m2, vtt=False)
        if e <= s:
            raise SubtitleError(f"SRT cue {num} ends before it starts")
        out.append((len(out), s, e, _norm_text(lines[2:])))
    if not out:
        raise SubtitleError("empty SRT")
    return out


def parse_vtt(text: str) -> list[tuple[int, int, int, str]]:
    """Parse WebVTT: returns ``[(cue_idx, start_ms, end_ms, text)]``;
    NOTE/STYLE/REGION blocks are skipped, cue identifiers allowed."""
    text = text.replace("\r\n", "\n")
    if text.lstrip("﻿").split("\n", 1)[0].strip().split(" ")[0] != (
        "WEBVTT"
    ):
        raise SubtitleError("missing WEBVTT signature line")
    body = text.split("\n", 1)[1] if "\n" in text else ""
    out: list[tuple[int, int, int, str]] = []
    for b in re.split(r"\n\s*\n", body.strip()):
        lines = [ln for ln in b.split("\n")]
        if not lines or not lines[0].strip():
            continue
        head = lines[0].strip()
        if head.startswith(("NOTE", "STYLE", "REGION")):
            continue
        ti = 0 if "-->" in lines[0] else 1
        if ti >= len(lines) or "-->" not in lines[ti]:
            raise SubtitleError(f"VTT cue without timing line: {b[:40]!r}")
        timing = lines[ti].split("-->")
        m1 = _VTT_TS.match(timing[0].strip())
        right = timing[1].strip().split(None, 1)
        m2 = _VTT_TS.match(right[0])
        if not m1 or not m2:
            raise SubtitleError(f"VTT timestamp malformed: {lines[ti]!r}")
        s, e = _ms(m1, vtt=True), _ms(m2, vtt=True)
        if e <= s:
            raise SubtitleError("VTT cue ends before it starts")
        out.append((len(out), s, e, _norm_text(lines[ti + 1 :])))
    if not out:
        raise SubtitleError("VTT carries no cues")
    return out


CUE_SCHEMA = (
    "doc_id bigint, cue_idx int, start_ms bigint, end_ms bigint, "
    "n_words int, text string"
)


def subtitle_cues(mm_df, id_col: str = "doc_id",
                  payload_col: str = "payload"):
    """1->N cue explode; format picked by signature (WEBVTT line vs SRT
    numeric block).  Downstream frame alignment is a plain range join
    on (start_ms, end_ms) — left to the DataFrame layer."""

    def _explode(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "cue_idx": [], "start_ms": [],
                    "end_ms": [], "n_words": [], "text": []}
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                t = bytes(p).decode("utf-8", "replace")
                cues = (
                    parse_vtt(t)
                    if t.lstrip("﻿").startswith("WEBVTT")
                    else parse_srt(t)
                )
                for ci, s, e, txt in cues:
                    rows["doc_id"].append(doc_id)
                    rows["cue_idx"].append(ci)
                    rows["start_ms"].append(s)
                    rows["end_ms"].append(e)
                    rows["n_words"].append(len(txt.split()))
                    rows["text"].append(txt)
            yield pd.DataFrame(rows)

    return mm_df.mapInPandas(_explode, CUE_SCHEMA)
