"""Code-corpus ingestion operators: Jupyter notebook cell extraction,
license detection, and source-language identification — the triage
stack for a The-Stack-style code corpus.

- :func:`parse_ipynb` reads nbformat-4 notebooks (the JSON format on
  disk): per cell returns type, joined source, line count, execution
  count and output count — OUTPUTS ARE DROPPED from the source (cell
  outputs are where notebooks hide megabytes of base64 images and
  leaked data; training on them is a known corpus defect).  nbformat 3
  (``worksheets``) and missing ``cells`` gate loud.
- :func:`detect_license` resolves a license id two ways, in order:
  an ``SPDX-License-Identifier:`` declaration (exact, case-preserving),
  else distinctive-phrase matching for the common bodies (MIT,
  Apache-2.0, GPL-2.0/3.0 with the only/or-later distinction left
  unsplit, BSD-2/3-Clause split on the no-endorsement clause, MPL-2.0,
  Unlicense).  Returns ``(license_id, method)`` with ``(None, None)``
  for no match — absence is data; guessing would poison a
  license-filtered corpus.
- :func:`detect_source_lang` identifies a file's language by extension
  first, shebang second (``#!...python`` etc.), with ``None`` for
  unknown — again, no guessing.

Pure functions; the Spark layer is vectorized mapInPandas and the
oracles replay the laws closed-form.  Per-file string work, no shuffle.

Reference parity: no code-corpus surface in the reference; extends the
ingestion layer (SURVEY §8).
"""

from __future__ import annotations

import json
import re

__all__ = [
    "NotebookError",
    "parse_ipynb",
    "detect_license",
    "detect_source_lang",
    "ipynb_cells",
    "IPYNB_CELL_SCHEMA",
]


class NotebookError(ValueError):
    """Malformed .ipynb structure."""


def parse_ipynb(data: bytes) -> list[dict]:
    """nbformat-4 cells: ``[{"cell_type", "source", "n_lines",
    "execution_count", "n_outputs"}]`` in document order."""
    try:
        nb = json.loads(bytes(data).decode("utf-8"))
    except (UnicodeDecodeError, json.JSONDecodeError) as e:
        raise NotebookError(f"not JSON: {e}") from e
    if not isinstance(nb, dict):
        raise NotebookError("notebook root is not an object")
    if "worksheets" in nb:
        raise NotebookError(
            "nbformat 3 (worksheets) unsupported — convert first (fail-loud)"
        )
    cells = nb.get("cells")
    if not isinstance(cells, list):
        raise NotebookError("notebook carries no cells list")
    out = []
    for i, c in enumerate(cells):
        if not isinstance(c, dict) or "cell_type" not in c:
            raise NotebookError(f"cell {i} lacks cell_type")
        src = c.get("source", "")
        if isinstance(src, list):
            src = "".join(src)
        if not isinstance(src, str):
            raise NotebookError(f"cell {i} source is not text")
        out.append({
            "cell_type": c["cell_type"],
            "source": src,
            "n_lines": len(src.splitlines()),
            "execution_count": c.get("execution_count"),
            "n_outputs": len(c.get("outputs") or []),
        })
    return out


IPYNB_CELL_SCHEMA = (
    "doc_id bigint, cell_idx int, cell_type string, n_lines int, "
    "execution_count int, n_outputs int, source string"
)


def ipynb_cells(mm_df, id_col: str = "doc_id", payload_col: str = "payload"):
    """1->N cell explode over notebook payloads (outputs dropped)."""

    def _explode(batches):
        import pandas as pd

        for pdf in batches:
            rows = {"doc_id": [], "cell_idx": [], "cell_type": [],
                    "n_lines": [], "execution_count": [], "n_outputs": [],
                    "source": []}
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                for ci, c in enumerate(parse_ipynb(bytes(p))):
                    rows["doc_id"].append(doc_id)
                    rows["cell_idx"].append(ci)
                    rows["cell_type"].append(c["cell_type"])
                    rows["n_lines"].append(c["n_lines"])
                    rows["execution_count"].append(c["execution_count"])
                    rows["n_outputs"].append(c["n_outputs"])
                    rows["source"].append(c["source"])
            yield pd.DataFrame(rows)

    return mm_df.mapInPandas(_explode, IPYNB_CELL_SCHEMA)


_SPDX = re.compile(r"SPDX-License-Identifier:\s*([A-Za-z0-9.+-]+)")
_PHRASES = [
    ("MIT", "permission is hereby granted, free of charge"),
    ("Apache-2.0", "licensed under the apache license, version 2.0"),
    ("Unlicense", "this is free and unencumbered software"),
    ("MPL-2.0", "mozilla public license"),
]
_BSD = "redistribution and use in source and binary forms"
_BSD3 = "neither the name"
_GPL = "gnu general public license"


def detect_license(text: str) -> tuple[str | None, str | None]:
    """(license_id, 'spdx'|'phrase') or (None, None) — see module doc."""
    m = _SPDX.search(text)
    if m:
        return m.group(1), "spdx"
    low = " ".join(text.lower().split())
    for lid, phrase in _PHRASES:
        if phrase in low:
            return lid, "phrase"
    if _BSD in low:
        return ("BSD-3-Clause" if _BSD3 in low else "BSD-2-Clause"), "phrase"
    if _GPL in low:
        if "version 3" in low or "gplv3" in low:
            return "GPL-3.0", "phrase"
        if "version 2" in low or "gplv2" in low:
            return "GPL-2.0", "phrase"
        return "GPL", "phrase"
    return None, None


_EXT_LANG = {
    ".py": "python", ".pyi": "python", ".ipynb": "jupyter",
    ".js": "javascript", ".mjs": "javascript", ".ts": "typescript",
    ".tsx": "typescript", ".jsx": "javascript",
    ".java": "java", ".kt": "kotlin", ".scala": "scala",
    ".c": "c", ".h": "c", ".cc": "cpp", ".cpp": "cpp", ".hpp": "cpp",
    ".cs": "csharp", ".go": "go", ".rs": "rust", ".rb": "ruby",
    ".php": "php", ".swift": "swift", ".m": "objective-c",
    ".sh": "shell", ".bash": "shell", ".zsh": "shell",
    ".sql": "sql", ".r": "r", ".jl": "julia", ".lua": "lua",
    ".pl": "perl", ".hs": "haskell", ".ml": "ocaml", ".ex": "elixir",
    ".clj": "clojure", ".dart": "dart", ".zig": "zig",
    ".html": "html", ".css": "css", ".xml": "xml", ".json": "json",
    ".yaml": "yaml", ".yml": "yaml", ".toml": "toml", ".md": "markdown",
}
_SHEBANG_LANG = [
    ("python", "python"), ("node", "javascript"), ("bash", "shell"),
    ("sh", "shell"), ("zsh", "shell"), ("perl", "perl"), ("ruby", "ruby"),
    ("Rscript", "r"), ("php", "php"),
]


def detect_source_lang(path: str, text: str = "") -> str | None:
    """Extension first, shebang second, None for unknown."""
    low = path.lower()
    dot = low.rfind(".")
    if dot >= 0:
        lang = _EXT_LANG.get(low[dot:])
        if lang:
            return lang
    first = text.split("\n", 1)[0] if text else ""
    if first.startswith("#!"):
        for tok, lang in _SHEBANG_LANG:
            if tok in first:
                return lang
    return None
