"""Gale-Church sentence alignment — the bitext step for translation
corpora (parallel data for MT / multilingual LLM training).

Implements the published Gale & Church (1993) dynamic program exactly:
match cost = -100 * log of the length-difference probability, where
``delta = (l2 - l1*c) / sqrt(l1 * s2)`` with the paper's constants
``c = 1.0`` (expected char ratio) and ``s2 = 6.8`` (delta variance),
two-sided normal tail ``2 * (1 - Phi(|delta|))`` via ``math.erf``
(deterministic float, no tables), plus the paper's alignment-type
penalties in centinats: 1-1 = 0, 1-0 / 0-1 = 450, 2-1 / 1-2 = 230,
2-2 = 440.  The DP minimizes total cost over those six moves with
standard backtrace; ties break toward the earlier move in the fixed
move order (documented determinism).

Scale posture: the DP is O(n*m) PER DOCUMENT PAIR but document pairs
are independent rows — the Spark layer is a 1->N mapInPandas explode
over (src_lens, tgt_lens) arrays, embarrassingly parallel, no shuffle.
A guard refuses n*m beyond ``max_cells`` (default 4M — paragraph-level
pre-segmentation is the published discipline for book-length inputs,
exactly what Gale & Church do with hard paragraph boundaries).

Oracle discipline: catalog fixtures PLANT the optimal alignment
(proportional lengths force 1-1 everywhere except constructed 2-1 /
1-2 / 1-0 sites whose merged lengths keep delta = 0, so the planted
path dominates by the penalty margin); the DuckDB oracle states the
known optimum closed-form while the Spark side genuinely runs the DP.

Reference parity: no bitext surface in the reference; extends the
training-data layer (SURVEY §8).
"""

from __future__ import annotations

import math

__all__ = ["BitextError", "gale_church_align", "align_pairs",
           "ALIGN_SCHEMA"]

_PENALTY = {(1, 1): 0.0, (1, 0): 450.0, (0, 1): 450.0,
            (2, 1): 230.0, (1, 2): 230.0, (2, 2): 440.0}
_MOVES = [(1, 1), (1, 0), (0, 1), (2, 1), (1, 2), (2, 2)]
_C = 1.0
_S2 = 6.8


class BitextError(ValueError):
    """Malformed bitext input or a refused DP size."""


def _match_cost(l1: int, l2: int) -> float:
    if l1 == 0 and l2 == 0:
        return 0.0
    mean = (l1 + l2 / _C) / 2.0
    if mean <= 0:
        return 0.0
    delta = (l2 - l1 * _C) / math.sqrt(mean * _S2)
    # two-sided tail of the standard normal
    tail = 2.0 * (1.0 - 0.5 * (1.0 + math.erf(abs(delta) / math.sqrt(2.0))))
    if tail <= 0.0:
        return 2500.0  # ~ -100*log of the float tail floor; finite cap
    return -100.0 * math.log(tail)


def gale_church_align(
    src_lens: list[int], tgt_lens: list[int], *, max_cells: int = 4_000_000
) -> list[tuple[int, int, int, int]]:
    """Align source/target sentence LENGTH sequences; returns
    ``[(src_start, src_count, tgt_start, tgt_count), ...]`` in order.
    Counts per the six Gale-Church moves; empty inputs and negative
    lengths raise."""
    n, m = len(src_lens), len(tgt_lens)
    if n == 0 or m == 0:
        raise BitextError("empty sentence sequence")
    if any(v < 0 for v in src_lens) or any(v < 0 for v in tgt_lens):
        raise BitextError("negative sentence length")
    if (n + 1) * (m + 1) > max_cells:
        raise BitextError(
            f"DP size {(n + 1) * (m + 1)} cells exceeds max_cells="
            f"{max_cells} — pre-segment on paragraph boundaries (the "
            "published Gale-Church discipline) before aligning"
        )
    INF = float("inf")
    cost = [[INF] * (m + 1) for _ in range(n + 1)]
    back: list[list[tuple[int, int] | None]] = [
        [None] * (m + 1) for _ in range(n + 1)
    ]
    cost[0][0] = 0.0
    for i in range(n + 1):
        for j in range(m + 1):
            base = cost[i][j]
            if base == INF:
                continue
            for di, dj in _MOVES:
                ni, nj = i + di, j + dj
                if ni > n or nj > m:
                    continue
                l1 = sum(src_lens[i:ni])
                l2 = sum(tgt_lens[j:nj])
                c = base + _PENALTY[(di, dj)] + _match_cost(l1, l2)
                if c < cost[ni][nj]:
                    cost[ni][nj] = c
                    back[ni][nj] = (di, dj)
    if cost[n][m] == INF:
        raise BitextError("no alignment path")  # unreachable by move set
    out = []
    i, j = n, m
    while i or j:
        di, dj = back[i][j]
        out.append((i - di, di, j - dj, dj))
        i, j = i - di, j - dj
    out.reverse()
    return out


ALIGN_SCHEMA = (
    "doc_id bigint, align_idx int, src_start int, src_count int, "
    "tgt_start int, tgt_count int, src_len bigint, tgt_len bigint"
)


def align_pairs(df, id_col: str = "doc_id", src_col: str = "src_lens",
                tgt_col: str = "tgt_lens"):
    """1->N alignment explode over (id, src_lens[], tgt_lens[]) rows."""

    def _explode(batches):
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "align_idx", "src_start", "src_count",
                "tgt_start", "tgt_count", "src_len", "tgt_len",
            )}
            for doc_id, s, t in zip(pdf[id_col], pdf[src_col],
                                    pdf[tgt_col]):
                s, t = list(s), list(t)
                for ai, (ss, sc, ts, tc) in enumerate(
                    gale_church_align(s, t)
                ):
                    rows["doc_id"].append(doc_id)
                    rows["align_idx"].append(ai)
                    rows["src_start"].append(ss)
                    rows["src_count"].append(sc)
                    rows["tgt_start"].append(ts)
                    rows["tgt_count"].append(tc)
                    rows["src_len"].append(sum(s[ss : ss + sc]))
                    rows["tgt_len"].append(sum(t[ts : ts + tc]))
            yield pd.DataFrame(rows)

    return df.mapInPandas(_explode, ALIGN_SCHEMA)
