"""Maintain TOUCHED.txt — the census of catalog queries that some DRIVER or
seeded-audit run has independently verified (VERDICT r4 #6).

"Touched" = the query has a row in any committed ``CORRECTNESS_r*.json``
(the driver's 50-query gate) or ``CORRECTNESS_sample_r*.json`` (the seeded
rotating spot-set the judge replays).  The builder's full-catalog
``CORRECTNESS_local_r*.json`` runs deliberately do NOT count: they cover
everything every round, so they carry no information about which queries
still lack an independent-protocol check.

``tools/check.py --sample N --seed R`` reads TOUCHED.txt and over-weights
the never-touched remainder (60% of the sample budget) so each round's
committed spot-set burns down the untouched census instead of re-rolling
the same popular queries.

Usage: python tools/update_touched.py   (writes TOUCHED.txt, prints census)
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import __spark_entry__ as entry_mod

    names = set(entry_mod.queries())
    touched: set[str] = set()
    sources = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        + glob.glob(os.path.join(REPO, "CORRECTNESS_sample_r*.json"))
    )
    for path in sources:
        try:
            with open(path) as fh:
                d = json.load(fh)
            # driver files are flat {query: row}; tools/check.py files wrap
            # the per-query rows under a "queries" key
            touched |= set(d["queries"] if "queries" in d else d)
        except (OSError, ValueError, TypeError) as e:
            print(f"warn: skipping {os.path.basename(path)}: {e}")
    touched &= names  # renamed/removed queries drop out
    with open(os.path.join(REPO, "TOUCHED.txt"), "w") as fh:
        fh.write("\n".join(sorted(touched)) + "\n")
    untouched = sorted(names - touched)
    print(
        f"TOUCHED.txt: {len(touched)} touched / {len(names)} catalog; "
        f"{len(untouched)} never driver/sample-checked"
    )
    if untouched:
        print("untouched: " + " ".join(untouched))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
