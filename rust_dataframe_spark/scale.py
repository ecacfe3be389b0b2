"""Size-thresholded exact→approximate auto-degrade (VERDICT r3 next-round #3).

A handful of catalog queries have an *exact* formulation that is correct and
oracle-pinnable at test scale but single-machine-hostile at 100 TB — exact
``F.percentile`` (full value buffer per group) and the exact Mann-Whitney
rank AUC (global sort).  Each of those queries already documents its
at-scale substitute (``percentile_approx`` with the q266 rank-error
certificate; the binned-ECDF AUC).  This module makes the substitution
AUTOMATIC instead of aspirational:

* ``SPARK_GRAFT_SCALE_MODE`` = ``exact`` | ``approx`` | ``auto`` (default
  ``auto``).
* In ``auto`` mode a query asks :func:`use_approx` with its driving input;
  the decision is a parquet-metadata-cheap ``count()`` compared against
  ``SPARK_GRAFT_EXACT_ROWS_MAX`` (default 75 000 — sized so the sf0.01
  correctness gate runs the exact, oracle-hash-matched path while the
  sf0.1 bench exercises the approx path every round; production deployments
  set it to their memory budget, e.g. 10M rows per grouped percentile).
* Counts are cached per logical input so repeated catalog calls in one
  session don't re-run the job.

Parity between the two modes is test-pinned with explicit error bounds in
tests/test_scale_mode.py (rank error ≤ n/accuracy for percentiles — the
q266 certificate machinery — and ≤ max-bin-mass for the binned AUC).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

MODE_ENV = "SPARK_GRAFT_SCALE_MODE"
THRESHOLD_ENV = "SPARK_GRAFT_EXACT_ROWS_MAX"
DEFAULT_EXACT_ROWS_MAX = 75_000

#: accuracy passed to percentile_approx on the degraded path — rank error
#: is bounded by n / accuracy (pinned by q266's certificate query).
APPROX_ACCURACY = 10_000

_COUNT_CACHE: dict[str, int] = {}

#: Catalog queries with a documented exact→approx auto-degrade path.  The
#: correctness harness (tools/check.py) uses this to classify an auto-mode
#: value divergence on one of THESE queries as ``weak-approx`` (the
#: documented, parity-bounded substitute ran — see tests/test_scale_mode.py)
#: instead of ``fail``; any other divergence is still a hard fail, and in
#: ``exact`` mode these five hold the exact-hash gate like everything else.
APPROX_QUERIES = frozenset(
    {
        "q240_mad_outliers",
        "q247_equidepth_hist",
        "q288_auc",
        "q289_rolling_median",
        "q295_time_to_convert",
    }
)


def scale_mode() -> str:
    """Current mode: ``exact``, ``approx``, or ``auto`` (the default)."""
    mode = os.environ.get(MODE_ENV, "auto").strip().lower()
    if mode not in ("exact", "approx", "auto"):
        raise ValueError(f"{MODE_ENV} must be exact|approx|auto, got {mode!r}")
    return mode


def exact_rows_max() -> int:
    return int(os.environ.get(THRESHOLD_ENV, DEFAULT_EXACT_ROWS_MAX))


def _cached_count(df: DataFrame, cache_key: str | None) -> int:
    if cache_key is not None and cache_key in _COUNT_CACHE:
        return _COUNT_CACHE[cache_key]
    n = df.count()
    if cache_key is not None:
        _COUNT_CACHE[cache_key] = n
    return n


def use_approx(df: DataFrame, *, cache_key: str | None = None) -> bool:
    """Should this query take its approximate path?

    ``df`` is the query's driving input (ideally the bare table scan so the
    count is parquet-metadata cheap).  ``cache_key`` memoizes the count for
    repeated calls (pass e.g. ``f"{sf_dir}/lineitem"``).
    """
    mode = scale_mode()
    if mode == "exact":
        return False
    if mode == "approx":
        return True
    return _cached_count(df, cache_key) > exact_rows_max()
