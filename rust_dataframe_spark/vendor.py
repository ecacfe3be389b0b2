"""Optional third-party shims for batteries the container lacks.

The repo's rule is "no pip install, gate everything behind an import-try".
One gap matters in practice: Spark 4's ``transformWithStateInPandas``
Python runner needs ``google.protobuf`` (its state-server protocol is
protobuf-framed), which isn't installed in this container's site-packages.
A current protobuf build (6.x) does, however, ship inside the container's
public Google Cloud SDK install.  :func:`ensure_protobuf` makes it
importable — appended (never prepended) to ``sys.path`` so nothing already
installed can be shadowed, and mirrored into ``PYTHONPATH`` so forked
Python *workers* (which do their own imports) see it too.

Strictly best-effort: if neither site-packages nor the fallback location
has protobuf, callers get ``False`` and skip the TWS feature exactly as
before.  Nothing here is required for any batch/SQL path.
"""

from __future__ import annotations

import os
import sys

# Public Google Cloud SDK locations that bundle the protobuf python package.
_PROTOBUF_FALLBACK_DIRS = [
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
]


def _importable() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _vendor_cache_dir() -> str | None:
    """Per-user scratch location for the patched copy (never inside the
    repo; rebuilt on demand, safe to delete).

    Security (ADVICE r4): a fixed world-writable path like
    ``/tmp/spark_graft_vendor`` lets another local user pre-plant a
    malicious ``google/protobuf`` plus marker file and get code execution
    in this process and every forked worker.  So: the cache lives under
    the user's own cache root (``$XDG_CACHE_HOME`` / ``~/.cache``),
    created 0700; an existing directory is REFUSED unless it is owned by
    the current uid and not group/world-writable, falling back to a fresh
    ``mkdtemp`` (0700 by construction) for this process.  An explicit
    ``SPARK_GRAFT_VENDOR_DIR`` override is validated the same way.
    """
    import stat
    import tempfile

    cand = os.environ.get("SPARK_GRAFT_VENDOR_DIR") or os.path.join(
        os.environ.get("XDG_CACHE_HOME")
        or os.path.join(os.path.expanduser("~"), ".cache"),
        "spark_graft_vendor",
    )
    try:
        os.makedirs(cand, mode=0o700, exist_ok=True)
        st = os.stat(cand)
        if st.st_uid == os.getuid() and not (
            st.st_mode & (stat.S_IWGRP | stat.S_IWOTH)
        ):
            return cand
    except OSError:
        pass
    try:
        return tempfile.mkdtemp(prefix="spark_graft_vendor_")
    except OSError:
        return None

_PATCH = """

# --- spark-graft patch -------------------------------------------------------
# The SDK's bundled runtime self-reports 6.32.0-dev while Spark's generated
# StateMessage_pb2 was emitted by protoc 6.33 — one minor ahead, and the
# strict gencode<=runtime + suffix-equality check refuses to load it even
# though the wire format is unchanged across that span.  This vendored COPY
# (the SDK install itself is untouched) neuters the check; if a genuinely
# incompatible proto ever loads, the descriptor pool still raises its own
# errors.
def ValidateProtobufRuntimeVersion(*args, **kwargs):  # noqa: F811
    return None
"""


def _build_vendored_copy(src_root: str) -> str | None:
    """Copy ``google/protobuf`` from the SDK into the scratch cache with the
    version gate patched out.  Returns the importable root or None."""
    import shutil

    dst_root = _vendor_cache_dir()
    if dst_root is None:
        return None
    pkg = os.path.join(dst_root, "google", "protobuf")
    marker = os.path.join(pkg, ".spark_graft_patched")
    if not os.path.exists(marker):
        try:
            shutil.rmtree(os.path.join(dst_root, "google"), ignore_errors=True)
            os.makedirs(os.path.join(dst_root, "google"), exist_ok=True)
            shutil.copytree(os.path.join(src_root, "google", "protobuf"), pkg)
            rv = os.path.join(pkg, "runtime_version.py")
            with open(rv, "a") as f:
                f.write(_PATCH)
            with open(marker, "w") as f:
                f.write("patched\n")
        except OSError:
            return None
    return dst_root


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable in this process AND in Python
    workers Spark forks later.  Returns True iff protobuf is usable.

    Call BEFORE creating the SparkSession — workers inherit ``PYTHONPATH``
    from the JVM's environment, which is captured at session start.
    """
    if _importable():
        return True
    for cand in _PROTOBUF_FALLBACK_DIRS:
        if not os.path.isdir(os.path.join(cand, "google", "protobuf")):
            continue
        root = _build_vendored_copy(cand)
        if root is None:
            continue
        if root not in sys.path:
            sys.path.append(root)
        pp = os.environ.get("PYTHONPATH", "")
        if root not in pp.split(os.pathsep):
            os.environ["PYTHONPATH"] = f"{pp}{os.pathsep}{root}" if pp else root
        if _importable():
            return True
    return False
