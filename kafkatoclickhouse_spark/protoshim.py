"""Protobuf runtime discovery for ``transformWithStateInPandas``.

Spark 4's typed-state API talks to the JVM state server over a
protobuf protocol (``pyspark/sql/streaming/proto/StateMessage_pb2``),
so the Python driver AND the Python workers must be able to
``import google.protobuf``. Production clusters simply install the
``protobuf`` wheel; this container cannot pip-install, but the
Google Cloud SDK it ships bundles a pure-Python protobuf runtime.
:func:`ensure_protobuf` exposes exactly the ``google/protobuf``
subtree of such a bundle (a namespace-package symlink in a shim dir
— none of the bundle's other packages leak onto ``sys.path``) and
exports it via ``PYTHONPATH`` so executor-side Python workers
inherit it too. Call it BEFORE the SparkSession (hence the JVM) is
created, or the workers won't see the env.

The bundled runtime can trail pyspark's gencode by a minor version
(6.32 runtime vs 6.33 gencode here). Protobuf's cross-version
guarantee makes same-major wire formats compatible; the runtime's
hard refusal is a release-hygiene gate, so when we fall back to a
bundle we set ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK`` — the
escape hatch protobuf itself provides. A properly installed
``protobuf`` wheel (the normal cluster case) short-circuits all of
this.
"""

from __future__ import annotations

import os
import sys

# Known pure-Python protobuf bundles, in preference order.
_BUNDLE_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)

# Shim lives INSIDE this package's directory tree, not the shared
# temp dir: a fixed path under world-writable /tmp would let another
# local user pre-plant a malicious ``protobuf`` package at a location
# we then import from (arbitrary code execution at import time). The
# package dir is owned by whoever deployed this code — the same trust
# root as the code itself.
_SHIM_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_protoshim")


def _importable() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def ensure_protobuf() -> bool:
    """Make ``google.protobuf`` importable for driver and workers;
    return whether it is. Idempotent, never raises."""
    if _importable():
        return True
    for base in _BUNDLE_CANDIDATES:
        src = os.path.join(base, "google", "protobuf")
        if not os.path.isdir(src):
            continue
        shim = os.path.join(_SHIM_ROOT, "google")
        try:
            os.makedirs(shim, mode=0o700, exist_ok=True)
            link = os.path.join(shim, "protobuf")
            if os.path.lexists(link):
                # Trust an existing link only if it points exactly at
                # the bundle we would have created it for.
                if (
                    not os.path.islink(link)
                    or os.readlink(link) != src
                ):
                    os.remove(link)
                    os.symlink(src, link)
            else:
                os.symlink(src, link)
        except OSError:
            continue
        # sys.path / PYTHONPATH / the version-check escape hatch must
        # all be in place before the import attempt, but none of them
        # may linger process-wide (or leak to executor workers) if the
        # bundle turns out unusable — save, try, restore on failure.
        root = os.path.dirname(shim)
        path_added = root not in sys.path
        if path_added:
            sys.path.insert(0, root)
        prior_pythonpath = os.environ.get("PYTHONPATH")
        parts = (prior_pythonpath or "").split(os.pathsep)
        if root not in parts:
            os.environ["PYTHONPATH"] = os.pathsep.join(
                [root] + [p for p in parts if p]
            )
        env_key = "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"
        prior = os.environ.get(env_key)
        os.environ[env_key] = "true"
        if _importable():
            return True
        if prior is None:
            del os.environ[env_key]
        else:
            os.environ[env_key] = prior
        if path_added and root in sys.path:
            sys.path.remove(root)
        if prior_pythonpath is None:
            os.environ.pop("PYTHONPATH", None)
        else:
            os.environ["PYTHONPATH"] = prior_pythonpath
    return False
