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
import tempfile

# Known pure-Python protobuf bundles, in preference order.
_BUNDLE_CANDIDATES = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


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
        shim = os.path.join(
            tempfile.gettempdir(), "kc_spark_protoshim", "google"
        )
        try:
            os.makedirs(shim, exist_ok=True)
            link = os.path.join(shim, "protobuf")
            if not os.path.lexists(link):
                os.symlink(src, link)
        except OSError:
            continue
        root = os.path.dirname(shim)
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true"
        )
        if root not in sys.path:
            sys.path.insert(0, root)
        parts = os.environ.get("PYTHONPATH", "").split(os.pathsep)
        if root not in parts:
            os.environ["PYTHONPATH"] = os.pathsep.join(
                [root] + [p for p in parts if p]
            )
        if _importable():
            return True
    return False
