"""One per-process scratch root for every query that stages files.

Roundtrip gates, streaming stores, snapshot tables, and layout rewrites
all need a writable directory whose contents must outlive the function
(the returned DataFrames read the staged files lazily) but not the
process. A bare ``tempfile.mkdtemp`` per call leaks corpus-sized
directories across bench/test/driver runs — bench now runs every query
best-of-3, so a single bench run would leave three full copies of each
staged projection behind.

``scratch_dir`` hands out subdirectories of ONE root that is removed at
interpreter exit (``atexit`` + ``rmtree(ignore_errors=True)`` — the JVM
may still hold a handle or an embedded Derby lock; best-effort is
correct here because the root is under the OS tempdir either way).
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH_ROOT: list[str] = []


def scratch_dir(prefix: str) -> str:
    """A fresh directory under the per-process scratch root."""
    if not _SCRATCH_ROOT:
        root = tempfile.mkdtemp(prefix="majs_scratch_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        _SCRATCH_ROOT.append(root)
    return tempfile.mkdtemp(prefix=prefix, dir=_SCRATCH_ROOT[0])
