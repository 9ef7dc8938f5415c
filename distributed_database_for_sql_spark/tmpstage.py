"""Deterministic temp staging directories.

One shared builder for every query/job that stages data under the system
tmpdir (format round-trips, txlog tables, materialized rollups, stream
source symlink dirs).  hashlib, not builtin hash(): the builtin is
salted per-process (PYTHONHASHSEED), so paths would differ across runs —
harmless under mode("overwrite") but not reproducible for debugging.
"""

from __future__ import annotations

import hashlib
import os
import tempfile


def staging_dir(prefix: str, key_path: str) -> str:
    """tmpdir/<prefix>_<md5(abspath(key_path))[:12]> — stable per input."""
    digest = hashlib.md5(os.path.abspath(key_path).encode()).hexdigest()[:12]
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{digest}")
