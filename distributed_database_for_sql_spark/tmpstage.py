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


def stage_or_read(spark, prefix: str, key_path: str, fingerprint: str,
                  build):
    """Materialize a DERIVED, DETERMINISTIC artifact once per input
    generation and read it back on subsequent uses.

    ``build() -> DataFrame`` computes the artifact; it is written to
    ``staging_dir(prefix, key_path)`` tagged with ``fingerprint``
    (catalog.table_fingerprint of the source — mtime+size, so a
    regenerated input invalidates the stage).  This is the storage shape
    of production pipelines for per-corpus artifacts that are strictly
    functions of the data (MinHash signatures, ANN ground truth,
    codebooks): compute on first touch, then every consumer reads the
    parquet.  Correctness is unaffected — the artifact is deterministic,
    so staged and fresh values are identical."""
    d = staging_dir(prefix, key_path)
    tag = os.path.join(d, "_input_fingerprint")
    try:
        with open(tag) as f:
            if f.read() == fingerprint:
                return spark.read.parquet(d)
    except OSError:
        pass
    build().write.mode("overwrite").parquet(d)
    with open(tag, "w") as f:
        f.write(fingerprint)
    return spark.read.parquet(d)
