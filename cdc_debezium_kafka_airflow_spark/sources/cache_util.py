"""Fingerprinted on-disk caches for fixture-derived materializations.

Several queries materialize a deterministic derivation of a source table
(serialized changelog replay log, JSONL/CSV exports, bucketed warehouse)
under ``/root/repo/.cache``. A bare ``_SUCCESS`` marker is not enough to
trust such a cache: if the source fixture changes, or two different sf_dirs
share a basename, stale data would silently be replayed and compared against
oracles computed from the live fixture. Each cache therefore records the
source file's identity (absolute path + mtime + size) and is rebuilt when it
no longer matches.
"""

from __future__ import annotations

import os

_FP_NAME = "_FINGERPRINT"

# Bump whenever the CODE that derives any cached materialization changes
# semantics (not just when the source fixture changes): round 2 proved the
# source-only fingerprint insufficient — a JSONL cache written through a
# broken ts reader stayed "fresh" because the fixture bytes hadn't moved.
CACHE_CODE_VERSION = "v3"


def source_fingerprint(sf_dir: str, table: str = "events") -> str:
    path = os.path.join(os.path.abspath(sf_dir), f"{table}.parquet")
    st = os.stat(path)
    return f"{CACHE_CODE_VERSION}:{path}:{st.st_mtime_ns}:{st.st_size}"


def cache_is_fresh(cache_dir: str, fingerprint: str) -> bool:
    fp_file = os.path.join(cache_dir, _FP_NAME)
    if not os.path.exists(os.path.join(cache_dir, "_SUCCESS")):
        return False
    if not os.path.exists(fp_file):
        return False
    with open(fp_file) as fh:
        return fh.read() == fingerprint


def write_fingerprint(cache_dir: str, fingerprint: str) -> None:
    with open(os.path.join(cache_dir, _FP_NAME), "w") as fh:
        fh.write(fingerprint)
