"""Write-Audit-Publish (WAP): the atomic snapshot-publish protocol a
production lakehouse runs in front of every consumer-visible table.

The reference publishes CDC output straight into consumer-visible Postgres
tables (register-postgres-sink.json:9-10) and bolts monitoring on AFTER the
fact (dags/cdc_data_integrity_dynamic_dag.py); WAP is the engine-native
upgrade: candidate snapshots are written to an unreferenced version
directory, audited there, and only a passing audit atomically swings the
manifest pointer readers resolve. A failing candidate leaves the previous
published version untouched and fully readable.

Atomicity: the manifest is a single small JSON file replaced via
write-temp + os.replace (atomic on POSIX). At cluster scale the manifest
lives on the object store with a conditional-put (the Iceberg/Delta commit
primitive); the protocol shape here is identical.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F


def version_dir(root: str, version: str) -> str:
    return os.path.join(root, "versions", version)


def manifest_path(root: str) -> str:
    return os.path.join(root, "manifest.json")


def audit_snapshot(df: DataFrame, key: str) -> tuple[bool, dict]:
    """The publish gate: non-empty, key non-null, key unique — one
    aggregation pass (no per-check scans)."""
    row = df.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(key).isNull().cast("long")).alias("n_null_keys"),
        F.count_distinct(key).alias("n_distinct_keys"),
    ).collect()[0]
    ok = (
        row.n_rows > 0
        and row.n_null_keys == 0
        and row.n_distinct_keys == row.n_rows
    )
    return ok, {
        "n_rows": row.n_rows,
        "n_null_keys": row.n_null_keys,
        "n_distinct_keys": row.n_distinct_keys,
    }


def publish_manifest(root: str, version: str, audit: dict) -> None:
    """Atomically swing the reader-visible pointer to `version`."""
    os.makedirs(root, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=root, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"version": version, "audit": audit}, f)
    os.replace(tmp, manifest_path(root))


def current_version(root: str) -> str | None:
    try:
        with open(manifest_path(root)) as f:
            return json.load(f)["version"]
    except FileNotFoundError:
        return None


def write_audit_publish(
    candidate: DataFrame, root: str, version: str, key: str
) -> bool:
    """Stage `candidate` under an unreferenced version dir, audit it THERE
    (reading back what was actually written, not the in-memory frame), and
    publish the manifest only on a passing audit. Returns whether the
    version was published; on failure the previous manifest is untouched."""
    path = version_dir(root, version)
    candidate.write.mode("overwrite").parquet(path)
    spark = candidate.sparkSession
    staged = spark.read.parquet(path)
    ok, audit = audit_snapshot(staged, key)
    if ok:
        publish_manifest(root, version, audit)
    return ok


def read_published(spark: SparkSession, root: str) -> DataFrame:
    """What consumers see: resolve the manifest, read that version only."""
    version = current_version(root)
    if version is None:
        raise FileNotFoundError(f"nothing published under {root}")
    return spark.read.parquet(version_dir(root, version))


def vacuum_unpublished(root: str, keep: int = 1) -> list:
    """Remove version directories that are NOT the published version and
    not among the `keep` most recent siblings — the orphan cleanup that
    keeps a WAP table's storage bounded (failed candidates and superseded
    snapshots accumulate forever otherwise). The published version is
    never removable regardless of age. Returns the removed version names."""
    import shutil

    published = current_version(root)
    vdir = os.path.join(root, "versions")
    if not os.path.isdir(vdir):
        return []
    versions = sorted(os.listdir(vdir))
    protected = set(versions[-keep:]) if keep > 0 else set()
    if published is not None:
        protected.add(published)
    removed = []
    for v in versions:
        if v not in protected:
            shutil.rmtree(os.path.join(vdir, v))
            removed.append(v)
    return removed
