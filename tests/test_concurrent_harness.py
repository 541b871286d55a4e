"""Cross-process contention guards (VERDICT r11 task #7).

The r11 judge's concurrent verification produced spurious failures because
the fingerprinted ``.cache/`` materializations and the embedded-Derby
scratch databases assumed exclusive access to the tree. These tests pin the
two fixes without booting Spark:

1. ``cache_is_fresh`` takes an exclusive flock on a miss and holds it until
   ``write_fingerprint`` publishes — a concurrent process blocks in its own
   freshness check until the build lands, then reads it instead of
   rebuilding over it.
2. Derby db paths are process-scoped (``.cache/derby_scratch/pid_{pid}``),
   so two JVMs can never fight over Derby's per-directory boot lock.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

from cdc_debezium_kafka_airflow_spark.sources import cache_util

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_worker(code: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=120,
    )


def test_concurrent_builders_serialize_and_build_once(tmp_path):
    """Two processes racing the same cold cache: exactly one builds; the
    other blocks in cache_is_fresh until the publish, then reads fresh.
    The loser must never observe a half-built cache (the r11 judge's
    failure mode) nor rebuild over the winner's output."""
    cache_dir = str(tmp_path / "shared_cache")
    worker = f"""
    import os, sys, time
    sys.path.insert(0, {REPO!r})
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        cache_is_fresh, write_fingerprint)
    cache_dir = {cache_dir!r}
    fp = "v1:test"
    if cache_is_fresh(cache_dir, fp):
        # must only happen AFTER a complete publish
        assert open(os.path.join(cache_dir, "payload")).read() == "DONE"
        print("READ")
    else:
        os.makedirs(cache_dir, exist_ok=True)
        with open(os.path.join(cache_dir, "payload"), "w") as f:
            f.write("PARTIAL")
        time.sleep(1.0)  # long build window: the race target
        with open(os.path.join(cache_dir, "payload"), "w") as f:
            f.write("DONE")
        open(os.path.join(cache_dir, "_SUCCESS"), "w").close()
        write_fingerprint(cache_dir, fp)
        print("BUILT")
    """
    import threading

    results = [None, None]

    def go(i):
        results[i] = _run_worker(worker)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    outs = []
    for r in results:
        assert r.returncode == 0, r.stderr
        outs.append(r.stdout.strip())
    assert sorted(outs) == ["BUILT", "READ"], outs


def test_cache_lock_reentrant_within_process(tmp_path):
    """A nested/retry freshness check while this process holds the build
    lock must not self-deadlock (flock on a second fd of the same file
    would); it re-checks on disk and the publish still releases."""
    cache_dir = str(tmp_path / "c")
    fp = "v1:x"
    assert not cache_util.cache_is_fresh(cache_dir, fp)  # acquires lock
    assert not cache_util.cache_is_fresh(cache_dir, fp)  # re-entry: no hang
    os.makedirs(cache_dir, exist_ok=True)
    open(os.path.join(cache_dir, "_SUCCESS"), "w").close()
    cache_util.write_fingerprint(cache_dir, fp)  # publishes + releases
    assert cache_util.cache_is_fresh(cache_dir, fp)
    assert os.path.abspath(cache_dir) not in cache_util._HELD_LOCKS


def test_derby_scratch_paths_distinct_per_process():
    """Two processes asking for the same logical db name get disjoint
    directories — Derby's exclusive per-directory boot lock can't collide."""
    worker = f"""
    import sys
    sys.path.insert(0, {REPO!r})
    from cdc_debezium_kafka_airflow_spark.sources.cache_util import (
        process_scoped_db_path)
    print(process_scoped_db_path("derby_sink_v2_sf0.01"))
    """
    a, b = _run_worker(worker), _run_worker(worker)
    assert a.returncode == 0 and b.returncode == 0, (a.stderr, b.stderr)
    pa, pb = a.stdout.strip(), b.stdout.strip()
    assert pa != pb
    assert pa != process_scoped_db_path_local()
    # and this process's own path is stable across calls
    assert process_scoped_db_path_local() == process_scoped_db_path_local()


def process_scoped_db_path_local() -> str:
    return cache_util.process_scoped_db_path("derby_sink_v2_sf0.01")


def test_dead_pid_scratch_dirs_are_swept(tmp_path, monkeypatch):
    """An OLD scratch dir left by a dead PID is removed on first use; a
    YOUNG dead-PID dir (possible PID-recycle race window), the live
    process's own dir, and unparseable entries all survive."""
    import time

    base = tmp_path / ".cache" / "derby_scratch"
    base.mkdir(parents=True)
    # PIDs that cannot exist (max_pid is < 2**22 + 1 on Linux)
    dead_old = base / "pid_4194305"
    dead_old.mkdir()
    (dead_old / "junk").write_text("x")
    old = time.time() - 7200
    os.utime(dead_old, (old, old))
    dead_young = base / "pid_4194304"
    dead_young.mkdir()  # mtime = now: inside the age gate
    keep = base / "pid_notanumber"
    keep.mkdir()
    os.utime(keep, (old, old))
    monkeypatch.setattr(cache_util, "_REPO_ROOT", str(tmp_path))
    monkeypatch.setattr(cache_util, "_SCRATCH_SWEPT", False)
    p = cache_util.process_scoped_db_path("db")
    assert str(tmp_path) in p
    assert not dead_old.exists()
    assert dead_young.exists()
    assert keep.exists()
