"""Unit tests for bench.make_job_frontier — the n_jobs accounting that
floor normalization (tools/compare_bench.py) depends on. The ADVICE r11
failure mode: status-store eviction (spark.ui.retainedJobs) makes the
frontier's own id read None while higher live ids exist; a naive upward
walk then sticks at zero advance forever and every later query silently
records n_jobs=0."""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_job_frontier


class StubTracker:
    """getJobInfo(i) -> truthy for ids in any of the live [lo, hi) windows,
    else None — models sequential allocation with bounded retention."""

    def __init__(self, *windows):
        self.windows = list(windows)
        self.calls = 0

    def getJobInfo(self, i):
        self.calls += 1
        return "job" if any(lo <= i < hi for lo, hi in self.windows) else None


def test_plain_sequential_advance():
    adv = make_job_frontier(StubTracker((0, 7)))
    assert adv() == 7
    assert adv() == 7  # no new jobs -> no advance


def test_counts_delta_between_probes():
    t = StubTracker((0, 3))
    adv = make_job_frontier(t)
    before = adv()
    t.windows = [(0, 12)]  # a query scheduled 9 more jobs
    assert adv() - before == 9


def test_eviction_gap_is_galloped_past():
    """Retention evicted ids [0, 1000); live window is [1000, 2200)
    (window wider than its start, per the gallop's guarantee). The
    naive walk reads None at 0 and would stick; the gallop must land
    inside the live window (2^10 = 1024) and walk to its end."""
    adv = make_job_frontier(StubTracker((1000, 2200)))
    assert adv() == 2200


def test_eviction_gap_after_prior_advance():
    """300k jobs ran between probes with the configured 200k retention
    (session.py raises spark.ui.retainedJobs): frontier id 5 is evicted,
    live window is [100_000, 300_000). The gallop's guarantee holds for
    any gap <= retention — the window, being wider than its own start
    offset, must contain a power of two (here 2^17 = 131072)."""
    t = StubTracker((0, 5))
    adv = make_job_frontier(t)
    assert adv() == 5
    t.windows = [(100_000, 300_000)]
    assert adv() == 300_000


def test_true_frontier_with_no_gap_terminates():
    """No eviction: after the walk stops the gallop probes up to 2^17
    and finds nothing — must terminate at the exact frontier with a
    bounded number of calls."""
    t = StubTracker((0, 4))
    adv = make_job_frontier(t)
    assert adv() == 4
    assert t.calls <= 4 + 1 + 25  # walk + terminal None + one gallop sweep


def test_empty_tracker():
    assert make_job_frontier(StubTracker())() == 0
