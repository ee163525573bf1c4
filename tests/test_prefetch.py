"""Host-side reader prefetch (deva_tpu/utils/prefetch.py): ordering,
exception propagation, early-exit cleanup."""
import time

import pytest

from deva_tpu.utils.prefetch import Prefetcher


class SlowReader:
    def __init__(self, n, fail_at=None):
        self.n = n
        self.fail_at = fail_at
        self.reads = []

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        if self.fail_at is not None and i == self.fail_at:
            raise ValueError("boom")
        self.reads.append(i)
        time.sleep(0.002)
        return {"i": i}


def test_order_and_completeness():
    r = SlowReader(17)
    with Prefetcher(r, depth=3) as pf:
        got = [d["i"] for d in pf]
    assert got == list(range(17))


def test_start_stop_window():
    r = SlowReader(10)
    with Prefetcher(r, depth=2, start=3, stop=8) as pf:
        got = [d["i"] for d in pf]
    assert got == [3, 4, 5, 6, 7]


def test_worker_exception_reraises():
    r = SlowReader(10, fail_at=4)
    with pytest.raises(ValueError, match="boom"):
        with Prefetcher(r, depth=2) as pf:
            for _ in pf:
                pass


def test_early_exit_stops_worker():
    r = SlowReader(1000)
    with Prefetcher(r, depth=2) as pf:
        it = iter(pf)
        next(it)
        next(it)
    # after __exit__ the worker must stop quickly, far short of 1000 reads
    time.sleep(0.05)
    assert len(r.reads) < 50
