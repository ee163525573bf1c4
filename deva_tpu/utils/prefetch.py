"""Host-side reader prefetch: overlap disk IO / PIL decode / resize with
device compute.

The reference hides reader latency behind torch DataLoader worker processes
(reference:evaluation/eval_vos.py:122 `num_workers=4`, demo loaders
`num_workers=8`); the TPU-native equivalent (SURVEY §2.8, pipeline row:
"decode/resize on TPU-VM host overlapped with propagation") is a bounded
background thread per reader — while the chip propagates frame t, the host
decodes frame t+1..t+depth.

Threads (not processes) suffice here: the readers release the GIL inside
PIL/numpy, and the consumer blocks on the device anyway.
"""
from __future__ import annotations

import queue
import threading
from typing import Iterator


class Prefetcher:
    """Iterate an indexable reader with `depth` items decoded ahead.

    with Prefetcher(reader) as pf:
        for data in pf: ...

    Exceptions inside the worker re-raise at the consuming site (per-video
    fault barriers keep their semantics).
    """

    def __init__(self, reader, depth: int = 2, start: int = 0,
                 stop: int = None):
        self.reader = reader
        self.start = start
        self.stop = len(reader) if stop is None else stop
        self.q: queue.Queue = queue.Queue(maxsize=max(1, depth))
        self._stop_evt = threading.Event()
        self._thread = threading.Thread(target=self._work, daemon=True)

    def _work(self):
        try:
            for i in range(self.start, self.stop):
                if self._stop_evt.is_set():
                    return
                item = self.reader[i]
                while not self._stop_evt.is_set():
                    try:
                        self.q.put((i, item, None), timeout=0.5)
                        break
                    except queue.Full:
                        continue
        except BaseException as e:  # surfaced to the consumer
            self.q.put((None, None, e))

    def __enter__(self):
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop_evt.set()
        # drain so the worker's blocked put can observe the stop event
        try:
            while True:
                self.q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5)
        return False

    def __iter__(self) -> Iterator:
        for _ in range(self.start, self.stop):
            i, item, err = self.q.get()
            if err is not None:
                raise err
            yield item
