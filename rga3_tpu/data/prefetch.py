"""Background batch prefetching — the host-side equivalent of the
reference's `DataLoader(num_workers=...)` (ref train_joint.py:336-346
wires a torch DataLoader through deepspeed.initialize).

Worker THREADS (not processes): the heavy per-sample work is
PIL/cv2/numpy which release the GIL, and threads avoid fork-vs-JAX
hazards. A bounded queue overlaps host batch assembly with device steps.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Optional


class PrefetchLoader:
    """Iterator over batches produced by `make_batch()` in background
    threads. `num_workers=0` degrades to synchronous calls."""

    def __init__(
        self,
        make_batch: Callable[[], Any],
        num_workers: int = 2,
        buffer_size: int = 4,
    ):
        self.make_batch = make_batch
        self.num_workers = num_workers
        if num_workers <= 0:
            return
        self._q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(num_workers)
        ]
        for t in self._threads:
            t.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = self.make_batch()
            except BaseException as e:  # surfaced on the next __next__
                self._error = e
                self._stop.set()
                return
            while not self._stop.is_set():
                try:
                    self._q.put(batch, timeout=0.1)
                    break
                except queue.Full:
                    continue

    def __iter__(self):
        return self

    def __next__(self):
        if self.num_workers <= 0:
            return self.make_batch()
        while True:
            if self._error is not None:
                raise self._error
            try:
                return self._q.get(timeout=0.5)
            except queue.Empty:
                if self._stop.is_set() and self._error is None:
                    raise StopIteration
                continue

    def close(self):
        if self.num_workers > 0:
            self._stop.set()
            # drain so blocked workers can exit
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass
            for t in self._threads:
                t.join(timeout=2.0)
