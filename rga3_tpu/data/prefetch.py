"""Background batch prefetching — the host-side equivalent of the
reference's `DataLoader(num_workers=...)` (ref train_joint.py:336-346
wires a torch DataLoader through deepspeed.initialize).

Worker THREADS (not processes): the heavy per-sample work is
PIL/cv2/numpy which release the GIL, and threads avoid fork-vs-JAX
hazards. A bounded queue overlaps host batch assembly with device steps.

Two modes:
  * ``make_batch()`` (zero-arg): unordered completion-order delivery —
    fine when batch content doesn't depend on position in the stream.
  * ``make_batch(idx)`` (``indexed=True``): workers claim monotonically
    increasing batch indices and delivery is IN ORDER of idx. This is
    what multi-host training requires: every host must consume batch k
    as the k-th batch or the per-host slices of the "same" global batch
    would come from different logical batches.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Optional


class PrefetchLoader:
    """Iterator over batches produced by `make_batch` in background
    threads. `num_workers=0` degrades to synchronous calls."""

    def __init__(
        self,
        make_batch: Callable[..., Any],
        num_workers: int = 2,
        buffer_size: int = 4,
        indexed: bool = False,
    ):
        self.make_batch = make_batch
        self.num_workers = num_workers
        self.indexed = indexed
        self._next_consume = 0
        if num_workers <= 0:
            return
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        if indexed:
            self._lock = threading.Lock()
            self._cond = threading.Condition(self._lock)
            self._next_produce = 0
            self._ready: dict = {}
            self._buffer_size = max(buffer_size, num_workers)
        else:
            self._q: queue.Queue = queue.Queue(maxsize=buffer_size)
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(num_workers)
        ]
        for t in self._threads:
            t.start()

    # -- unordered ------------------------------------------------------
    def _worker_unordered(self):
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

    # -- ordered/indexed ------------------------------------------------
    def _worker_indexed(self):
        while not self._stop.is_set():
            with self._cond:
                # bound memory: don't run ahead of the consumer
                while (
                    self._next_produce - self._next_consume
                    >= self._buffer_size
                    and not self._stop.is_set()
                ):
                    self._cond.wait(timeout=0.1)
                if self._stop.is_set():
                    return
                idx = self._next_produce
                self._next_produce += 1
            try:
                batch = self.make_batch(idx)
            except BaseException as e:
                self._error = e
                self._stop.set()
                with self._cond:
                    self._cond.notify_all()
                return
            with self._cond:
                self._ready[idx] = batch
                self._cond.notify_all()

    def _worker(self):
        if self.indexed:
            self._worker_indexed()
        else:
            self._worker_unordered()

    def __iter__(self):
        return self

    def __next__(self):
        if self.num_workers <= 0:
            if self.indexed:
                idx = self._next_consume
                self._next_consume += 1
                return self.make_batch(idx)
            return self.make_batch()
        if self.indexed:
            with self._cond:
                while self._next_consume not in self._ready:
                    if self._error is not None:
                        raise self._error
                    if self._stop.is_set():
                        raise StopIteration
                    self._cond.wait(timeout=0.5)
                batch = self._ready.pop(self._next_consume)
                self._next_consume += 1
                self._cond.notify_all()
                return batch
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
            if self.indexed:
                with self._cond:
                    self._ready.clear()
                    self._cond.notify_all()
            else:
                try:
                    while True:
                        self._q.get_nowait()
                except queue.Empty:
                    pass
            for t in self._threads:
                t.join(timeout=2.0)
