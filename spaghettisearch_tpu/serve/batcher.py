"""Micro-batching for the serving path.

The device scorer is batched; individual HTTP requests are not. This
coalesces concurrent requests into one device program launch: requests
enqueue, a worker drains the queue up to `max_batch` (waiting at most
`max_wait_ms` for stragglers), runs one batched rank+hydrate, and resolves
each request's future. The reference has no analogue — its per-query
goroutine pipeline is the thing the batch replaces.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass


@dataclass
class BatcherStats:
    batches: int = 0
    queries: int = 0

    @property
    def mean_batch(self) -> float:
        return self.queries / max(self.batches, 1)


class MicroBatcher:
    def __init__(
        self,
        engine,
        max_batch: int = 64,
        max_wait_ms: float = 2.0,
        result_timeout_s: float = 300.0,
        lock: "threading.Lock | None" = None,
    ) -> None:
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        # generous default: an unwarmed shape can compile for minutes on a
        # remote-TPU tunnel; the future resolves the moment the batch does
        self.result_timeout_s = result_timeout_s
        # held while a batch executes: the server's refresh handler takes the
        # same lock before reopening the store, since hydration reads the
        # native KV through ctypes (GIL released) — closing those handles
        # under a running batch is a use-after-free
        self._exec_lock = lock or threading.Lock()
        self.stats = BatcherStats()
        self._queue: list[tuple[str, Future]] = []
        self._cv = threading.Condition()
        self._stop = False
        self._worker = threading.Thread(target=self._run, daemon=True, name="microbatcher")
        self._worker.start()

    def query(self, text: str, timeout: float | None = None) -> list[dict]:
        fut: Future = Future()
        with self._cv:
            self._queue.append((text, fut))
            self._cv.notify()
        return fut.result(timeout=timeout or self.result_timeout_s)

    def _run(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait()
                if self._stop:
                    return
                deadline = time.monotonic() + self.max_wait_s
                while len(self._queue) < self.max_batch:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0 or not self._cv.wait(timeout=remaining):
                        break
                batch = self._queue[: self.max_batch]
                self._queue = self._queue[self.max_batch:]
            texts = [t for t, _ in batch]
            try:
                with self._exec_lock:
                    results = self.engine.query_batch(texts)
            except Exception as e:  # noqa: BLE001 — fail the waiting requests
                for _, fut in batch:
                    fut.set_exception(e)
                continue
            self.stats.batches += 1
            self.stats.queries += len(batch)
            for (_, fut), res in zip(batch, results):
                fut.set_result(res)

    def shutdown(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._worker.join(timeout=5)
