"""Micro-batching for the serving path.

The device scorer is batched; individual HTTP requests are not. This
coalesces concurrent requests into one device program launch: requests
enqueue, a worker drains the queue up to `max_batch` (waiting at most
`max_wait_ms` for stragglers), runs one batched rank, and resolves each
request's future with its RAW ranked row plus the live state it was ranked
against. Hydration happens back on the caller's HTTP thread (under the
server's read lock), so the single device stream never waits on host-side
store reads and hydration parallelizes across handler threads. The
reference has no analogue — its per-query goroutine pipeline is the thing
the batch replaces.
"""

from __future__ import annotations

import threading
import time
from concurrent.futures import Future
from contextlib import contextmanager
from dataclasses import dataclass


@dataclass
class BatcherStats:
    batches: int = 0
    queries: int = 0

    @property
    def mean_batch(self) -> float:
        return self.queries / max(self.batches, 1)


@contextmanager
def _read(lock):
    """Reader section on an RWLock, exclusive section on a plain Lock."""
    if hasattr(lock, "read"):
        with lock.read():
            yield
    else:
        with lock:
            yield


class MicroBatcher:
    def __init__(
        self,
        engine,
        max_batch: int = 128,
        max_wait_ms: float = 25.0,
        result_timeout_s: float = 300.0,
        lock=None,
    ) -> None:
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        # generous default: an unwarmed shape can compile for minutes on a
        # remote-TPU tunnel; the future resolves the moment the batch does
        self.result_timeout_s = result_timeout_s
        # batches execute as READERS of the serving lock: /refresh (the
        # writer) swaps the engine's live state + closes store handles, and
        # ranking reads both (the round-1 soak found the use-after-free)
        self._exec_lock = lock if lock is not None else threading.Lock()
        self.stats = BatcherStats()
        self._queue: list[tuple[str, Future]] = []
        self._cv = threading.Condition()
        self._stop = False
        self._worker = threading.Thread(target=self._run, daemon=True, name="microbatcher")
        self._worker.start()

    def query_raw(self, text: str, timeout: float | None = None):
        """-> (scores_row, ids_row, parsed, live): the caller hydrates (under
        the serving read lock). scores_row is None for empty queries."""
        fut: Future = Future()
        with self._cv:
            self._queue.append((text, fut))
            self._cv.notify()
        return fut.result(timeout=timeout or self.result_timeout_s)

    def query(self, text: str, timeout: float | None = None) -> list[dict]:
        scores_row, ids_row, parsed, live = self.query_raw(text, timeout)
        if scores_row is None:
            return []
        with _read(self._exec_lock):
            return self.engine.hydrate_row(scores_row, ids_row, parsed, live)

    def _run(self) -> None:
        from ..retrieval.engine import parse_query

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
            try:
                parsed = [parse_query(t) for t, _ in batch]
                rows = [i for i, p in enumerate(parsed) if not p.is_empty]
                with _read(self._exec_lock):
                    live = self.engine._live
                    if rows and live[1].n_docs > 0:
                        scores, ids = self.engine.rank(
                            [parsed[i] for i in rows], live=live
                        )
                    else:
                        rows, scores, ids = [], None, None
            except Exception as e:  # noqa: BLE001 — fail the waiting requests
                for _, fut in batch:
                    fut.set_exception(e)
                continue
            self.stats.batches += 1
            self.stats.queries += len(batch)
            row_of = {i: r for r, i in enumerate(rows)}
            for i, (_, fut) in enumerate(batch):
                r = row_of.get(i)
                if r is None:
                    fut.set_result((None, None, parsed[i], live))
                else:
                    fut.set_result((scores[r], ids[r], parsed[i], live))

    def shutdown(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._worker.join(timeout=5)
