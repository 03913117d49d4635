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


class _DoneHandle:
    """Adapter for engines without rank_async: the rank already ran."""

    __slots__ = ("_res",)

    def __init__(self, res) -> None:
        self._res = res

    def finish(self):
        return self._res


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
        """-> (body, scores_row, ids_row, parsed, live): body is the
        finished response bytes when the batch was natively assembled
        (native/fastserve.cpp fv_assemble_batch, run once per batch on THIS
        worker under the serving read lock), else None and the caller
        hydrates the raw row itself (under the serving read lock).
        scores_row is None for empty queries."""
        fut: Future = Future()
        with self._cv:
            self._queue.append((text, fut))
            self._cv.notify()
        return fut.result(timeout=timeout or self.result_timeout_s)

    def query(self, text: str, timeout: float | None = None) -> list[dict]:
        _, scores_row, ids_row, parsed, live = self.query_raw(text, timeout)
        if scores_row is None:
            return []
        with _read(self._exec_lock):
            return self.engine.hydrate_row(scores_row, ids_row, parsed, live)

    def _run(self) -> None:
        # Two-stage software pipeline on one worker: dispatch batch N's
        # device rank (async — the relay executes + transfers while the
        # host works), THEN fetch + assemble + resolve batch N-1. Device
        # execution of N overlaps host assembly of N-1; with both stages
        # ~40-60 ms at saturation this nearly doubles serve throughput on
        # the 1-core host. With no pending batch (light load) a batch is
        # dispatched and resolved back-to-back — no added latency.
        pending = None
        while True:
            with self._cv:
                while not self._queue and not self._stop and pending is None:
                    self._cv.wait()
                if self._stop:
                    break
                batch = None
                if self._queue:
                    # straggler wait (also with a batch in flight: its
                    # device work runs regardless, and dispatching an
                    # undersized batch wastes a whole program launch)
                    deadline = time.monotonic() + self.max_wait_s
                    while len(self._queue) < self.max_batch:
                        remaining = deadline - time.monotonic()
                        if remaining <= 0 or not self._cv.wait(
                            timeout=remaining
                        ):
                            break
                    batch = self._queue[: self.max_batch]
                    self._queue = self._queue[self.max_batch:]
            nxt = self._dispatch(batch) if batch else None
            if pending is not None:
                self._resolve(pending)
            pending = nxt
        if pending is not None:
            self._resolve(pending)

    def _dispatch(self, batch):
        """Parse + launch one batch's device rank (non-blocking); returns
        the in-flight job, or None if the requests were failed."""
        from ..retrieval.engine import parse_query

        try:
            parsed = [parse_query(t) for t, _ in batch]
            rows = [i for i, p in enumerate(parsed) if not p.is_empty]
            handle = None
            with _read(self._exec_lock):
                live = self.engine._live
                if rows and live[1].n_docs > 0:
                    ranker = getattr(self.engine, "rank_async", None)
                    if ranker is not None:
                        handle = ranker([parsed[i] for i in rows], live=live)
                    else:  # engine without a dispatch/fetch split
                        handle = _DoneHandle(
                            self.engine.rank([parsed[i] for i in rows],
                                             live=live)
                        )
                else:
                    rows = []
        except Exception as e:  # noqa: BLE001 — fail the waiting requests
            for _, fut in batch:
                fut.set_exception(e)
            return None
        return (batch, parsed, rows, live, handle)

    def _resolve(self, job) -> None:
        """Fetch a dispatched batch's ranked rows, assemble the responses
        natively, and resolve the waiting futures."""
        batch, parsed, rows, live, handle = job
        scores = ids = bodies = None
        try:
            if handle is not None:
                with _read(self._exec_lock):
                    scores, ids = handle.finish()
                    bodies = self._assemble(live, parsed, rows, scores, ids)
        except Exception as e:  # noqa: BLE001 — fail the waiting requests
            for _, fut in batch:
                fut.set_exception(e)
            return
        self.stats.batches += 1
        self.stats.queries += len(batch)
        row_of = {i: r for r, i in enumerate(rows)}
        for i, (_, fut) in enumerate(batch):
            r = row_of.get(i)
            if r is None:
                fut.set_result((b"[]", None, None, parsed[i], live))
            else:
                body = bodies[r] if bodies is not None else None
                fut.set_result((body, scores[r], ids[r], parsed[i], live))

    def _assemble(self, live, parsed, rows, scores, ids):
        """Native whole-batch response assembly (one GIL-released call, on
        this worker, under the serving read lock — the same invariant the
        per-request hydration relies on). None -> callers hydrate rows
        themselves (no native gen / topic model on / fallback rows)."""
        gen = getattr(live[0], "_native_hyd", None)
        if gen is None or getattr(self.engine, "use_topic_model", False):
            return None
        from ..retrieval.summary import _packed_query, prepare_summary_query

        try:
            packed = [
                _packed_query(
                    prepare_summary_query(parsed[i].stripped, parsed[i].phrases)
                )
                for i in rows
            ]
            return gen.assemble_batch(ids, scores, packed)
        except Exception:  # noqa: BLE001 — assembly is an accelerator only
            return None

    def shutdown(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._worker.join(timeout=5)
