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

from ..utils.timing import TRACER


def _parse_and_pack(text: str):
    """parse_query + the packed summary-query blob, both pure functions of
    the query text — cached because production traffic repeats queries
    heavily and parse (regex + laundry + md5) measured ~1 ms per 128-batch
    on the 1-core serving host."""
    from ..retrieval.engine import parse_query

    p = parse_query(text)
    packed = None
    if not p.is_empty:
        from ..retrieval.summary import _packed_query, prepare_summary_query

        packed = _packed_query(prepare_summary_query(p.stripped, p.phrases))
    return p, packed


_parse_cache: dict[str, tuple] = {}
_PARSE_CACHE_MAX = 16384


def _cached(text: str) -> tuple:
    hit = _parse_cache.get(text)
    if hit is None:
        hit = _parse_and_pack(text)
        if len(_parse_cache) >= _PARSE_CACHE_MAX:  # rare: drop, stay simple
            _parse_cache.clear()
        _parse_cache[text] = hit
    return hit


def _parse_cached(text: str):
    return _cached(text)[0]


def _packed_cached(text: str):
    return _cached(text)[1]


@dataclass
class BatcherStats:
    batches: int = 0
    queries: int = 0
    ph_batches: int = 0  # batches containing >=1 phrase-bearing query

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
        n_fetchers: int = 1,
        segregate: str = "auto",
        ph_patience_ms: float = 250.0,
        ph_pool_min: int = 0,
        ph_stale: str = "merge",
    ) -> None:
        self.engine = engine
        self.max_batch = max_batch
        self.max_wait_s = max_wait_ms / 1e3
        # Phrase-class batch segregation: one phrase-bearing query routes
        # the WHOLE batch onto the fused mixed program, which cannot take
        # the q=3 dispatch / dynamic-T keyword levels (VMEM cliffs —
        # FINDINGS sessions 5-6), so at the 1M tier a mixed 128-batch
        # costs ~94 ms where the leveled keyword program costs ~59. With
        # the reference workload's 1/8 phrase share, slicing class-PURE
        # batches (keyword-only vs phrase-bearing) sends 7/8 of batches
        # down the fast program. Policy: PURE phrase batches dispatch only
        # when (a) full (phrase kernel cost is ~linear per row over a
        # ~57 ms per-batch base at 1M — an under-filled pure batch pays
        # the base for few rows and loses) or (b) no keyword work is
        # waiting (light load — zero added latency); when the oldest
        # phrase request has waited out `ph_patience_ms`, the stale
        # cohort MERGES into one arrival-order batch instead (bounded
        # staleness without the partial-pure-batch tax). "auto" asks the engine
        # (class_batching_pays): segregation only pays where the
        # mixed/keyword cost gap is real, i.e. large-doc-count fused
        # indexes — at 100k the gap is ~1 ms and splitting just costs
        # phrase latency.
        self._segregate = segregate if isinstance(segregate, str) else (
            "on" if segregate else "off"
        )
        self.ph_patience_s = ph_patience_ms / 1e3
        # phrase-cohort pool floor (0 = off): merge the cohort into one
        # arrival-order batch as soon as this many phrases pooled, without
        # waiting out the patience. This is a LATENCY-vs-QPS knob, not a
        # free win — measured A/B at 1M (round 4): the patience-only
        # policy served 1,786 qps with phrase-class p50 590 ms; pool=16
        # (one cycle's phrase arrivals at 1/8 share) made EVERY slice a
        # merge (283/289 batches mixed) and collapsed throughput to 1,131
        # qps, because each merged batch surrenders the leveled keyword
        # program (~13 ms/batch) and the per-8-row-block phrase sweep
        # rides wherever the rows go. Merge FREQUENCY is the cost, and
        # patience already bounds it; the floor stays for phrase-heavy
        # deployments that want the opposite end of the trade.
        self.ph_pool_min = max(0, int(ph_pool_min))
        # stale-cohort policy at patience expiry: "merge" (default) rides
        # the cohort in one arrival-order batch; "pure" cuts it as its own
        # under-filled pure-phrase batch (pair with engine.phrase_b32 so a
        # 17..32-row cohort gets the small (32, Q_BASE) mixed program).
        # Merge won the round-4 A/B on throughput; pure trades qps for
        # phrase-class latency — measured A/B in FINDINGS round 5.
        self.ph_stale = ph_stale
        self._n_ph = 0  # phrase-class entries in _queue; guarded by _cv
        # generous default: an unwarmed shape can compile for minutes on a
        # remote-TPU tunnel; the future resolves the moment the batch does
        self.result_timeout_s = result_timeout_s
        # batches execute as READERS of the serving lock: /refresh (the
        # writer) swaps the engine's live state + closes store handles, and
        # ranking reads both (the round-1 soak found the use-after-free)
        self._exec_lock = lock if lock is not None else threading.Lock()
        self.stats = BatcherStats()
        # entries: (text, future, is_phrase_class, enqueue_monotonic)
        self._queue: list[tuple[str, Future, bool, float]] = []
        self._cv = threading.Condition()
        self._stop = False
        import queue as _qmod

        # >1 fetcher overlaps device->host transfers: through the remote-TPU
        # relay each packed fetch is dominated by a ~25 ms RTT, so with a
        # single fetch thread the pipeline can never beat one batch per RTT
        # regardless of device speed; concurrent fetches overlap those RTTs
        # (the device stream itself stays serial — only the transfer waits
        # overlap). Batches may then resolve out of order, which is safe:
        # every job carries its own futures and its own `live` state.
        # Default 1: on the 1-core serving host the extra pipeline depth
        # under-fills batches (Little's law) and the host, not the RTT, is
        # the measured wall (2,296 qps f1/512conn vs 2,241 f2/512 vs 2,045
        # f2/768 — FINDINGS round 3). Raise it on multi-core hosts.
        self._n_fetchers = max(1, int(n_fetchers))
        # per-request queue age (enqueue -> resolve), sliding window: the
        # stage spans time the PIPELINE, but the latency tail lives in
        # per-request queueing (VERDICT r3 #4) — deque append/iteration is
        # GIL-atomic, no lock needed
        import collections as _coll

        self._ages: _coll.deque = _coll.deque(maxlen=8192)
        self._fetch_q: _qmod.Queue = _qmod.Queue(maxsize=self._n_fetchers)
        self._asm_q: _qmod.Queue = _qmod.Queue(maxsize=self._n_fetchers)
        # one token per fetch_q slot: the dispatcher acquires BEFORE slicing
        # a batch, so requests arriving while downstream is busy still join
        # the next batch instead of leaving it undersized
        self._slots = threading.Semaphore(self._n_fetchers)
        self._fetchers_live = self._n_fetchers  # guarded by _cv's lock
        self._worker = threading.Thread(target=self._run, daemon=True, name="microbatcher")
        self._fetchers = [
            threading.Thread(
                target=self._run_fetch, daemon=True, name=f"microbatcher-fetch-{i}"
            )
            for i in range(self._n_fetchers)
        ]
        self._resolver = threading.Thread(
            target=self._run_resolve, daemon=True, name="microbatcher-resolve"
        )
        self._worker.start()
        for t in self._fetchers:
            t.start()
        self._resolver.start()

    def query_raw(self, text: str, timeout: float | None = None):
        """-> (body, scores_row, ids_row, parsed, live): body is the
        finished response bytes when the batch was natively assembled
        (native/fastserve.cpp fv_assemble_batch, run once per batch on THIS
        worker under the serving read lock), else None and the caller
        hydrates the raw row itself (under the serving read lock).
        scores_row is None for empty queries."""
        fut: Future = Future()
        try:
            # classify on the caller's thread (cached parse): phrase-class
            # requests batch separately when segregation is active
            is_ph = bool(_parse_cached(text).phrase_hashes)
        except Exception:  # noqa: BLE001 — parse errors fail at dispatch
            is_ph = False
        with self._cv:
            self._queue.append((text, fut, is_ph, time.monotonic()))
            if is_ph:
                self._n_ph += 1
            self._cv.notify()
        return fut.result(timeout=timeout or self.result_timeout_s)

    def query(self, text: str, timeout: float | None = None) -> list[dict]:
        _, scores_row, ids_row, parsed, live = self.query_raw(text, timeout)
        if scores_row is None:
            return []
        with _read(self._exec_lock):
            return self.engine.hydrate_row(scores_row, ids_row, parsed, live)

    def _run(self) -> None:
        # Stage 1 of the three-stage pipeline (dispatch -> fetch ->
        # assemble/resolve; one dispatcher, n_fetchers fetch threads, one
        # assembler; hand-off queues sized to the fetch pool):
        # coalesce requests, parse, launch the device rank (non-blocking),
        # hand the in-flight job to the fetcher. The blocking device->host
        # fetch (one relay RTT, GIL released during the transfer) then
        # overlaps the NEXT batch's native assembly (also GIL-released), so
        # at saturation the cycle is max(stage) instead of their sum —
        # measured stages on the 1-core host: dispatch ~1 ms, fetch ~25-30
        # ms through the relay, assemble ~10-45 ms. The depth-1 queues give
        # backpressure: the dispatcher blocks on put while two batches are
        # in flight, and the request queue refills meanwhile, so batches
        # stay full. With no pending batch (light load) a batch flows
        # through all three stages back-to-back — no added latency.
        while True:
            with self._cv:
                while not self._queue and not self._stop:
                    self._cv.wait()
                if self._stop:
                    break
            # downstream backpressure FIRST: while the pipeline is full this
            # blocks, and every request arriving meanwhile joins the batch
            # sliced below (acquiring after the wait left real-TPU batches
            # at ~102/128 — arrivals during the block missed their batch)
            self._slots.acquire()
            with TRACER.span("batch.wait"), self._cv:
                # straggler wait: an undersized batch wastes a whole device
                # program launch (the b-bucket pads it to full width), so
                # give the batch up to max_wait to fill — but only while
                # requests are actually ARRIVING. At saturation arrivals are
                # bursty (a resolved batch re-arms its clients all at once),
                # and once the burst is in, every other client is parked in
                # an in-flight stage: waiting further is pure serial loss
                # (measured ~30 ms/batch). 3 ms of silence ends the wait.
                deadline = time.monotonic() + self.max_wait_s
                while len(self._queue) < self.max_batch and not self._stop:
                    remaining = deadline - time.monotonic()
                    if remaining <= 0:
                        break
                    n0 = len(self._queue)
                    self._cv.wait(timeout=min(remaining, 0.003))
                    if len(self._queue) == n0:
                        break  # no arrivals in the idle gap
                batch = self._slice_locked()
            if not batch:
                self._slots.release()
                if self._stop:
                    break
                continue
            job = self._dispatch(batch)
            if job is not None:
                self._fetch_q.put(job)
            else:
                self._slots.release()
        for _ in range(self._n_fetchers):
            self._fetch_q.put(None)

    def _segregate_now(self) -> bool:
        if self._segregate == "on":
            return True
        if self._segregate == "off":
            return False
        pays = getattr(self.engine, "class_batching_pays", None)
        try:
            return bool(pays and pays())
        except Exception:  # noqa: BLE001 — advice only, never fail a batch
            return False

    def _pick_class_locked(self, now: float) -> bool | None:
        """None -> slice in arrival order (segregation off); True/False ->
        slice only phrase-class / keyword-class requests. Called with _cv
        held and a non-empty queue."""
        if not self._segregate_now():
            return None
        ph_n = self._n_ph
        kw_n = len(self._queue) - ph_n
        if ph_n == 0:
            return False
        if kw_n == 0:
            return True  # no keyword work waiting: phrases go immediately
        if ph_n >= self.max_batch:
            return True  # a full phrase batch amortizes the program base
        if self.ph_pool_min and ph_n >= self.ph_pool_min:
            # pooled enough: merge NOW (operator opted into the
            # phrase-latency end of the trade — see __init__ note)
            return None
        oldest_ph = next(e[3] for e in self._queue if e[2])
        if now - oldest_ph >= self.ph_patience_s:
            # patience expired. Default ("merge"): the stale cohort rides
            # along in ONE arrival-order (mixed) batch. Never cut an
            # under-filled pure phrase batch — phrase cost is ~linear per
            # ROW (~2.9 ms at 1M) on top of a ~57 ms per-batch base, so a
            # partial phrase batch pays the base for few rows and LOSES to
            # merging (segregate_probe: at ~1.2k qps a full 128-phrase
            # batch takes ~850 ms to accumulate — patience always fires
            # first). "pure" dispatches the cohort standalone instead —
            # the latency end of the trade (see __init__ note).
            return True if self.ph_stale == "pure" else None
        return False

    def _slice_locked(self) -> list:
        """Cut the next batch off the queue (with _cv held): arrival order
        when segregation is off, else a class-pure FIFO slice."""
        q = self._queue
        if not q:
            return []
        want_ph = self._pick_class_locked(time.monotonic())
        if want_ph is None:
            batch = q[: self.max_batch]
            self._queue = q[self.max_batch:]
            self._n_ph -= sum(1 for e in batch if e[2])
            return batch
        batch: list = []
        rest: list = []
        for e in q:
            if e[2] == want_ph and len(batch) < self.max_batch:
                batch.append(e)
            else:
                rest.append(e)
        self._queue = rest
        if want_ph:
            self._n_ph -= len(batch)
        return batch

    def _run_fetch(self) -> None:
        """Stage 2: block for the dispatched batch's packed device->host
        transfer (the handle's device work already ran while earlier
        batches were being assembled)."""
        while True:
            job = self._fetch_q.get()
            if job is None:
                with self._cv:
                    self._fetchers_live -= 1
                    last = self._fetchers_live == 0
                if last:  # the stop sentinel reaches the resolver exactly once
                    self._asm_q.put(None)
                return
            self._slots.release()  # the dispatcher may slice its next batch
            batch, parsed, rows, live, handle = job
            scores = ids = None
            err = None
            try:
                if handle is not None:
                    with _read(self._exec_lock), TRACER.span("batch.fetch"):
                        scores, ids = handle.finish()
            except Exception as e:  # noqa: BLE001 — fail the waiting requests
                err = e
            self._asm_q.put((batch, parsed, rows, live, scores, ids, err))

    def _run_resolve(self) -> None:
        """Stage 3: native whole-batch response assembly + future resolution."""
        while True:
            job = self._asm_q.get()
            if job is None:
                return
            self._resolve(job)

    def _dispatch(self, batch):
        """Parse + launch one batch's device rank (non-blocking); returns
        the in-flight job, or None if the requests were failed."""
        try:
            with TRACER.span("batch.parse"):
                parsed = [_parse_cached(t) for t, _, _, _ in batch]
            rows = [i for i, p in enumerate(parsed) if not p.is_empty]
            handle = None
            with _read(self._exec_lock), TRACER.span("batch.dispatch"):
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
            for _, fut, _, _ in batch:
                fut.set_exception(e)
            return None
        return (batch, parsed, rows, live, handle)

    def _resolve(self, job) -> None:
        """Assemble a fetched batch's responses natively and resolve the
        waiting futures."""
        batch, parsed, rows, live, scores, ids, err = job
        bodies = None
        if err is not None:
            for _, fut, _, _ in batch:
                fut.set_exception(err)
            return
        try:
            if scores is not None:
                with _read(self._exec_lock), TRACER.span("batch.assemble"):
                    bodies = self._assemble(live, batch, rows, scores, ids)
        except Exception as e:  # noqa: BLE001 — fail the waiting requests
            for _, fut, _, _ in batch:
                fut.set_exception(e)
            return
        self.stats.batches += 1
        self.stats.queries += len(batch)
        if any(e[2] for e in batch):
            self.stats.ph_batches += 1
        now = time.monotonic()
        for _, _, is_ph, enq in batch:
            self._ages.append((now - enq, is_ph))
        row_of = {i: r for r, i in enumerate(rows)}
        with TRACER.span("batch.resolve"):
            for i, (_, fut, _, _) in enumerate(batch):
                r = row_of.get(i)
                if r is None or scores is None:
                    fut.set_result((b"[]", None, None, parsed[i], live))
                else:
                    body = bodies[r] if bodies is not None else None
                    fut.set_result((body, scores[r], ids[r], parsed[i], live))

    def _assemble(self, live, batch, rows, scores, ids):
        """Native whole-batch response assembly (one GIL-released call, on
        this worker, under the serving read lock — the same invariant the
        per-request hydration relies on). None -> callers hydrate rows
        themselves (no native gen / topic model on / fallback rows)."""
        gen = getattr(live[0], "_native_hyd", None)
        if gen is None or getattr(self.engine, "use_topic_model", False):
            return None
        try:
            packed = [_packed_cached(batch[i][0]) for i in rows]
            return gen.assemble_batch(ids, scores, packed)
        except Exception:  # noqa: BLE001 — assembly is an accelerator only
            return None

    def queue_age_quantiles(self) -> dict:
        """p50/p90/p99 request queue age (enqueue -> future-resolve) in ms
        over the sliding window, total and per phrase/keyword class — the
        distribution behind the serving latency tail (surfaced at /stats)."""
        import numpy as _np

        snap = list(self._ages)
        out: dict = {}
        for label, sel in (("all", None), ("phrase", True), ("keyword", False)):
            vals = [a for a, ph in snap if sel is None or ph == sel]
            if not vals:
                continue
            q = _np.percentile(vals, [50, 90, 99])
            out[label] = {
                "p50_ms": round(float(q[0]) * 1e3, 1),
                "p90_ms": round(float(q[1]) * 1e3, 1),
                "p99_ms": round(float(q[2]) * 1e3, 1),
                "n": len(vals),
            }
        return out

    def shutdown(self) -> None:
        with self._cv:
            self._stop = True
            pending = self._queue
            self._queue = []
            self._cv.notify_all()
        # never-dispatched requests fail immediately instead of waiting out
        # the (generous, compile-sized) result timeout
        for _, fut, _, _ in pending:
            if not fut.done():
                fut.set_exception(RuntimeError("server shutting down"))
        self._slots.release()  # unblock a dispatcher stuck on backpressure
        # the stop sentinels flow down the pipeline, draining in-flight jobs
        self._worker.join(timeout=5)
        for t in self._fetchers:
            t.join(timeout=5)
        self._resolver.join(timeout=5)
