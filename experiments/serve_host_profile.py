"""Isolate the HOST half of the serving stack: fastloop + micro-batcher +
native hydration + the bench's selector client, with the device scorer
replaced by an instant fake. Measures the 1-core host QPS ceiling and
(optionally) cProfiles the server process threads.

python experiments/serve_host_profile.py [--cprofile] [--conns N]
"""

import json
import selectors
import socket
import sys
import threading
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

import bench  # noqa: E402
from spaghettisearch_tpu.retrieval.engine import QueryEngine  # noqa: E402
from spaghettisearch_tpu.serve.server import SearchServer  # noqa: E402


def main():
    n_conns = 256
    if "--conns" in sys.argv:
        n_conns = int(sys.argv[sys.argv.index("--conns") + 1])
    root = bench.ensure_bench_corpus()
    db, snap = bench.load_bench_corpus(root)
    queries = bench.bench_queries(snap, 2048, seed=5, phrase_every=8, db=db)
    eng = QueryEngine(db, snapshot=snap)
    eng.prewarm_hydration()

    # fake device rank: instant, and STABLE per query text — a real rank's
    # top-50 is a function of the query, so repeat queries re-hit the native
    # assembler's (doc, query) summary cache. (Random per-slot ids made
    # every render a cache miss and overstated assemble by ~5x.)
    rng = np.random.default_rng(0)
    fake_scores = np.sort(rng.random((128, 50)).astype(np.float32), axis=1)[:, ::-1]
    id_pool = rng.integers(0, snap.n_docs, size=(4096, 50)).astype(np.int32)

    class FakeHandle:
        def __init__(self, parsed):
            self.rows = np.asarray(
                [hash(p.raw) % id_pool.shape[0] for p in parsed], np.int64
            )

        def finish(self):
            return fake_scores[: len(self.rows)], id_pool[self.rows]

    def fake_rank(parsed, topk=50, live=None):
        return FakeHandle(parsed).finish()

    eng.rank = fake_rank
    eng.rank_async = lambda parsed, topk=50, live=None: FakeHandle(parsed)

    server = SearchServer(eng, batching=True)
    host, port = server.start_background(port=0)

    payloads = []
    for q in queries:
        body = json.dumps({"query": q}).encode()
        payloads.append(
            b"POST /query HTTP/1.1\r\nHost: b\r\n"
            b"Content-Type: application/json\r\nContent-Length: "
            + str(len(body)).encode() + b"\r\n\r\n" + body
        )

    sel = selectors.DefaultSelector()

    class Conn:
        __slots__ = ("sock", "buf", "need", "qi", "t0", "lat", "done")

        def __init__(self, qi):
            self.sock = socket.create_connection(("127.0.0.1", port))
            self.sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            self.buf = b""
            self.need = -1
            self.qi = qi
            self.lat = []
            self.done = 0
            sel.register(self.sock, selectors.EVENT_READ, self)
            self.send()

        def send(self):
            self.t0 = time.perf_counter()
            self.sock.sendall(payloads[self.qi % len(payloads)])
            self.qi += n_conns

        def feed(self):
            data = self.sock.recv(1 << 18)
            if not data:
                return False
            self.buf += data
            while True:
                if self.need < 0:
                    he = self.buf.find(b"\r\n\r\n")
                    if he < 0:
                        return True
                    hdr = self.buf[:he].lower()
                    cl = hdr.find(b"content-length:")
                    self.need = he + 4 + int(hdr[cl + 15: hdr.find(b"\r", cl)])
                if len(self.buf) < self.need:
                    return True
                self.buf = self.buf[self.need:]
                self.need = -1
                self.lat.append(time.perf_counter() - self.t0)
                self.done += 1
                self.send()

    conns = [Conn(i) for i in range(n_conns)]

    def pump(until):
        while time.monotonic() < until:
            for key, _ in sel.select(timeout=0.2):
                if key.data.feed() is False:
                    raise RuntimeError("server closed a connection")

    pump(time.monotonic() + 3.0)
    for c in conns:
        c.lat.clear()
        c.done = 0

    prof = None
    if "--cprofile" in sys.argv:
        import cProfile

        prof = cProfile.Profile()
        prof.enable()
    t0 = time.perf_counter()
    pump(time.monotonic() + 10.0)
    dt = time.perf_counter() - t0
    if prof is not None:
        prof.disable()
    total = sum(c.done for c in conns)
    lats = np.sort(np.concatenate([np.asarray(c.lat) for c in conns]))
    print(f"host-only serve: {total / dt:.0f} qps, "
          f"p50 {1e3 * lats[len(lats) // 2]:.1f} ms, conns={n_conns}, "
          f"mean_batch={server.batcher.stats.mean_batch:.1f}")
    from spaghettisearch_tpu.utils.timing import TRACER

    nb = max(server.batcher.stats.batches, 1)
    for name, s in TRACER.report().items():
        if name.startswith("batch."):
            print(f"  {name}: {1e3 * s['total_s'] / nb:.2f} ms/batch "
                  f"(count {s['count']}, mean {s['mean_ms']:.2f} ms)")
    if prof is not None:
        import pstats

        pstats.Stats(prof).sort_stats("tottime").print_stats(20)
    server.shutdown()


if __name__ == "__main__":
    main()
