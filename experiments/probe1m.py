"""Round-3 probe: where do serve1m's 126 ms/batch go at 1M docs?

serve1m measured 1,018 qps (128/batch -> ~126 ms per batch at the
bottleneck stage) with rank_device (async dispatch) at only 4.8 ms.
The actual device wait lands in batch.fetch, so this probe measures the
device side directly on the real 1M corpus:

  - mixed 128-batch, serial engine.rank (dispatch + device + fetch)
  - the same batches queued-then-fetched (the batcher's pipelined pattern:
    steady-state throughput = max(stage) rather than sum)
  - keyword-only 128-batch for the phrase-pass increment

Run (needs .bench/corpus1000k built): python experiments/probe1m.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import bench_queries, ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query


def t_serial(fn, reps=5):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    root = ensure_bench_corpus(n)
    db, snap = load_bench_corpus(root)
    t0 = time.perf_counter()
    eng = QueryEngine(db, snapshot=snap)
    print(f"device index in {time.perf_counter() - t0:.1f}s; "
          f"fused={eng.model.supports_mixed(eng.index)}", flush=True)
    t0 = time.perf_counter()
    eng.warmup()
    print(f"warmup+settle in {time.perf_counter() - t0:.1f}s", flush=True)

    queries = bench_queries(snap, 512, phrase_every=8, db=db)
    parsed = [parse_query(q) for q in queries]
    batches = [parsed[i : i + 128] for i in range(0, 512, 128)]
    n_ph = sum(1 for p in batches[0] if p.phrase_hashes)

    a = t_serial(lambda: eng.rank(batches[0]))
    print(f"mixed 128-batch serial ({n_ph} phrases): {a:.1f} ms "
          f"({128e3 / a:.0f} qps)", flush=True)

    # pipelined: queue all dispatches, then fetch in order (batcher pattern)
    def pipelined(reps=3):
        handles = [eng.rank_async(b) for b in batches]  # warm the programs
        for h in handles:
            h.finish()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            handles = [eng.rank_async(b) for b in batches * 3]
            outs = [h.finish() for h in handles]
            dt = time.perf_counter() - t0
            best = min(best, dt / (len(batches) * 3))
        return best * 1e3, outs

    p, _ = pipelined()
    print(f"mixed 128-batch pipelined: {p:.1f} ms/batch "
          f"({128e3 / p:.0f} qps)", flush=True)

    kw_only = [q for q in parsed if not q.phrase_hashes]
    kw_batch = (kw_only * 2)[:128]
    akw = t_serial(lambda: eng.rank(kw_batch))
    print(f"keyword-only 128-batch serial: {akw:.1f} ms "
          f"({128e3 / akw:.0f} qps)", flush=True)

    # dispatch-only cost (what serve's rank_device span measures)
    def dispatch_only():
        h = eng.rank_async(batches[0])
        dt = None
        t0 = time.perf_counter()
        h2 = eng.rank_async(batches[1])
        dt = time.perf_counter() - t0
        h.finish(); h2.finish()
        return dt * 1e3

    d = min(dispatch_only() for _ in range(5))
    print(f"dispatch-only: {d:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
