"""Round-3 probe: the fused mixed lane on the real TPU vs round-2 numbers.

Round-2 baseline (mixed_stage_probe.py): mixed 128-batch 309 ms (matcher
264 ms of it), keyword-only 36 ms. Target: mixed <= ~100 ms.

Run: python experiments/fused_lane_probe.py [--legacy]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from bench import bench_queries, ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query


def t(fn, reps=5):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    legacy = "--legacy" in sys.argv
    root = ensure_bench_corpus()
    db, snap = load_bench_corpus(root)
    t0 = time.perf_counter()
    eng = QueryEngine(db, snapshot=snap)
    if legacy:
        eng.index.title.posT = None
    print(f"device index in {time.perf_counter() - t0:.1f}s; "
          f"fused={eng.model.supports_mixed(eng.index)}", flush=True)
    t0 = time.perf_counter()
    eng.warmup()
    print(f"warmup+settle in {time.perf_counter() - t0:.1f}s", flush=True)

    queries = bench_queries(snap, 256, phrase_every=8, db=db)
    parsed = [parse_query(q) for q in queries[:128]]
    n_ph = sum(1 for p in parsed if p.phrase_hashes)

    a = t(lambda: eng.rank(parsed))
    print(f"mixed 128-batch ({n_ph} phrases): {a:.1f} ms "
          f"({128e3 / a:.0f} qps)")

    kw_only = [p for p in parsed if not p.phrase_hashes]
    kw_batch = (kw_only * 3)[:128]
    akw = t(lambda: eng.rank(kw_batch))
    print(f"keyword-only 128-batch: {akw:.1f} ms ({128e3 / akw:.0f} qps)")

    # denser phrase mix (every query has a phrase)
    ph_batch = [p for p in parsed if p.phrase_hashes]
    ph_batch = (ph_batch * 9)[:128]
    aph = t(lambda: eng.rank(ph_batch))
    print(f"all-phrase 128-batch: {aph:.1f} ms ({128e3 / aph:.0f} qps)")

    # small-batch latency
    asm = t(lambda: eng.rank(parsed[:8]))
    print(f"mixed 8-batch: {asm:.1f} ms")

    # correctness spot check vs legacy on the same corpus
    if not legacy:
        eng2 = QueryEngine(db, snapshot=snap, device=None)
        eng2.index.title.posT = None
        sf, if_ = eng.rank(parsed[:32])
        sl, il = eng2.rank(parsed[:32])
        bad = 0
        for r in range(32):
            got = {int(d): float(s) for s, d in zip(sf[r], if_[r]) if np.isfinite(s)}
            want = {int(d): float(s) for s, d in zip(sl[r], il[r]) if np.isfinite(s)}
            if set(got) != set(want) or any(
                abs(got[d] - want[d]) > 1e-4 * max(abs(want[d]), 1) for d in want
            ):
                bad += 1
                print("  MISMATCH row", r, queries[r])
        print(f"parity vs legacy lane: {32 - bad}/32 rows identical")


if __name__ == "__main__":
    main()
