"""Isolate the host-side wire cost: hydrate_row_json on synthetic top-50
rows (no device rank at all), CPU-forced, with a cProfile breakdown.

python experiments/hydration_only_profile.py [--cprofile]
"""

import cProfile
import pstats
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

import bench  # noqa: E402
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query  # noqa: E402


def main():
    root = bench.ensure_bench_corpus()
    db, snap = bench.load_bench_corpus(root)
    queries = bench.bench_queries(snap, 512, seed=5, phrase_every=8, db=db)
    t0 = time.perf_counter()
    eng = QueryEngine(db, snapshot=snap)
    print(f"engine ctor: {time.perf_counter() - t0:.1f}s")
    parsed = [parse_query(q) for q in queries]
    live = eng._live

    t0 = time.perf_counter()
    n_warm = eng.prewarm_hydration()
    print(f"prewarm_hydration: {n_warm} records in {time.perf_counter() - t0:.1f}s")

    rng = np.random.default_rng(0)
    rows = []
    for p in parsed:
        ids = rng.choice(snap.n_docs, size=50, replace=False).astype(np.int32)
        scores = np.sort(rng.random(50).astype(np.float32))[::-1]
        rows.append((p, scores, ids))

    def hydrate_all():
        total = 0
        for p, s, i in rows:
            total += len(eng.hydrate_row_json(s, i, p, live))
        return total

    n = len(rows)
    total = hydrate_all()  # cold summaries
    t0 = time.perf_counter()
    total = hydrate_all()
    dt = time.perf_counter() - t0
    print(f"hydrate warm: {dt:.2f}s, {dt / n * 1e3:.3f} ms/query, "
          f"{total / n / 1024:.1f} KiB/resp -> {n / dt:.0f} qps single-thread")

    if "--cprofile" in sys.argv:
        pr = cProfile.Profile()
        pr.enable()
        hydrate_all()
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(30)


if __name__ == "__main__":
    main()
