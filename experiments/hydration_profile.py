"""Profile the wire-path cost per request on the 100k bench corpus:
device rank vs host hydration (hydrate_row_json), single-threaded.

python experiments/hydration_profile.py [--cprofile]
"""

import cProfile
import pstats
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query


def main():
    root = bench.ensure_bench_corpus()
    db, snap = bench.load_bench_corpus(root)
    queries = bench.bench_queries(snap, 512, seed=5, phrase_every=8, db=db)
    eng = QueryEngine(db, snapshot=snap)
    parsed = [parse_query(q) for q in queries]

    live = eng._live
    B = 64
    # rank all batches first (device), collecting outputs
    t0 = time.perf_counter()
    ranked = []
    for i in range(0, len(parsed), B):
        chunk = parsed[i : i + B]
        s, ids = eng.rank(chunk, topk=50, live=live)
        ranked.append((chunk, s, ids))
    rank_s = time.perf_counter() - t0
    n = len(parsed)
    print(f"rank (incl compiles): {rank_s:.2f}s total, {rank_s/n*1e3:.2f} ms/query")

    # second pass: warm rank timing
    t0 = time.perf_counter()
    for i in range(0, len(parsed), B):
        chunk = parsed[i : i + B]
        eng.rank(chunk, topk=50, live=live)
    rank_s = time.perf_counter() - t0
    print(f"rank warm: {rank_s:.2f}s total, {rank_s/n*1e3:.2f} ms/query")

    def hydrate_all():
        total = 0
        for chunk, s, ids in ranked:
            for p, srow, irow in zip(chunk, s, ids):
                total += len(eng.hydrate_row_json(srow, irow, p, live))
        return total

    t0 = time.perf_counter()
    total = hydrate_all()
    dt = time.perf_counter() - t0
    print(f"hydrate cold: {dt:.2f}s, {dt/n*1e3:.2f} ms/query, {total/n/1024:.1f} KiB/resp")

    t0 = time.perf_counter()
    hydrate_all()
    dt = time.perf_counter() - t0
    print(f"hydrate warm (doc caches hot): {dt:.2f}s, {dt/n*1e3:.2f} ms/query "
          f"-> {n/dt:.0f} qps single-thread")

    if "--cprofile" in sys.argv:
        pr = cProfile.Profile()
        pr.enable()
        hydrate_all()
        pr.disable()
        stats = pstats.Stats(pr)
        stats.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
