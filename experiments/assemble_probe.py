"""Microbench the native batch assembler (fastserve.cpp) in isolation:
cold (first pass, summary renders) vs warm (repeat (doc,query) pairs,
cache-hit memcpys), on the 100k bench corpus. Pinpoints where the serving
profile's ~32 ms/batch assemble cost lives.

python experiments/assemble_probe.py
"""

import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

import bench  # noqa: E402
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query  # noqa: E402
from spaghettisearch_tpu.retrieval.summary import (  # noqa: E402
    _packed_query,
    prepare_summary_query,
)


def main():
    root = bench.ensure_bench_corpus()
    db, snap = bench.load_bench_corpus(root)
    queries = bench.bench_queries(snap, 4096, seed=5, phrase_every=8, db=db)
    eng = QueryEngine(db, snapshot=snap)
    n = eng.prewarm_hydration()
    gen = getattr(eng.snapshot, "_native_hyd", None)
    print(f"prewarmed {n} docs; native gen: {gen is not None}")
    assert gen is not None

    rng = np.random.default_rng(0)
    b, k = 128, 50
    ids = rng.integers(0, snap.n_docs, size=(b, k)).astype(np.int32)
    scores = np.sort(rng.random((b, k)).astype(np.float32), axis=1)[:, ::-1]

    def packed_for(batch_q):
        return [
            _packed_query(prepare_summary_query(p.stripped, p.phrases))
            for p in (parse_query(q) for q in batch_q)
        ]

    # distinct batches (cold cache) then the same batches again (warm)
    n_batches = 16
    batches = []
    for i in range(n_batches):
        batch_q = queries[i * b : (i + 1) * b]
        batches.append((ids, scores, packed_for(batch_q)))

    def run_all():
        t0 = time.perf_counter()
        for i_, s_, p_ in batches:
            gen.assemble_batch(i_, s_, p_)
        return (time.perf_counter() - t0) / n_batches * 1e3

    cold = run_all()
    warm = min(run_all() for _ in range(3))
    print(f"assemble_batch b={b} k={k}: cold {cold:.2f} ms, warm {warm:.2f} ms")

    # how much is the FinalRank snprintf? score formatting dominates when
    # warm is flat vs k... probe k sensitivity
    for k2 in (10, 50):
        i2, s2 = ids[:, :k2], np.ascontiguousarray(scores[:, :k2])
        t0 = time.perf_counter()
        for _, _, p_ in batches:
            gen.assemble_batch(i2, s2, p_)
        print(f"  warm k={k2}: {(time.perf_counter()-t0)/n_batches*1e3:.2f} ms")

    # python-side per-batch glue the batcher pays around the call
    t0 = time.perf_counter()
    for i in range(n_batches):
        packed_for(queries[i * b : (i + 1) * b])
    print(f"packed_query prep per batch: {(time.perf_counter()-t0)/n_batches*1e3:.2f} ms")

    t0 = time.perf_counter()
    for i in range(n_batches):
        for q in queries[i * b : (i + 1) * b]:
            parse_query(q)
    print(f"parse_query per batch: {(time.perf_counter()-t0)/n_batches*1e3:.2f} ms")
    db.close()


if __name__ == "__main__":
    main()
