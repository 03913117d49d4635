"""Round-3 probe: price phrase-class batch segregation at the 1M tier.

serve1m is device-limited by the fused MIXED program (~94 ms/128-batch
same-day, session 6): one phrase query in a batch forces the whole batch
onto the mixed kernel, which cannot take the q=3 dispatch or dynamic-T
levels (VMEM cliffs, FINDINGS sessions 5-6), so the keyword work inside
it runs ~35 ms slower than the leveled keyword program. With phrase
share 1/8 (the reference workload mix), segregating the serving queue by
phrase-presence turns 8 mixed batches per 1024 queries into 7 keyword
batches + 1 all-phrase batch.

This prices that pattern on the real 1M corpus, same-day:
  - mixed 128-batch pipelined (control = today's serve1m device wall)
  - keyword-only 128-batch pipelined (the segregated fast class)
  - ALL-phrase 128-batch pipelined (the segregated slow class; phrase
    rows have per-row kernel cost, ~0.7 ms/row at 1M, so this is NOT
    the same as the 16-phrase mixed batch)
  - the full segregated pattern (7 kw + 1 ph per 1024 queries),
    interleaved the way the batcher would emit them

Run (needs .bench/corpus1000k built): python experiments/segregate_probe.py [n_docs]
"""

import sys
import time

sys.path.insert(0, ".")

from bench import bench_queries, ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query


def pipelined(eng, batches, reps=3, label=""):
    handles = [eng.rank_async(b) for b in batches]
    for h in handles:
        h.finish()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        handles = [eng.rank_async(b) for b in batches * 3]
        for h in handles:
            h.finish()
        dt = time.perf_counter() - t0
        best = min(best, dt / (len(batches) * 3))
    n_q = sum(len(b) for b in batches) / len(batches)
    print(f"{label}: {best * 1e3:.1f} ms/batch ({n_q / best:.0f} qps)",
          flush=True)
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

    queries = bench_queries(snap, 1024, phrase_every=8, db=db)
    parsed = [parse_query(q) for q in queries]
    kw = [p for p in parsed if not p.phrase_hashes]
    ph = [p for p in parsed if p.phrase_hashes]
    print(f"workload: {len(kw)} keyword / {len(ph)} phrase", flush=True)

    # control: today's behavior — every 128-batch carries >=1 phrase
    mixed_batches = [parsed[i : i + 128] for i in range(0, 1024, 128)]
    a = pipelined(eng, mixed_batches, label="mixed 128-batch (control)")

    kw_batches = [kw[i : i + 128] for i in range(0, len(kw) - 127, 128)]
    b = pipelined(eng, kw_batches, label="keyword 128-batch")

    ph_batch = (ph * ((127 + len(ph)) // len(ph)))[:128]
    c = pipelined(eng, [ph_batch], label="ALL-phrase 128-batch")

    # the segregated pattern the batcher would emit: 7 kw + 1 ph per 1024
    seg = kw_batches[:7] + [ph[:128] if len(ph) >= 128 else ph_batch]
    total = pipelined(eng, seg, label="segregated (7kw+1ph) per-batch mean")
    n_q = sum(len(x) for x in seg)
    print(f"segregated pattern: {n_q} queries in {total * len(seg):.1f} ms "
          f"-> {n_q / (total * len(seg) / 1e3):.0f} qps "
          f"(control {1024 / (a * 8 / 1e3):.0f})", flush=True)


if __name__ == "__main__":
    main()
