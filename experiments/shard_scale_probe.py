"""Round-5 probe: price the doc-sharded mesh's serve1m on REAL hardware.

VERDICT r4 #1: serve1m misses its 2,000-qps full-contract bar at 0.87x on
one chip, and round 4 closed the gap with the assertion ">1M-scale
throughput is the doc-sharded mesh's job" without a number. This probe
measures the SHARD-LOCAL device programs at true shard scale on the one
real TPU chip — the first 1M/8- and 1M/4-doc ranges of the REAL 1M corpus
via index.snapshot.slice_snapshot (score-identical to the full corpus on
the kept docs, tests/test_persist.py) — and models the full 8-chip (and
4-chip) serving cycle from measured parts:

  per-batch mesh device time  = shard-local program time (batch rows are
                                REPLICATED, docs are SHARDED — every chip
                                scores the same 128 rows over its slice)
  + top-k all-gather merge    = [n, B, 50] scores+ids over ICI + per-row
                                merge  (~2 MB, modeled at 2 ms — generous)
  + measured host stages      = dispatch / assemble spans from the r4
                                serve1m artifact (RESULTS_r04.json)

Workload mix matches serve1m (segregation auto): 7/8 leveled-keyword
batches + 1/8 patience-merged batches carrying the pooled phrase cohort
(~64 phrase rows). Run:  python experiments/shard_scale_probe.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

from bench import bench_queries, ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.index.snapshot import slice_snapshot
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query

MERGE_COLLECTIVE_MS = 2.0  # [n,128,50] f32+i32 all-gather + row merge (generous)
R4_SPANS = {"dispatch": 5.531, "assemble": 19.73}  # RESULTS_r04 serve1m
R4_MEAN_BATCH = 125.17


def shard_rows(n_docs: int, n_shards: int) -> int:
    dl = -(-n_docs // n_shards)
    return -(-dl // 512) * 512  # parallel/sharded.py doc-block alignment


def pipelined_ms(eng, batches, reps=3):
    handles = [eng.rank_async(b) for b in batches]
    for h in handles:
        h.finish()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        hs = [eng.rank_async(b) for b in batches * 3]
        for h in hs:
            h.finish()
        best = min(best, (time.perf_counter() - t0) / (len(batches) * 3))
    return best * 1e3


def main():
    root = ensure_bench_corpus(1_000_000)
    db, snap = load_bench_corpus(root)
    queries = bench_queries(snap, 1024, phrase_every=8, db=db)
    parsed = [parse_query(q) for q in queries]
    kw = [p for p in parsed if not p.phrase_hashes]
    ph = [p for p in parsed if p.phrase_hashes]
    kw_batch = (kw * 2)[:128]
    # patience-merged cohort shape: ~64 pooled phrase rows + keyword fill
    merge_batch = (ph * 2)[:64] + kw[:64]
    mixed16 = ph[:16] + kw[64:176]

    out = {}
    for n_shards in (8, 4):
        dl = shard_rows(snap.n_docs, n_shards)
        t0 = time.perf_counter()
        sl = slice_snapshot(snap, dl)
        eng = QueryEngine(db, snapshot=sl)
        print(f"[{n_shards}-shard] slice {dl} docs: engine in "
              f"{time.perf_counter() - t0:.1f}s fused="
              f"{eng.model.supports_mixed(eng.index)} "
              f"doc_sort={eng.index.doc_perm is not None}", flush=True)

        t_kw = pipelined_ms(eng, [kw_batch])
        t_merge = pipelined_ms(eng, [merge_batch])
        t_mixed16 = pipelined_ms(eng, [mixed16])
        print(f"[{n_shards}-shard @{dl}] kw-128 {t_kw:.1f} ms | "
              f"merged-128 (64 ph) {t_merge:.1f} ms | "
              f"mixed-128 (16 ph) {t_mixed16:.1f} ms", flush=True)

        # serve cycle: 7/8 kw + 1/8 merged batches + collective merge
        device_ms = (7 * t_kw + t_merge) / 8 + MERGE_COLLECTIVE_MS
        ceiling = 128e3 / device_ms
        # pipeline: cycle = max stage (3-stage batcher); host spans from the
        # measured single-chip r4 artifact (1-core serving host!)
        cycle = max(device_ms, R4_SPANS["assemble"], R4_SPANS["dispatch"])
        projected = R4_MEAN_BATCH * 1e3 / cycle
        print(f"[{n_shards}-shard] device cycle {device_ms:.1f} ms -> "
              f"device ceiling {ceiling:.0f} qps; pipeline-projected "
              f"{projected:.0f} qps (host stages from RESULTS_r04)",
              flush=True)
        out[f"shards{n_shards}"] = {
            "local_docs": dl,
            "kw128_ms": round(t_kw, 2),
            "merged128_ms": round(t_merge, 2),
            "mixed16_ms": round(t_mixed16, 2),
            "device_cycle_ms": round(device_ms, 2),
            "device_ceiling_qps": round(ceiling, 1),
            "pipeline_projected_qps": round(projected, 1),
        }
        del eng

    print(json.dumps(out))


if __name__ == "__main__":
    main()
