"""Roofline the two flagship device programs (VERDICT r4 #4).

"Speed-of-light" claims in FINDINGS rounds 3-4 rest on wash experiments
(e.g. int16 posT halving the dominant stream changed nothing -> "VPU/VMEM-
scheduling-bound"). This makes them NUMBERS: measure the chip's achievable
HBM stream rate same-session, enumerate the bytes each program must move
per batch from the live DeviceIndex buffers, and report achieved GB/s as a
fraction of the measured stream peak plus the implied VPU compare load.

 Programs:
  1. headline keyword program — 256-batch topk=10 at the 100k crawl corpus
     (doc-sorted, dynamic-T tc=32, hot-term MXU matmul, chunk-max top-k)
  2. 1M mixed program — 128-batch mixed keyword+phrase (16 phrase rows),
     static sweep + int16 posT planes

Run: python experiments/roofline.py [--skip-1m]
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

GiB = 1 << 30


def measure_stream_peak():
    """Achievable single-chip HBM read rate: 8 fused full reads of a 2 GiB
    f32 array chained INSIDE one jit (the relay's block_until_ready alone
    under-reports — CLAUDE.md; the scalar result is fetched to the host so
    the timing brackets real device completion). The per-iteration add
    fuses into the reduction, so each trip is exactly one stream of x."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    x = jnp.ones((512, 1024 * 1024), jnp.float32)  # 2 GiB
    reads = 8

    @jax.jit
    def red(x):
        def body(i, acc):
            return acc + (x + i.astype(jnp.float32)).sum()

        return lax.fori_loop(0, reads, body, 0.0)

    np.asarray(red(x))
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(red(x))
        best = min(best, time.perf_counter() - t0)
    return reads * x.nbytes / best / 1e9  # GB/s


def t_pipelined(fn_async, reps=3, chain=6):
    hs = [fn_async() for _ in range(2)]
    for h in hs:
        h.finish()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        hs = [fn_async() for _ in range(chain)]
        for h in hs:
            h.finish()
        best = min(best, (time.perf_counter() - t0) / chain)
    return best * 1e3


def section_bytes(sec, dyn_factor=1.0):
    """ftT + fwT stream per batch (the membership sweep reads both)."""
    return (sec.fwd.ftT.nbytes + sec.fwd.fwT.nbytes) * dyn_factor


def dyn_t_factor(idx):
    """Measured fraction of the static T sweep the dynamic-T bound leaves:
    sum over doc blocks of their tmax (tc-rounded) / (n_blocks * T)."""
    if idx.body.tmax_blocks is None:
        return 1.0
    tm = np.asarray(idx.body.tmax_blocks, np.float64)
    t_static = idx.body.fwd.ftT.shape[0]
    return float(tm.sum() / (tm.size * t_static))


def main() -> None:
    from bench import bench_queries, ensure_bench_corpus, load_bench_corpus
    from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query

    peak = measure_stream_peak()
    print(f"measured HBM stream peak: {peak:.0f} GB/s", flush=True)
    out = {"stream_peak_GBps": round(peak, 1)}

    # ---- program 1: headline keyword (100k, 256-batch, topk=10) ----
    root = ensure_bench_corpus(100_000)
    db, snap = load_bench_corpus(root)
    eng = QueryEngine(db, snapshot=snap, big_batch=True)
    idx = eng.index
    queries = bench_queries(snap, 1024, phrase_every=0, db=db)
    parsed = [parse_query(q) for q in queries]
    kw = [p for p in parsed if not p.phrase_hashes]
    batch = (kw * 2)[:256]
    ms = t_pipelined(lambda: eng.rank_async(batch, topk=10))
    f_dyn = dyn_t_factor(idx)
    d_pad = idx.body.fwd.ftT.shape[1]
    b_pad = 256
    by = {
        "body_sweep": section_bytes(idx.body, f_dyn),
        "title_sweep": section_bytes(idx.title, f_dyn),
        "hot_matmul_W": idx.hot_body_w.nbytes if idx.hot_body_w is not None else 0,
        "rank_mag": idx.pagerankT.nbytes + idx.mag_title.nbytes + idx.mag_body.nbytes,
        "scores_rt": 2 * b_pad * d_pad * 4,  # [B, D] write + chunk-max read
    }
    total = sum(by.values())
    ach = total / (ms / 1e3) / 1e9
    # VPU compare load: each (doc, t) element costs ~q_eff (eq+sel+fma)
    q_eff = 2.5  # leveled dispatch: 1-4 keyword compares, df-weighted mean
    elems = (idx.body.fwd.ftT.shape[0] * f_dyn + idx.title.fwd.ftT.shape[0]) * d_pad
    vops = elems * q_eff * 3 * (b_pad / 8)  # per 8-row query block
    print(f"[headline kw 100k] {ms:.2f} ms/256-batch  bytes={total/1e9:.2f} GB "
          f"-> {ach:.0f} GB/s = {100*ach/peak:.0f}% of stream peak; "
          f"VPU ~{vops/ (ms/1e3) / 1e12:.1f} Tops/s", flush=True)
    out["headline_kw_100k"] = {
        "ms_per_batch": round(ms, 2), "bytes_per_batch_GB": round(total / 1e9, 3),
        "achieved_GBps": round(ach, 1), "pct_of_stream_peak": round(100 * ach / peak, 1),
        "dyn_t_factor": round(f_dyn, 3), "bytes_split": {k: int(v) for k, v in by.items()},
        "vpu_tops_per_s": round(vops / (ms / 1e3) / 1e12, 2),
    }
    db.close()
    del eng
    import gc

    gc.collect()

    if "--skip-1m" not in sys.argv:
        # ---- program 2: 1M mixed (128-batch, 16 phrase rows) ----
        root = ensure_bench_corpus(1_000_000)
        db, snap = load_bench_corpus(root)
        eng = QueryEngine(db, snapshot=snap)
        idx = eng.index
        queries = bench_queries(snap, 1024, phrase_every=8, db=db)
        parsed = [parse_query(q) for q in queries]
        ph = [p for p in parsed if p.phrase_hashes]
        kw = [p for p in parsed if not p.phrase_hashes]
        mixed = ph[:16] + kw[:112]
        ms = t_pipelined(lambda: eng.rank_async(mixed))
        d_pad = idx.body.fwd.ftT.shape[1]
        by = {
            "body_sweep": section_bytes(idx.body),   # mixed lane: static T
            "title_sweep": section_bytes(idx.title),
            "posT_body": idx.body.posT.nbytes,
            "posT_title": idx.title.posT.nbytes,
            "hot_matmul_W": idx.hot_body_w.nbytes if idx.hot_body_w is not None else 0,
            "rank_mag": idx.pagerankT.nbytes + idx.mag_title.nbytes + idx.mag_body.nbytes,
            "scores_rt": 2 * 128 * d_pad * 4,
        }
        total = sum(by.values())
        ach = total / (ms / 1e3) / 1e9
        print(f"[mixed 1M] {ms:.2f} ms/128-batch  bytes={total/1e9:.2f} GB "
              f"-> {ach:.0f} GB/s = {100*ach/peak:.0f}% of stream peak",
              flush=True)
        out["mixed_1m"] = {
            "ms_per_batch": round(ms, 2),
            "bytes_per_batch_GB": round(total / 1e9, 3),
            "achieved_GBps": round(ach, 1),
            "pct_of_stream_peak": round(100 * ach / peak, 1),
            "bytes_split": {k: int(v) for k, v in by.items()},
        }
        db.close()

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
