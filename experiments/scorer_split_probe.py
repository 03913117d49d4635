"""Decompose the serving-batch "device" cost at the 100k bench corpus.

Round-3 FINDINGS recorded the mixed 128-batch at 38.7 ms and called the
device program the serving wall — but that number (and mixed_block_probe's)
was measured by QUEUING N dispatches and fetching once. Through the axon
relay each dispatch has a host-side cost; if that cost exceeds the kernel's
actual device time, the queued method measures the DISPATCH floor, not the
device, and the right serving lever is overlapping dispatches (multiple
dispatch threads / deeper pipeline), not a faster kernel.

Two timing methods per program:
  queued  — N async dispatches from one thread, fetch one scalar at the end
            (what FINDINGS round 3 used).
  chained — N iterations inside ONE jit via lax.scan with a data-dependent
            carry (the previous top-1 doc id, floor-divided down to a
            runtime 0, perturbs the next iteration's inputs), so XLA can't
            elide reps and the per-dispatch relay cost is paid once.
  dispatch-only — wall time of the N queued run() calls themselves, before
            any fetch: the host cost of getting a batch onto the device.

queued >> chained  =>  dispatch-bound; chained is the true device time.

Run: python experiments/scorer_split_probe.py  (real TPU via the relay)
"""

import sys
import time

import jax

CPU = "--cpu" in sys.argv  # plumbing smoke test: tiny corpus, interpret kernel
if CPU:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import bench_queries, ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.ops import scoring
from spaghettisearch_tpu.ops.kernels.mixed import pallas_mixed_scores_2sec
from spaghettisearch_tpu.retrieval.engine import QueryEngine, parse_query

REPS = 10


def serving_batch(snap, db, b=128, q=4, p=16):
    """The same (term_ids, qn, ph_ids, ph_valid, pn) packing the engine's
    mixed lane builds for a phrase_every=8 serving batch."""
    queries = bench_queries(snap, 256, phrase_every=8, db=db)
    parsed = [parse_query(t) for t in queries[:b]]
    term_ids = np.full((b, q), snap.n_words, np.int32)
    qn = np.zeros(b, np.int32)
    ph_ids = np.full((b, p), snap.n_words, np.int32)
    ph_valid = np.zeros((b, p), np.float32)
    pn = np.zeros(b, np.int32)
    qlen = np.ones(b, np.float32)
    for i, pq in enumerate(parsed):
        ids = snap.term_ids(pq.keyword_hashes)[:q]
        term_ids[i, : len(ids)] = ids
        qn[i] = len(ids)
        pids = snap.term_ids(pq.phrase_hashes)[:p]
        ph_ids[i, : len(pids)] = pids
        ph_valid[i, : len(pids)] = 1.0
        pn[i] = len(pids)
        qlen[i] = max(pq.query_len, 1)
    perm = np.lexsort((-qn, -pn))
    return tuple(
        jnp.asarray(x)
        for x in (term_ids[perm], qn[perm], ph_ids[perm], ph_valid[perm],
                  pn[perm], qlen[perm])
    )


def timeit_queued(name, fn, *args):
    out = fn(*args)  # compile + settle
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    float(np.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(REPS)]
    t_disp = time.perf_counter() - t0
    jax.block_until_ready(outs)
    float(np.asarray(jax.tree.leaves(outs[-1])[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} queued {dt * 1e3:7.1f} ms/rep   "
          f"(dispatch-only {t_disp / REPS * 1e3:6.1f} ms/rep)", flush=True)
    return dt


def timeit_chained(name, scan_fn):
    """scan_fn: jitted, runs REPS data-dependent iterations internally."""
    out = scan_fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = scan_fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / REPS
    print(f"{name:34s} chained {dt * 1e3:6.1f} ms/rep", flush=True)
    return dt


def main():
    root = ensure_bench_corpus(500 if CPU else 100_000)
    db, snap = load_bench_corpus(root)
    eng = QueryEngine(db, snapshot=snap)
    idx = eng.index
    assert idx.pos_dense, "mixed lane not active on this corpus"
    term_ids, qn, ph_ids, ph_valid, pn, qlen = serving_batch(snap, db)
    b = term_ids.shape[0]
    tp = jnp.zeros((b, idx.pagerank.shape[1]), jnp.float32)
    kw = dict(emit_counts=idx.has_zero_weight)
    n_docs = idx.title.fwd.ft.shape[0]
    print(f"corpus: {n_docs} docs, T_title={idx.title.fwd.ft.shape[1]}, "
          f"T_body={idx.body.fwd.ft.shape[1]}, b={b}", flush=True)

    # ---- full mixed program (what serving dispatches) ----
    def run_mixed(tids):
        return scoring.score_queries_mixed(
            idx.title.fwd, idx.body.fwd, idx.title.posT, idx.body.posT,
            idx.mag_title, idx.mag_body, idx.pagerank,
            tids, qlen, tp, ph_ids, ph_valid, qn, pn,
            topk=50, use_pallas=not CPU, **kw,
        )

    timeit_queued("mixed full (scan+finalize+topk)", run_mixed, term_ids)

    @jax.jit
    def mixed_chained():
        def body(carry, _):
            bump = carry // jnp.int32(1 << 28)  # runtime 0, not foldable
            s, i = run_mixed(term_ids + bump)
            return i[0, 0].astype(jnp.int32), s[0, 0]

        _, outs = jax.lax.scan(body, jnp.int32(0), None, length=REPS)
        return outs

    t_mixed = timeit_chained("mixed full (scan+finalize+topk)", mixed_chained)

    # ---- keyword-only program ----
    def run_kw(tids):
        return scoring.score_queries_forward(
            idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body,
            idx.pagerank, tids, qlen, tp, qn,
            topk=50, use_pallas=not CPU, **kw,
        )

    timeit_queued("keyword full", run_kw, term_ids)

    @jax.jit
    def kw_chained():
        def body(carry, _):
            bump = carry // jnp.int32(1 << 28)
            s, i = run_kw(term_ids + bump)
            return i[0, 0].astype(jnp.int32), s[0, 0]

        _, outs = jax.lax.scan(body, jnp.int32(0), None, length=REPS)
        return outs

    timeit_chained("keyword full", kw_chained)

    # ---- components, chained ----
    def run_kernel(tids):
        return pallas_mixed_scores_2sec(
            idx.title.fwd.ftT, idx.title.fwd.fwT,
            idx.body.fwd.ftT, idx.body.fwd.fwT,
            idx.title.posT, idx.body.posT,
            tids, qn, ph_ids, ph_valid, pn, doc_block=256, interpret=CPU, **kw,
        )

    @jax.jit
    def kernel_chained():
        def body(carry, _):
            bump = carry // jnp.float32(1e30)  # runtime 0.0
            ts, tc, bs, bc = run_kernel(term_ids + bump.astype(jnp.int32))
            return ts[0, 0], ts[0, 0]

        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return outs

    t_kernel = timeit_chained("mixed kernel only", kernel_chained)

    ts, tc, bs, bc = run_kernel(term_ids)
    if tc is None:
        tc = (ts + bs > 0).astype(ts.dtype)
        bc = jnp.zeros_like(tc)
    ts, tc, bs, bc = map(jax.block_until_ready, (ts, tc, bs, bc))

    @jax.jit
    def finalize_chained():
        def body(carry, _):
            bump = jnp.isnan(carry).astype(jnp.float32)  # runtime 0.0
            final = scoring.finalize_scores(
                ts, tc, bs, bc, idx.mag_title, idx.mag_body, idx.pagerank,
                qlen + bump, tp,
            )
            return final[0, 0], final[0, 0]

        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=REPS)
        return outs

    t_fin = timeit_chained("finalize only", finalize_chained)

    final = scoring.finalize_scores(
        ts, tc, bs, bc, idx.mag_title, idx.mag_body, idx.pagerank, qlen, tp
    )
    final = jax.block_until_ready(final)

    @jax.jit
    def topk_chained():
        def body(carry, _):
            bump = (carry // jnp.int32(1 << 28)).astype(jnp.float32)
            s, i = scoring.exact_top_k(final + bump, 50)
            return i[0, 0].astype(jnp.int32), s[0, 0]

        _, outs = jax.lax.scan(body, jnp.int32(0), None, length=REPS)
        return outs

    t_topk = timeit_chained("exact_top_k(50) only", topk_chained)

    print(f"\nsum of parts {1e3 * (t_kernel + t_fin + t_topk):.1f} ms vs "
          f"mixed chained {1e3 * t_mixed:.1f} ms", flush=True)
    db.close()


if __name__ == "__main__":
    main()
