"""Headline-shape probe: queued per-batch dispatch vs lax.scan-chained reps.

The headline bench queues 20 independent 256-query dispatches; through the
relay each dispatch carries a host-side cost, so the queued figure bundles
device throughput with relay dispatch overhead. Chaining the same batches
inside ONE jit (data-dependent carry so XLA cannot elide work) isolates
device throughput — the number a locally-attached production TPU would see.

Run: python experiments/headline_chain_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import ensure_bench_corpus, load_bench_corpus
from spaghettisearch_tpu.ops.scoring import pallas_available, score_queries_forward
from spaghettisearch_tpu.retrieval.device_index import DeviceIndex


def main():
    root = ensure_bench_corpus()
    _db, snap = load_bench_corpus(root)
    _db.close()
    idx = DeviceIndex.from_snapshot(snap)
    n_words = snap.n_words
    batch, q, topk, n_batches = 256, 4, 10, 20

    rng = np.random.default_rng(1)
    df = (snap.body.post_offsets[1:] - snap.body.post_offsets[:-1]).astype(np.float64)
    p = df / df.sum()
    tids_all = np.full((n_batches, batch, q), n_words, np.int32)
    qn_all = np.zeros((n_batches, batch), np.int32)
    for bi in range(n_batches):
        ks = rng.integers(1, q + 1, batch)
        ks[::-1].sort()
        for i, k in enumerate(ks):
            tids_all[bi, i, :k] = rng.choice(n_words, size=int(k), p=p)
        qn_all[bi] = ks
    qlen_all = qn_all.astype(np.float32)
    tp = jnp.zeros((batch, idx.n_categories), jnp.float32)
    use_pallas = pallas_available()
    emit_counts = idx.has_zero_weight

    def run(tids, qn, qlen):
        return score_queries_forward(
            idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body,
            idx.pagerank, tids, qlen, tp, qn, topk=topk,
            use_pallas=use_pallas, emit_counts=emit_counts,
        )

    dev = [
        (jnp.asarray(tids_all[i]), jnp.asarray(qn_all[i]), jnp.asarray(qlen_all[i]))
        for i in range(n_batches)
    ]
    np.asarray(run(*dev[0])[0])  # compile + settle
    np.asarray(run(*dev[0])[0])

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [run(*d) for d in dev]
        jax.block_until_ready(outs)
        np.asarray(outs[-1][0])
        best = min(best, time.perf_counter() - t0)
    print(f"queued: {best * 1e3 / n_batches:.2f} ms/batch "
          f"({n_batches * batch / best:.0f} qps)", flush=True)

    tids_s = jnp.asarray(tids_all)
    qn_s = jnp.asarray(qn_all)
    qlen_s = jnp.asarray(qlen_all)

    @jax.jit
    def chained():
        def body(carry, x):
            tids, qn, qlen = x
            s, ids = run(tids + carry, qn, qlen)
            # data-dependent carry: keeps every step live, adds ~nothing
            return (s[0, 0] // jnp.float32(1e30)).astype(jnp.int32), s[0, 0]

        _, outs = jax.lax.scan(body, jnp.int32(0), (tids_s, qn_s, qlen_s))
        return outs

    jax.block_until_ready(chained())
    best_c = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chained())
        best_c = min(best_c, time.perf_counter() - t0)
    print(f"chained: {best_c * 1e3 / n_batches:.2f} ms/batch "
          f"({n_batches * batch / best_c:.0f} qps)", flush=True)


if __name__ == "__main__":
    main()
