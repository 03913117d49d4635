"""Measure the round-2 membership-kernel variants on the real TPU:
per-block dynamic q (sorted batch) and count elision.

python experiments/qskip_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from bench import synth_snapshot
from spaghettisearch_tpu.ops.scoring import score_queries_forward
from spaghettisearch_tpu.retrieval.device_index import DeviceIndex


def bench_case(name, idx, term_ids, qlen, tp, qn, emit_counts, reps=10):
    args = dict(topk=10, use_pallas=True, emit_counts=emit_counts)
    qn_j = None if qn is None else jnp.asarray(qn)
    out = score_queries_forward(
        idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body, idx.pagerank,
        jnp.asarray(term_ids), jnp.asarray(qlen), jnp.asarray(tp), qn_j, **args,
    )
    np.asarray(out[0])
    t0 = time.perf_counter()
    outs = [
        score_queries_forward(
            idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body,
            idx.pagerank, jnp.asarray(term_ids), jnp.asarray(qlen),
            jnp.asarray(tp), qn_j, **args,
        )
        for _ in range(reps)
    ]
    np.asarray(outs[-1][0])
    dt = (time.perf_counter() - t0) / reps
    b = term_ids.shape[0]
    print(f"{name:46s}: {dt*1e3:8.2f} ms ({b/dt:9.0f} qps)")
    return out


def run(n_docs, n_words, body_tpd, max_df, batch, label):
    print(f"--- {label}: D={n_docs} ---")
    snap = synth_snapshot(
        n_docs=n_docs, n_words=n_words, body_terms_per_doc=body_tpd,
        title_terms_per_doc=4, max_df=max_df,
    )
    idx = DeviceIndex.from_snapshot(snap)
    print("has_zero_weight:", idx.has_zero_weight)
    rng = np.random.default_rng(1)
    df = np.diff(snap.body.post_offsets).astype(np.float64)
    p = df / df.sum()
    q = 4
    # realistic q mix: 1-4 terms uniform, sorted descending (engine contract)
    kmix = rng.integers(1, 5, batch)
    kmix.sort()
    kmix = kmix[::-1].copy()
    term_mix = np.full((batch, q), n_words, np.int32)
    for i, k in enumerate(kmix):
        term_mix[i, :k] = rng.choice(n_words, size=k, p=p)
    term_all4 = rng.choice(n_words, size=(batch, q), p=p).astype(np.int32)
    qlen = np.full(batch, 4.0, np.float32)
    tp = np.zeros((batch, 1), np.float32)

    base = bench_case("all-q4  baseline (qn=None, counts)", idx,
                      term_all4, qlen, tp, None, True)
    bench_case("all-q4  no counts", idx,
               term_all4, qlen, tp, np.full(batch, 4, np.int32), False)
    m0 = bench_case("q-mix   baseline (qn=None, counts)", idx,
                    term_mix, qlen, tp, None, True)
    m1 = bench_case("q-mix   qn-sorted + no counts", idx,
                    term_mix, qlen, tp, kmix.astype(np.int32), False)
    # correctness: same top-k
    s0, i0 = map(np.asarray, m0)
    s1, i1 = map(np.asarray, m1)
    fin = np.isfinite(s0)
    ok = np.allclose(s0, s1, rtol=1e-5, atol=1e-7, equal_nan=True) and (
        (i0 == i1) | ~fin
    ).all()
    print("q-mix variants agree:", ok)


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    run(100_000, 50_000, 64, 16_384, 256, "100k headline-ish")
    run(1_000_000, 200_000, 48, 32_768, 256, "1M scale")
