"""Time the Pallas membership kernel vs the XLA forward formulation on TPU."""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import synth_snapshot
    from spaghettisearch_tpu.ops.kernels.membership import pallas_forward_scores
    from spaghettisearch_tpu.ops.scoring import (
        exact_top_k,
        finalize_scores,
        forward_section_scores,
    )

    n_docs, n_words, b, q, k = 100_000, 50_000, 256, 4, 10
    snap = synth_snapshot(n_docs=n_docs, n_words=n_words)
    tft, tfw = snap.title.forward(n_docs)
    bft, bfw = snap.body.forward(n_docs)

    d_pad = -(-n_docs // 2048) * 2048

    def padT(a, fill):
        out = np.full((d_pad, a.shape[1]), fill, a.dtype)
        out[: a.shape[0]] = a
        return jnp.asarray(np.ascontiguousarray(out.T))

    tftT, tfwT = padT(tft, -1), padT(tfw, 0.0)
    bftT, bfwT = padT(bft, -1), padT(bfw, 0.0)
    mag_t = jnp.asarray(np.pad(snap.mag_title, (0, d_pad - n_docs)))
    mag_b = jnp.asarray(np.pad(snap.mag_body, (0, d_pad - n_docs)))
    pr = jnp.zeros((d_pad, 1), jnp.float32)

    rng = np.random.default_rng(1)
    df = (snap.body.post_offsets[1:] - snap.body.post_offsets[:-1]).astype(np.float64)
    p = df / df.sum()
    tq = jnp.asarray(rng.choice(n_words, size=(b, q), p=p).astype(np.int32))
    qlen = jnp.full((b,), float(q), jnp.float32)
    tp = jnp.zeros((b, 1), jnp.float32)

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        for o in jax.tree.leaves(out):
            np.asarray(o)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:34s} {dt*1e3:8.2f} ms/batch -> {b/dt:8.0f} qps", flush=True)
        return out

    def make_pallas_full(doc_block, b_block):
        @jax.jit
        def run(tq, qlen, tp):
            ts, tc = pallas_forward_scores(
                tftT, tfwT, tq, doc_block=doc_block, b_block=b_block
            )
            bs, bc = pallas_forward_scores(
                bftT, bfwT, tq, doc_block=doc_block, b_block=b_block
            )
            final = finalize_scores(ts, tc, bs, bc, mag_t, mag_b, pr, qlen, tp)
            return exact_top_k(final, k)

        return run

    @jax.jit
    def xla_full(tq, qlen, tp):
        ft = jnp.asarray(tftT).T
        # use the pre-padded arrays so both paths see identical inputs
        ts, tc = forward_section_scores(tftT.T, tfwT.T, tq)
        bs, bc = forward_section_scores(bftT.T, bfwT.T, tq)
        final = finalize_scores(ts, tc, bs, bc, mag_t, mag_b, pr, qlen, tp)
        return exact_top_k(final, k)

    want = jax.tree.map(np.asarray, timeit("xla forward full", xla_full, tq, qlen, tp))
    for doc_block, b_block in ((1024, 8), (512, 8), (1024, 4)):
        got = jax.tree.map(
            np.asarray,
            timeit(
                f"pallas db={doc_block} bb={b_block}",
                make_pallas_full(doc_block, b_block),
                tq, qlen, tp,
            ),
        )
        assert np.allclose(got[0], want[0], rtol=1e-5, atol=1e-6), "score mismatch"
    print("pallas matches xla", flush=True)


if __name__ == "__main__":
    main()
