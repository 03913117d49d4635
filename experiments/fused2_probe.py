"""Prototype: one Pallas kernel = membership scoring (title+body) +
finalization + streaming exact top-k, accumulated in VMEM across doc-block
grid steps. The [B, D] score matrix never exists."""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def build_kernel(k_pad: int, q: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(tq_ref, qlen_ref, tft_ref, tfw_ref, bft_ref, bfw_ref,
               mt_ref, mb_ref, vals_ref, ids_ref, *, b_block: int):
        i = pl.program_id(0)
        db = tft_ref.shape[1]
        b_total = tq_ref.shape[0]

        @pl.when(i == 0)
        def _():
            vals_ref[:] = jnp.full(vals_ref.shape, -jnp.inf, jnp.float32)
            ids_ref[:] = jnp.zeros(ids_ref.shape, jnp.int32)

        tft = tft_ref[:]
        tfw = tfw_ref[:]
        bft = bft_ref[:]
        bfw = bfw_ref[:]
        mt = mt_ref[0, :]
        mb = mb_ref[0, :]

        def b_body(bi, _):
            row = bi * b_block
            tq = tq_ref[pl.ds(row, b_block), :]  # [Bb, Q]
            qmag = jnp.sqrt(qlen_ref[pl.ds(row, b_block)])  # [Bb]

            def section(ft, fw):
                mult = jnp.zeros((b_block,) + ft.shape, jnp.float32)
                for qi in range(q):
                    t = tq[:, qi][:, None, None]
                    mult = mult + (ft[None, :, :] == t).astype(jnp.float32)
                return jnp.sum(mult * fw[None, :, :], axis=1), jnp.sum(mult, axis=1)

            ts, tc = section(tft, tfw)
            bs, bc = section(bft, bfw)
            tn = ts / (mt[None, :] * qmag[:, None])
            bn = bs / (mb[None, :] * qmag[:, None])
            tn = jnp.where(jnp.isnan(tn), 0.0, tn)
            bn = jnp.where(jnp.isnan(bn), 0.0, bn)
            final = (0.38 * tn + 0.29 * bn) * 100.0
            final = jnp.where(tc + bc > 0, final, -jnp.inf)  # [Bb, Db]

            base_ids = jax.lax.broadcasted_iota(jnp.int32, (b_block, db), 1) + i * db
            cand_v = jnp.concatenate([vals_ref[pl.ds(row, b_block), :], final], axis=1)
            cand_i = jnp.concatenate([ids_ref[pl.ds(row, b_block), :], base_ids], axis=1)

            def select(r, carry):
                cv, ci, ov, oi = carry
                mx = jnp.max(cv, axis=1)  # [Bb]
                pos = jnp.argmax(cv, axis=1)
                col = jax.lax.broadcasted_iota(jnp.int32, cv.shape, 1)
                hit = col == pos[:, None]
                sel_id = jnp.sum(jnp.where(hit, ci, 0), axis=1)
                cv = jnp.where(hit, -jnp.inf, cv)
                rcol = jax.lax.broadcasted_iota(jnp.int32, ov.shape, 1)
                at_r = rcol == r
                ov = jnp.where(at_r, mx[:, None], ov)
                oi = jnp.where(at_r, sel_id[:, None], oi)
                return cv, ci, ov, oi

            ov = jnp.full((b_block, k_pad), -jnp.inf, jnp.float32)
            oi = jnp.zeros((b_block, k_pad), jnp.int32)
            _, _, ov, oi = jax.lax.fori_loop(0, k_pad, select, (cand_v, cand_i, ov, oi))
            vals_ref[pl.ds(row, b_block), :] = ov
            ids_ref[pl.ds(row, b_block), :] = oi
            return 0

        jax.lax.fori_loop(0, b_total // b_block, b_body, 0)

    return kernel


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, ".")
    from bench import synth_snapshot
    from spaghettisearch_tpu.ops.scoring import (
        exact_top_k, finalize_scores, pallas_available,
    )
    from spaghettisearch_tpu.retrieval.device_index import DeviceIndex

    n_docs, n_words, b, q, k = 100_000, 50_000, 256, 4, 10
    k_pad = 16
    snap = synth_snapshot(n_docs=n_docs, n_words=n_words)
    idx = DeviceIndex.from_snapshot(snap)
    d_pad = idx.n_docs_padded

    rng = np.random.default_rng(1)
    df = (snap.body.post_offsets[1:] - snap.body.post_offsets[:-1]).astype(np.float64)
    p = df / df.sum()
    tq = jnp.asarray(rng.choice(n_words, size=(b, q), p=p).astype(np.int32))
    qlen = jnp.full((b,), float(q), jnp.float32)
    tp = jnp.zeros((b, 1), jnp.float32)

    mag_t2 = idx.mag_title.reshape(1, -1)
    mag_b2 = idx.mag_body.reshape(1, -1)

    def make(doc_block, b_block):
        kernel = functools.partial(build_kernel(k_pad, q), b_block=b_block)
        tt = idx.title.fwd.ftT.shape[0]
        tb = idx.body.fwd.ftT.shape[0]
        grid = (d_pad // doc_block,)

        @jax.jit
        def run(tq, qlen):
            vals, ids = pl.pallas_call(
                kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((b, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((b,), lambda i: (0,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tt, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tt, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tb, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((tb, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((b, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((b, k_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((b, k_pad), jnp.float32),
                    jax.ShapeDtypeStruct((b, k_pad), jnp.int32),
                ],
            )(tq, qlen, idx.title.fwd.ftT, idx.title.fwd.fwT,
              idx.body.fwd.ftT, idx.body.fwd.fwT, mag_t2, mag_b2)
            return vals[:, :k], ids[:, :k]

        return run

    # reference result via the production path
    from spaghettisearch_tpu.ops.scoring import score_queries_forward

    @jax.jit
    def prod(tq, qlen, tp):
        return score_queries_forward(
            idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body, idx.pagerank,
            tq, qlen, tp, topk=k, use_pallas=True,
        )

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        for o in jax.tree.leaves(out):
            np.asarray(o)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:30s} {dt*1e3:8.2f} ms/batch -> {b/dt:8.0f} qps", flush=True)
        return out

    want = jax.tree.map(np.asarray, timeit("prod pallas+topk", prod, tq, qlen, tp))
    for doc_block in (512, 1024):
        try:
            got = jax.tree.map(np.asarray, timeit(f"fused db={doc_block}", make(doc_block, 8), tq, qlen))
            assert np.allclose(got[0], want[0], rtol=1e-5, atol=1e-6), (
                got[0][:2, :4], want[0][:2, :4])
            print(f"fused db={doc_block} matches", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"fused db={doc_block} FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
