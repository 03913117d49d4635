"""Probe the fused forward scorer: doc-axis-last compare layout + per-block
top-k inside the block map (dense [B, D] scores never hit HBM)."""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import synth_snapshot

    n_docs, n_words = 100_000, 50_000
    b, q, k, t_doc = 256, 4, 10, 64

    snap = synth_snapshot(n_docs=n_docs, n_words=n_words, body_terms_per_doc=t_doc)
    ft_np, fw_np = snap.body.forward(n_docs)
    tft_np, tfw_np = snap.title.forward(n_docs)
    print("T body:", ft_np.shape, "T title:", tft_np.shape, flush=True)

    rng = np.random.default_rng(1)
    df = (snap.body.post_offsets[1:] - snap.body.post_offsets[:-1]).astype(np.float64)
    p = df / df.sum()
    tq = jnp.asarray(rng.choice(n_words, size=(b, q), p=p).astype(np.int32))
    qlen = jnp.full((b,), float(q), jnp.float32)
    mag_t = jnp.asarray(snap.mag_title)
    mag_b = jnp.asarray(snap.mag_body)

    def blocks_of(arr, m, pad_val):
        d = arr.shape[0]
        db = -(-d // m)
        padded = np.full((m * db,) + arr.shape[1:], pad_val, arr.dtype)
        padded[:d] = arr
        return jnp.asarray(padded.reshape((m, db) + arr.shape[1:]))

    def timeit(name, fn, *args, reps=5):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        for o in jax.tree.leaves(out):
            np.asarray(o)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:36s} {dt*1e3:8.2f} ms/batch -> {b/dt:8.0f} qps", flush=True)
        return out

    def make_fused(m, d_last=True):
        db = -(-n_docs // m)
        ftb = blocks_of(ft_np, m, -1)        # [M, Db, T]
        fwb = blocks_of(fw_np, m, 0.0)
        tftb = blocks_of(tft_np, m, -1)
        tfwb = blocks_of(tfw_np, m, 0.0)
        mtb = blocks_of(np.asarray(mag_t), m, 0.0)  # [M, Db]
        mbb = blocks_of(np.asarray(mag_b), m, 0.0)

        def section(ft_blk, fw_blk):
            if d_last:
                ftT = ft_blk.T  # [T, Db]
                eq = ftT[None, :, None, :] == tq[:, None, :, None]  # [B,T,Q,Db]
                mult = eq.sum(2).astype(jnp.float32)  # [B, T, Db]
                score = jnp.einsum("btd,td->bd", mult, fw_blk.T)
                count = mult.sum(1)
            else:
                eq = ft_blk[None, :, :, None] == tq[:, None, None, :]
                mult = eq.sum(-1).astype(jnp.float32)
                score = jnp.einsum("bdt,dt->bd", mult, fw_blk)
                count = mult.sum(-1)
            return score, count

        @jax.jit
        def fused(tq_):
            def block_fn(args):
                ftk, fwk, tftk, tfwk, mtk, mbk = args
                bs_, bc = section(ftk, fwk)
                ts_, tc = section(tftk, tfwk)
                qmag = jnp.sqrt(qlen)[:, None]
                tn = ts_ / (mtk[None, :] * qmag)
                bn = bs_ / (mbk[None, :] * qmag)
                tn = jnp.where(jnp.isnan(tn), 0.0, tn)
                bn = jnp.where(jnp.isnan(bn), 0.0, bn)
                final = (0.38 * tn + 0.29 * bn) * 100.0
                final = jnp.where(tc + bc > 0, final, -jnp.inf)
                vals, ids = jax.lax.top_k(final, k)
                return vals, ids

            vals, ids = jax.lax.map(block_fn, (ftb, fwb, tftb, tfwb, mtb, mbb))
            base = (jnp.arange(m, dtype=jnp.int32) * db)[:, None, None]
            ids = ids + base
            cand_v = jnp.moveaxis(vals, 0, 1).reshape(b, -1)
            cand_i = jnp.moveaxis(ids, 0, 1).reshape(b, -1)
            top_v, pos = jax.lax.top_k(cand_v, k)
            return top_v, jnp.take_along_axis(cand_i, pos, axis=1)

        return fused

    ref = None
    for m in (8, 16, 32):
        for d_last in (True, False):
            out = timeit(f"fused m={m} d_last={d_last}", make_fused(m, d_last), tq)
            got = jax.tree.map(np.asarray, out)
            if ref is None:
                ref = got
            else:
                assert np.allclose(ref[0], got[0], rtol=1e-5, atol=1e-6), "score mismatch"
    print("all variants agree", flush=True)


if __name__ == "__main__":
    main()
