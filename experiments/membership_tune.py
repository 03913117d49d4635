"""Tune the Pallas forward-membership kernel: block sizes, compare dtype,
accumulation structure. Times the kernel alone (body section shapes of the
100k-doc headline bench) so variants compare apples-to-apples."""

from __future__ import annotations

import functools
import sys
import time

import numpy as np


def build_variant(name: str, b_block: int, q: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern_mult(tq_ref, ft_ref, fw_ref, score_ref, count_ref):
        # production kernel: mult accumulation then two reductions
        ft = ft_ref[:]
        fw = fw_ref[:]

        def b_body(bi, _):
            row = bi * b_block
            tq = tq_ref[pl.ds(row, b_block), :]
            mult = jnp.zeros((b_block,) + ft.shape, jnp.float32)
            for qi in range(q):
                t = tq[:, qi][:, None, None]
                mult = mult + (ft[None, :, :] == t).astype(jnp.float32)
            score_ref[pl.ds(row, b_block), :] = jnp.sum(mult * fw[None, :, :], axis=1)
            count_ref[pl.ds(row, b_block), :] = jnp.sum(mult, axis=1)
            return 0

        jax.lax.fori_loop(0, tq_ref.shape[0] // b_block, b_body, 0)

    def kern_f32(tq_ref, ft_ref, fw_ref, score_ref, count_ref):
        # compare in f32 (ids < 2^24 are exact); everything else identical
        ft = ft_ref[:].astype(jnp.float32)
        fw = fw_ref[:]

        def b_body(bi, _):
            row = bi * b_block
            tq = tq_ref[pl.ds(row, b_block), :].astype(jnp.float32)
            mult = jnp.zeros((b_block,) + ft.shape, jnp.float32)
            for qi in range(q):
                t = tq[:, qi][:, None, None]
                mult = mult + (ft[None, :, :] == t).astype(jnp.float32)
            score_ref[pl.ds(row, b_block), :] = jnp.sum(mult * fw[None, :, :], axis=1)
            count_ref[pl.ds(row, b_block), :] = jnp.sum(mult, axis=1)
            return 0

        jax.lax.fori_loop(0, tq_ref.shape[0] // b_block, b_body, 0)

    def kern_tsum(tq_ref, ft_ref, fw_ref, score_ref, count_ref):
        # reduce over T inside the q loop: no [Bb, T, Db] temporary
        ft = ft_ref[:]
        fw = fw_ref[:]

        def b_body(bi, _):
            row = bi * b_block
            tq = tq_ref[pl.ds(row, b_block), :]
            s = jnp.zeros((b_block, ft.shape[1]), jnp.float32)
            c = jnp.zeros((b_block, ft.shape[1]), jnp.float32)
            for qi in range(q):
                t = tq[:, qi][:, None, None]
                eq = (ft[None, :, :] == t).astype(jnp.float32)
                s = s + jnp.sum(eq * fw[None, :, :], axis=1)
                c = c + jnp.sum(eq, axis=1)
            score_ref[pl.ds(row, b_block), :] = s
            count_ref[pl.ds(row, b_block), :] = c
            return 0

        jax.lax.fori_loop(0, tq_ref.shape[0] // b_block, b_body, 0)

    return {"mult": kern_mult, "f32": kern_f32, "tsum": kern_tsum}[name]


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sys.path.insert(0, ".")
    from spaghettisearch_tpu.ops.kernels.membership import pallas_forward_scores

    rng = np.random.default_rng(0)
    t, d_total = 64, 100_352  # body shapes of the headline bench
    b, q = 256, 4
    n_words = 50_000
    ft = rng.integers(0, n_words, (t, d_total)).astype(np.int32)
    fw = rng.random((t, d_total)).astype(np.float32)
    tq = rng.integers(0, n_words, (b, q)).astype(np.int32)
    ftT = jnp.asarray(ft)
    fwT = jnp.asarray(fw)
    tqd = jnp.asarray(tq)

    def timeit(name, fn, reps=10):
        out = fn()
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0][:1, :1])
        dt = (time.perf_counter() - t0) / reps
        elems = b * t * d_total
        print(f"{name:34s} {dt*1e3:8.2f} ms  ({elems/dt/1e12:5.2f} Telem/s)",
              flush=True)
        return out

    want = timeit(
        "prod (mult, db=512, bb=8)",
        lambda: pallas_forward_scores(ftT, fwT, tqd, doc_block=512, b_block=8),
    )
    want = jax.tree.map(np.asarray, want)

    for name in ("mult", "f32", "tsum"):
        for doc_block in (512, 1024, 2048):
            for b_block in (8, 16, 32):
                kern = build_variant(name, b_block, q)
                try:
                    f = pl.pallas_call(
                        kern,
                        grid=(d_total // doc_block,),
                        in_specs=[
                            pl.BlockSpec((b, q), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec((t, doc_block), lambda i: (0, i),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec((t, doc_block), lambda i: (0, i),
                                         memory_space=pltpu.VMEM),
                        ],
                        out_specs=[
                            pl.BlockSpec((b, doc_block), lambda i: (0, i),
                                         memory_space=pltpu.VMEM),
                            pl.BlockSpec((b, doc_block), lambda i: (0, i),
                                         memory_space=pltpu.VMEM),
                        ],
                        out_shape=[
                            jax.ShapeDtypeStruct((b, d_total), jnp.float32),
                            jax.ShapeDtypeStruct((b, d_total), jnp.float32),
                        ],
                    )
                    fj = jax.jit(lambda a, x, y: f(a, x, y))
                    got = timeit(
                        f"{name} db={doc_block} bb={b_block}",
                        lambda: fj(tqd, ftT, fwT),
                    )
                    got = jax.tree.map(np.asarray, got)
                    ok = np.allclose(got[0], want[0], rtol=1e-5) and np.allclose(
                        got[1], want[1]
                    )
                    if not ok:
                        print(f"  ^ MISMATCH", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{name} db={doc_block} bb={b_block} FAILED: "
                          f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
