"""Raw TPU primitive costs: gather (rows/scalars), sort, one-hot matmul.

Decides the sparse-scoring design: every candidate-driven formulation needs
one of these to be fast.

Measurement through the axon relay: one dispatch+fetch costs ~26 ms, so each
op is chained `reps` times inside a single jit (data-dependent inputs so XLA
can't CSE/DCE) and the relay overhead is measured separately and subtracted.
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp


REPS = 32


def timed(g, *args):
    float(g(*args))  # compile
    t0 = time.perf_counter()
    float(g(*args))
    return time.perf_counter() - t0


def overhead():
    @jax.jit
    def g(x):
        return x.sum()

    return timed(g, jnp.zeros(8))


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    oh_t = overhead()
    print(f"relay round-trip overhead: {oh_t*1e3:.1f} ms")

    D, T = 1_000_000, 64
    table = jnp.asarray(rng.normal(size=(D, T)).astype(np.float32))

    def report(name, dt, n_items, bytes_per=None):
        per = (dt - oh_t) / REPS
        line = f"{name:34s}: {per*1e3:9.3f} ms/op ({per/n_items*1e9:7.2f} ns/item"
        if bytes_per:
            line += f", {n_items*bytes_per/per/1e9:7.1f} GB/s"
        print(line + ")")

    for n in (65_536, 1_048_576):
        idx0 = jnp.asarray(rng.integers(0, D, n).astype(np.int32))

        @jax.jit
        def grow(idx0, table):
            def body(i, acc):
                idx = (idx0 + i * 12345) % D
                return acc + table[idx].sum()

            return jax.lax.fori_loop(0, REPS, body, 0.0)

        report(f"row gather [{n} x {T}]", timed(grow, idx0, table), n, T * 4)

        vec = table[:, 0]

        @jax.jit
        def gsc(idx0, vec):
            def body(i, acc):
                idx = (idx0 + i * 12345) % D
                return acc + vec[idx].sum()

            return jax.lax.fori_loop(0, REPS, body, 0.0)

        report(f"scalar gather [{n}]", timed(gsc, idx0, vec), n, 4)

    for n in (16_384, 131_072):
        keys0 = jnp.asarray(rng.integers(0, 1 << 30, (256, n)).astype(np.int32))
        w = jnp.arange(n, dtype=jnp.float32)[None, :] / n

        @jax.jit
        def gsort(keys0, w):
            def body(i, acc):
                k = (keys0 * (2 * i + 1) + i) & 0x7FFFFFFF
                s = jnp.sort(k, axis=1)
                return acc + (s.astype(jnp.float32) * w).sum()

            return jax.lax.fori_loop(0, REPS, body, 0.0)

        report(f"sort i32 [256 x {n}]", timed(gsort, keys0, w), 256 * n)

    # one-hot matmul gather from a small table (U terms)
    U = 1024
    small = jnp.asarray(rng.normal(size=(U, 128)).astype(np.float32))
    uidx0 = jnp.asarray(rng.integers(0, U, (256, 4096)).astype(np.int32))

    @jax.jit
    def gonehot(uidx0, small):
        def body(i, acc):
            ui = (uidx0 + i) % U
            oh = jax.nn.one_hot(ui, U, dtype=jnp.bfloat16)
            out = jnp.einsum(
                "bnu,uf->bnf", oh, small.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return acc + out.sum()

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    report(f"onehot-mm gather [{256*4096} of {U}]",
           timed(gonehot, uidx0, small), 256 * 4096)

    # dense membership compare reference
    ft = jnp.asarray(rng.integers(0, 200_000, (65_536, T)).astype(np.int32))
    tq0 = jnp.asarray(rng.integers(0, 200_000, (256, 4)).astype(np.int32))

    @jax.jit
    def gmem(ft, tq0):
        def body(i, acc):
            tq = tq0 + i
            eq = ft[None, :, :, None] == tq[:, None, None, :]
            return acc + eq.sum(-1).astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, REPS, body, 0.0)

    report(f"membership 256x65536x{T}x4", timed(gmem, ft, tq0), 256 * 65_536 * T * 4)


if __name__ == "__main__":
    main()
