"""Measure achievable HBM bandwidth + production forward-scorer config sweep."""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import synth_snapshot
    from spaghettisearch_tpu.ops.scoring import score_queries_forward
    from spaghettisearch_tpu.retrieval.device_index import DeviceIndex

    def timeit(name, fn, *args, reps=5, bytes_moved=None):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        for o in jax.tree.leaves(out):
            np.asarray(o)
        dt = (time.perf_counter() - t0) / reps
        extra = f"  {bytes_moved/dt/1e9:7.1f} GB/s" if bytes_moved else ""
        print(f"{name:34s} {dt*1e3:9.2f} ms{extra}", flush=True)
        return dt

    # --- raw bandwidth: big reduce and big copy ---
    big = jnp.ones((16 * 1024 * 1024,), jnp.float32)  # 64MB

    @jax.jit
    def reduce_big(x):
        return x.sum()

    @jax.jit
    def scale_big(x):
        return x * 1.0000001

    timeit("reduce 64MB (read)", reduce_big, big, bytes_moved=64e6)
    timeit("scale 64MB (read+write)", scale_big, big, bytes_moved=128e6)

    # --- MXU flops probe ---
    a = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def mm(a):
        return jnp.dot(a, a, preferred_element_type=jnp.float32)

    dt = timeit("matmul 4096^3 bf16", mm, a)
    print(f"  -> {2*4096**3/dt/1e12:.1f} TFLOP/s", flush=True)

    # --- production forward scorer sweep ---
    n_docs, n_words = 100_000, 50_000
    snap = synth_snapshot(n_docs=n_docs, n_words=n_words)
    idx = DeviceIndex.from_snapshot(snap)
    rng = np.random.default_rng(1)
    df = (snap.body.post_offsets[1:] - snap.body.post_offsets[:-1]).astype(np.float64)
    p = df / df.sum()

    for b in (256, 1024):
        tq = jnp.asarray(rng.choice(n_words, size=(b, 4), p=p).astype(np.int32))
        qlen = jnp.full((b,), 4.0, jnp.float32)
        tp = jnp.zeros((b, 1), jnp.float32)
        for m in (4, 8, 16):
            dt = timeit(
                f"score_fwd B={b} m={m}",
                lambda tq, qlen, tp, m=m: score_queries_forward(
                    idx.title.ft, idx.title.fw, idx.body.ft, idx.body.fw,
                    idx.mag_title, idx.mag_body, idx.pagerank,
                    tq, qlen, tp, topk=10, n_blocks=m,
                ),
                tq, qlen, tp,
            )
            print(f"  -> {b/dt:8.0f} qps", flush=True)


if __name__ == "__main__":
    main()
