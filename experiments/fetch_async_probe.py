"""Does copy_to_host_async() through the axon relay pre-stage the d2h
transfer, making the later np.asarray cheap?

Serve-100k context: the micro-batcher's fetch stage measures ~27 ms/batch
(one relay RTT + ~51 KB payload) and is the pipeline's longest stage at
4.7k qps. If the dispatch stage can initiate the transfer asynchronously,
the fetch stage collapses and the wall moves to native assembly (~18 ms).

Measures, for a ~50 ms device program producing a [128, 100] f32 packed
result (the serving shape):
  A. dispatch -> block_until_ready -> np.asarray        (compute + full RTT)
  B. dispatch -> copy_to_host_async -> block -> asarray (RTT overlapped?)
  C. pipelined: N batches, fetch k while k+1 computes   (today's 3-stage)
  D. pipelined + copy_to_host_async at dispatch         (proposed)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev}")

    # a compute program heavy enough to emulate the mixed/keyword rank
    # (~tens of ms) with a small packed output like _RankHandle's
    d = 4096
    a = jnp.ones((d, d), jnp.float32)

    @jax.jit
    def prog(x, seed):
        y = x + seed
        for _ in range(24):
            y = jnp.tanh(y @ a * 1e-4)
        return y[:128, :100].reshape(-1)  # 12800 f32 = 51 KB packed

    # warm
    np.asarray(prog(a, 0.0))

    def timed(label, fn, reps=5):
        vals = []
        for r in range(reps):
            vals.append(fn(r))
        print(f"{label}: " + " ".join(f"{v*1e3:.1f}" for v in vals) + " ms")

    # A: block for compute, then time the fetch alone
    def run_a(r):
        out = prog(a, float(r))
        out.block_until_ready()
        t0 = time.perf_counter()
        np.asarray(out)
        return time.perf_counter() - t0

    # B: copy_to_host_async at dispatch, block for compute + a settle,
    # then time the fetch alone
    def run_b(r):
        out = prog(a, float(r + 100))
        out.copy_to_host_async()
        out.block_until_ready()
        time.sleep(0.05)  # let the async transfer drain
        t0 = time.perf_counter()
        np.asarray(out)
        return time.perf_counter() - t0

    timed("A fetch after block (no async copy)", run_a)
    timed("B fetch after block (+async copy, 50ms settle)", run_b)

    # C/D: the real pattern — while batch k+1 computes, fetch batch k.
    def pipeline(use_async, n=12):
        outs = []
        t0 = time.perf_counter()
        fetched = []
        for k in range(n):
            out = prog(a, float(k + 200 + (1000 if use_async else 0)))
            if use_async:
                out.copy_to_host_async()
            outs.append(out)
            if k >= 1:
                fetched.append(np.asarray(outs[k - 1]))
        fetched.append(np.asarray(outs[-1]))
        dt = time.perf_counter() - t0
        return dt / n

    for label, ua in [("C pipelined fetch (today)", False),
                      ("D pipelined + copy_to_host_async", True)]:
        v = [pipeline(ua) for _ in range(3)]
        print(f"{label}: " + " ".join(f"{x*1e3:.1f}" for x in v) + " ms/batch")


if __name__ == "__main__":
    main()
