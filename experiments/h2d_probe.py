"""Round-3 probe: per-batch h2d upload count vs pipelined dispatch cost.

The engine uploads ~10 small host arrays per mixed batch (term_ids, qlen,
topic_probs, ph_ids, ph_valid, qn, pn, qnb, hot_sids -> each its own
h2d RPC through the axon relay). probe1m measured dispatch-only rising
2.7 -> 4.7 ms when two arrays were added, suggesting ~1 ms per upload.
This probe isolates the effect: queue N dispatches of a program whose
inputs are (a) 10 small fresh numpy arrays, (b) 1 packed fresh array of
the same total bytes, (c) pre-uploaded device arrays (floor), and
measures pipelined per-call cost for an instant program and for a ~15 ms
dummy compute program (overlap regime).

Run: python experiments/h2d_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

B, Q, C, P = 128, 4, 8, 16


def fresh_small(i):
    rng = np.random.default_rng(i)
    return (
        rng.integers(0, 30000, (B, Q)).astype(np.int32),       # term_ids
        rng.random(B, dtype=np.float32),                        # qlen
        rng.random((B, C), dtype=np.float32),                   # topic_probs
        rng.integers(0, 30000, (B, P)).astype(np.int32),        # ph_ids
        rng.random((B, P), dtype=np.float32),                   # ph_valid
        rng.integers(1, 5, B).astype(np.int32),                 # qn
        rng.integers(0, 3, B).astype(np.int32),                 # pn
        rng.integers(1, 5, B).astype(np.int32),                 # qnb
        rng.integers(-1, 512, (B, Q)).astype(np.int32),         # hot_sids
    )


def pack(arrs):
    return np.concatenate([a.view(np.int32).ravel() for a in arrs])


SIZES = [a.size for a in fresh_small(0)]
OFFS = np.cumsum([0] + SIZES)
SHAPES = [a.shape for a in fresh_small(0)]
KINDS = [a.dtype == np.float32 for a in fresh_small(0)]


def unpack(blob):
    out = []
    for i in range(len(SIZES)):
        seg = jax.lax.dynamic_slice(blob, (int(OFFS[i]),), (int(SIZES[i]),))
        seg = seg.reshape(SHAPES[i])
        if KINDS[i]:
            seg = jax.lax.bitcast_convert_type(seg, jnp.float32)
        out.append(seg)
    return out


@jax.jit
def f_multi(*arrs):
    return sum(jnp.sum(a.astype(jnp.float32)) for a in arrs)


@jax.jit
def f_packed(blob):
    return sum(jnp.sum(a.astype(jnp.float32)) for a in unpack(blob))


# ~10-20 ms dummy compute riding a resident matrix (relay-side overlap test)
BIG = None


def make_heavy():
    global BIG
    BIG = jnp.asarray(np.random.default_rng(0).random((4096, 4096), np.float32))

    @jax.jit
    def heavy_multi(*arrs):
        x = BIG
        for _ in range(12):
            x = x @ BIG * 1e-3
        return jnp.sum(x) + sum(jnp.sum(a.astype(jnp.float32)) for a in arrs)

    @jax.jit
    def heavy_packed(blob):
        x = BIG
        for _ in range(12):
            x = x @ BIG * 1e-3
        return jnp.sum(x) + sum(
            jnp.sum(a.astype(jnp.float32)) for a in unpack(blob)
        )

    return heavy_multi, heavy_packed


def run(label, fn, inputs, reps=30):
    # warm
    fn(*inputs[0]).block_until_ready()
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        hs = [fn(*inp) for inp in inputs[:reps]]
        hs[-1].block_until_ready()
        best = min(best, (time.perf_counter() - t0) / reps * 1e3)
    print(f"  {label:34s} {best:7.2f} ms/call", flush=True)
    return best


def main():
    print(f"backend: {jax.devices()[0]}", flush=True)
    smalls = [fresh_small(i) for i in range(30)]
    packs = [(pack(s),) for s in smalls]
    dev = [tuple(jnp.asarray(a) for a in smalls[0])]
    dev_packed = [(jnp.asarray(packs[0][0]),)]

    print("instant program (pure dispatch+upload):", flush=True)
    run("10 small numpy arrays", f_multi, smalls)
    run("1 packed numpy array", f_packed, packs)
    run("pre-uploaded device arrays", f_multi, dev * 30)
    run("pre-uploaded packed", f_packed, dev_packed * 30)

    hm, hp = make_heavy()
    print("~15 ms compute program (overlap regime):", flush=True)
    run("10 small numpy arrays", hm, smalls)
    run("1 packed numpy array", hp, packs)
    run("pre-uploaded device arrays", hm, dev * 30)


if __name__ == "__main__":
    main()
