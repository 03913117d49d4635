"""Round-3 probe: XLA primitive costs for a SPARSE phrase-chain lane at 1M.

Design under test (no kernel work yet — this prices the XLA half): the
keyword membership kernel additionally emits, for the first bp phrase
rows, per-phrase-term weight planes and a packed matched-slot plane
(riding the tiles it already streams). The phrase stage then leaves the
doc-dense domain entirely:

  mask [bp, D]  --sort-compress-->  cand ids [bp, E]
                --row-gather-->     positions [bp, E, P, C] from a
                                    slot-major posSlot [D*T, C] layout
                --chain (VPU)-->    per-candidate match + weight
                --scatter fold-->   [bp, D] additive planes

vs the monolithic mixed kernel's dense chain, which costs ~43 ms at 1M
because it forces posT streaming into the keyword program and blocks its
q=3/dynamic-T/doc_block levels (phrase_delta_probe.py finding).

This probe measures, queued (fetch-once — block_until_ready under-reports
through the relay, CLAUDE.md), on the real TPU at 1M shapes:
  1. sort-compress: key=(1-mask)<<20 | doc, jnp.sort, slice E
  2. row-gather: [bp*E*P] rows of 32 B from a 3.84 GB slot-major array
  3. chain + scatter fold back into [bp, D]
  4. all of it fused in one jit (the integration shape)

Run: python experiments/sparse_chain_probe.py [D] [density]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

BP = 16  # phrase rows per batch (engine sorts them first)
E = 8192  # candidate cap
P = 3  # chained phrase terms (anchor + 2)
C = 8  # positions per (doc, term)
T = 120  # body term slots


def first_leaf(out):
    leaf = jax.tree.leaves(out)[0]
    return np.asarray(leaf.ravel()[:4])


def t_queued(fn, *args, reps=10):
    out = fn(*args)
    first_leaf(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    first_leaf(outs[-1])
    first_leaf(outs[0])
    return (time.perf_counter() - t0) / reps * 1e3


@functools.partial(jax.jit, static_argnames=("e",))
def compress(mask, e):
    bp, d = mask.shape
    doc = jax.lax.broadcasted_iota(jnp.int32, (bp, d), 1)
    key = jnp.where(mask, doc, doc + (1 << 20))
    top = jax.lax.sort(key, dimension=1)[:, :e]
    cand = top & ((1 << 20) - 1)
    valid = top < (1 << 20)
    return cand, valid, mask.sum(axis=1)


@jax.jit
def row_gather(pos_slot, slot_idx):
    # pos_slot [(D*T)//16, 128]: 16 slot-groups of C=8 positions per
    # 128-lane row (a [D*T, 8] layout tiles to T(8,128) and wastes 16x —
    # measured: 61.4 GB allocation for the 3.84 GB of payload).
    # slot_idx [bp, E, P] = d*T + t -> positions [bp, E, P, C]
    rows = slot_idx // 16
    sub = (slot_idx % 16) * C  # start column of the group
    wide = pos_slot[rows]  # [bp, E, P, 128]
    cols = sub[..., None] + jnp.arange(C, dtype=jnp.int32)
    return jnp.take_along_axis(wide, cols, axis=-1)


@functools.partial(jax.jit, static_argnames=("d",))
def chain_fold(pos, cand, valid, w, d):
    # pos [bp, E, P, C] f32; chain: exists c0: for all j>0 exists c:
    # pos[j, c] == pos[0, c0] + j
    anchor = pos[:, :, 0, :]  # [bp, E, C]
    ok_c0 = jnp.ones(anchor.shape, jnp.bool_)
    for j in range(1, P):
        pj = pos[:, :, j, :]  # [bp, E, C]
        m = (pj[:, :, None, :] == anchor[:, :, :, None] + j).any(-1)
        ok_c0 &= m
    ok = ok_c0.any(-1) & valid  # [bp, E]
    add = jnp.where(ok, w, 0.0)
    idx = jnp.where(valid, cand, d)
    acc = jnp.zeros((BP, d + 1), jnp.float32)
    acc = acc.at[jnp.arange(BP)[:, None], idx].add(add, mode="drop")
    return acc[:, :d]


def main():
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    density = float(sys.argv[2]) if len(sys.argv) > 2 else 0.01
    rng = np.random.default_rng(0)
    n_rows = d * T
    print(f"D={d} density={density} BP={BP} E={E} "
          f"posSlot {n_rows * C * 4 / 1e9:.2f} GB", flush=True)

    mask = jnp.asarray(rng.random((BP, d)) < density)

    @jax.jit
    def gen_pos_slot():  # on-device: a 3.84 GB host upload takes minutes
        r = jnp.arange(n_rows // 16, dtype=jnp.int32)[:, None]
        c = jnp.arange(128, dtype=jnp.int32)[None, :]
        return ((r * 1103515245 + c * 40503) % 4000).astype(jnp.float32)

    pos_slot = gen_pos_slot()
    first_leaf(pos_slot)
    slot_idx = jnp.asarray(
        rng.integers(0, n_rows, (BP, E, P)).astype(np.int32))
    w = jnp.asarray(rng.random((BP, E)).astype(np.float32))

    ms = t_queued(compress, mask, E)
    print(f"sort-compress [16,{d}] -> E={E}: {ms:.2f} ms", flush=True)

    cand, valid, cnt = compress(mask, E)
    print(f"cand counts: {np.asarray(cnt)[:4]} (cap {E})", flush=True)

    ms = t_queued(row_gather, pos_slot, slot_idx)
    print(f"row-gather {BP * E * P} rows of 512 B from "
          f"{pos_slot.nbytes / 1e9:.2f} GB: {ms:.2f} ms", flush=True)

    pos = row_gather(pos_slot, slot_idx)
    ms = t_queued(chain_fold, pos, cand, valid, w, d)
    print(f"chain+fold -> [16,{d}]: {ms:.2f} ms", flush=True)

    @functools.partial(jax.jit, static_argnames=("e",))
    def fused(mask, pos_slot, w, e):
        cand, valid, cnt = compress(mask, e)
        # slot indices would come from the kernel's packed-slot plane;
        # the index math is free — synthesize them from cand
        si = (cand[:, :, None] * T + jnp.arange(P)[None, None, :]) % n_rows
        pos = row_gather(pos_slot, si)
        return chain_fold(pos, cand, valid, w, mask.shape[1]), cnt

    ms = t_queued(fused, mask, pos_slot, w, E)
    print(f"fused compress+gather+chain+fold: {ms:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
