"""Round-3 probe: per-doc-block dynamic T bound for the membership sweep.

The keyword kernels sweep the full static T_pad (= max distinct terms over
all docs, 120 on the 1M bench corpus) for EVERY doc block, but the mean
per-doc distinct count is ~77 (uniform-ish 40-120): ~35% of the dominant
body-sweep compares hit pad rows. With docs SORTED by distinct-term count
(block-homogeneous) and the body T loop turned into a dynamic-trip
fori over TC-row chunks bounded by the block's real max (same pattern as
the mixed kernel's pnb-bounded phrase loops), the swept fraction drops to
~0.68-0.71 of static (host sim at TC=8/16).

Measures on the real TPU, synthetic 1M-doc shapes (Tt=8, Tb=120->pad):
  - baseline: pallas_forward_scores_2sec (static T, current production)
  - tbound:   variant kernel, docs sorted desc + block-balanced for
              megacore (contiguous grid halves must carry equal work)
  - tbound-unbalanced: sorted only (shows the megacore imbalance tax)
Exactness: max rel diff vs baseline on the same (sorted) layout.

Run: python experiments/tbound_probe.py [n_docs]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spaghettisearch_tpu.ops.kernels.membership import (
    _dispatch_q,
    _qn_blocks,
    _section_scores_unrolled,
)

DOC_BLOCK = 512
B_BLOCK = 8


def _kernel2_tb(
    qn_ref, qnb_ref, tmaxb_ref, tq_ref, btq_ref, tft_ref, tfw_ref,
    bft_ref, bfw_ref, *out_refs, b_block: int, q: int, tc: int,
    emit_counts: bool,
):
    """2-section kernel with the BODY sweep as a dynamic-trip fori over
    tc-row term chunks, bounded by this doc block's real max distinct
    count (SMEM, indexed by program id). Title stays static (Tt tiny)."""
    tft = tft_ref[:]
    tfw = tfw_ref[:]
    db = bft_ref.shape[1]
    gi = pl.program_id(0)
    trips = (tmaxb_ref[gi] + (tc - 1)) // tc

    def b_body(bi, _):
        row = bi * b_block
        tq = tq_ref[pl.ds(row, b_block), :]
        btq = btq_ref[pl.ds(row, b_block), :]

        def emit_t(q_eff):
            s, c = _section_scores_unrolled(tft, tfw, tq, q_eff, emit_counts)
            out_refs[0][pl.ds(row, b_block), :] = s
            if emit_counts:
                out_refs[1][pl.ds(row, b_block), :] = c

        def emit_b(q_eff):
            def t_body(ti, carry):
                s, c = carry
                ftc = bft_ref[pl.ds(ti * tc, tc), :]
                fwc = bfw_ref[pl.ds(ti * tc, tc), :]
                mult = jnp.zeros((b_block, tc, db), jnp.float32)
                for qi in range(q_eff):
                    t = btq[:, qi][:, None, None]
                    mult = mult + (ftc[None, :, :] == t).astype(jnp.float32)
                s = s + jnp.sum(mult * fwc[None, :, :], axis=1)
                if emit_counts:
                    c = c + jnp.sum(mult, axis=1)
                return s, c

            zeros = jnp.zeros((b_block, db), jnp.float32)
            s, c = jax.lax.fori_loop(0, trips, t_body, (zeros, zeros))
            if emit_counts:
                out_refs[2][pl.ds(row, b_block), :] = s
                out_refs[3][pl.ds(row, b_block), :] = c
            else:
                out_refs[1][pl.ds(row, b_block), :] = s

        _dispatch_q(qn_ref[bi], q, emit_t)
        _dispatch_q(qnb_ref[bi], q, emit_b)
        return 0

    jax.lax.fori_loop(0, tq_ref.shape[0] // b_block, b_body, 0)


@functools.partial(
    jax.jit, static_argnames=("doc_block", "b_block", "tc", "emit_counts")
)
def forward_scores_2sec_tb(
    title_ftT, title_fwT, body_ftT, body_fwT, tmax_blocks, term_ids, qn,
    *, doc_block=DOC_BLOCK, b_block=B_BLOCK, tc=16, emit_counts=True,
):
    tt, d = title_ftT.shape
    tb = body_ftT.shape[0]
    b, q = term_ids.shape
    kernel = functools.partial(
        _kernel2_tb, b_block=b_block, q=q, tc=tc, emit_counts=emit_counts
    )
    n_out = 4 if emit_counts else 2
    out = pl.pallas_call(
        kernel,
        grid=(d // doc_block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((b, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM)
        ] * n_out,
        out_shape=[jax.ShapeDtypeStruct((b, d), jnp.float32)] * n_out,
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(
        _qn_blocks(term_ids, qn, b_block), _qn_blocks(term_ids, qn, b_block),
        tmax_blocks, term_ids, term_ids, title_ftT, title_fwT,
        body_ftT, body_fwT,
    )
    if emit_counts:
        return out[0], out[1], out[2], out[3]
    return out[0], None, out[1], None


def balance_blocks(tmax: np.ndarray) -> np.ndarray:
    """Reorder doc blocks so contiguous grid halves carry ~equal work
    (megacore splits the 1-D grid in half). Snake-assign sorted blocks to
    two halves. Returns the block order (new position -> old block)."""
    order = np.argsort(-tmax, kind="stable")
    a, b = [], []
    for i, blk in enumerate(order):
        (a if i % 4 in (0, 3) else b).append(blk)
    return np.array(a + b, dtype=np.int64)


def t_queued(fn, reps=8):
    out = fn()
    np.asarray(out[0][:, :1])
    t0 = time.perf_counter()
    hs = [fn() for _ in range(reps)]
    np.asarray(hs[-1][0][:, :1])
    np.asarray(hs[0][0][:, :1])
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_448
    d = -(-n // DOC_BLOCK) * DOC_BLOCK
    rng = np.random.default_rng(0)
    n_vocab = 30_000
    tb_nat = 120  # static T_pad the production kernel sweeps at 1M
    tt = 8
    b, q = 128, 4

    # per-doc distinct counts like the bench corpus (uniform-ish 40-120)
    nt = rng.integers(35, tb_nat, n).astype(np.int32)
    nt = np.concatenate([nt, np.zeros(d - n, np.int32)])  # pad docs empty

    # body forward arrays [T, D] with nt[d] real rows, -1 pad
    probs_idx = rng.integers(0, n_vocab, size=(tb_nat, d), dtype=np.int32)
    mask = np.arange(tb_nat, dtype=np.int32)[:, None] < nt[None, :]
    bft = np.where(mask, probs_idx, -1).astype(np.int32)
    bfw = np.where(mask, rng.random((tb_nat, d), np.float32) + 0.01, 0.0).astype(
        np.float32
    )
    tft = np.where(
        np.arange(tt)[:, None] < 4, rng.integers(0, n_vocab, (tt, d)), -1
    ).astype(np.int32)
    tfw = np.where(tft >= 0, 0.5, 0.0).astype(np.float32)

    # queries: sample real terms; qn mix 1-4 sorted desc
    term_ids = rng.integers(0, n_vocab, (b, q)).astype(np.int32)
    qn = np.sort(rng.integers(1, q + 1, b).astype(np.int32))[::-1].copy()
    for i in range(b):
        term_ids[i, qn[i]:] = np.iinfo(np.int32).max

    from spaghettisearch_tpu.ops.kernels.membership import (
        pallas_forward_scores_2sec,
    )

    jtq = jnp.asarray(term_ids)
    jqn = jnp.asarray(qn)

    def put_layout(perm, tb_pad):
        """Device arrays under a doc permutation, body T padded to tb_pad."""
        pad_rows = tb_pad - tb_nat
        bft_p = np.concatenate(
            [bft[:, perm], np.full((pad_rows, d), -1, np.int32)]
        ) if pad_rows else bft[:, perm]
        bfw_p = np.concatenate(
            [bfw[:, perm], np.zeros((pad_rows, d), np.float32)]
        ) if pad_rows else bfw[:, perm]
        return (
            jnp.asarray(tft[:, perm]), jnp.asarray(tfw[:, perm]),
            jnp.asarray(bft_p), jnp.asarray(bfw_p),
        )

    ident = np.arange(d)
    base = put_layout(ident, tb_nat)
    ms = t_queued(lambda: pallas_forward_scores_2sec(
        *base, jtq, jqn, doc_block=DOC_BLOCK, emit_counts=False))
    print(f"baseline static-T (T={tb_nat}, natural order): {ms:.1f} ms "
          f"({b * 1e3 / ms:.0f} qps)", flush=True)
    base_ts, _, base_bs, _ = pallas_forward_scores_2sec(
        *base, jtq, jqn, doc_block=DOC_BLOCK, emit_counts=False)
    base_ts = np.asarray(base_ts)
    base_bs = np.asarray(base_bs)
    del base

    for tc in (16, 32):
        tb_pad = -(-tb_nat // tc) * tc
        # sorted desc, then block-balanced for megacore
        perm0 = np.argsort(-nt, kind="stable")
        tmax0 = nt[perm0].reshape(-1, DOC_BLOCK).max(axis=1)
        for label, blkorder in (
            ("balanced", balance_blocks(tmax0)),
            ("sorted-only", np.arange(len(tmax0))),
        ):
            perm = perm0.reshape(-1, DOC_BLOCK)[blkorder].reshape(-1)
            tmax = jnp.asarray(tmax0[blkorder].astype(np.int32))
            arrs = put_layout(perm, tb_pad)
            run = lambda: forward_scores_2sec_tb(  # noqa: E731
                *arrs, tmax, jtq, jqn, tc=tc, emit_counts=False)
            ms = t_queued(run)
            ts, _, bs, _ = run()
            # un-permute for the exactness check
            inv = np.empty(d, np.int64)
            inv[perm] = np.arange(d)
            ts = np.asarray(ts)[:, inv]
            bs = np.asarray(bs)[:, inv]
            rel = np.abs(bs - base_bs) / np.maximum(np.abs(base_bs), 1e-9)
            ok_t = np.array_equal(ts, base_ts)
            print(
                f"tbound tc={tc} {label}: {ms:.1f} ms ({b * 1e3 / ms:.0f} qps) "
                f"title_exact={ok_t} body_max_rel={rel.max():.2e}",
                flush=True,
            )
            del arrs


if __name__ == "__main__":
    main()
