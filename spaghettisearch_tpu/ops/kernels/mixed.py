"""Pallas TPU kernel for FUSED keyword + phrase scoring (the mixed lane).

Round-2's phrase lane was two-phase and host-chatty: a sparse candidate
matcher (one program per cap-level group), a device->host fetch of the
matches, a host repack into [B, E] fold arrays, and a second scorer
dispatch — >= 2 relay round trips and a host repack per mixed batch
(measured 313 ms vs 37 ms keyword-only at 128 queries / 100k docs).

This kernel is the TPU-native reformulation: phrase matching as a DENSE
forward pass fused into the membership scorer. Positions live in a
doc-major layout streamed alongside the forward index —

    posT[c*T + t, d] = (c-th UNIQUE position of doc d's term-slot t), BIG pad

so the positional-chain check per (query, doc) is a pure-VPU select +
compare with zero gathers, and a whole mixed batch is ONE device program
with ONE packed result fetch. Costs scale with the query's real work:

  - 8-query row blocks with no phrases skip the phrase stage entirely
    (block-level pl.when dispatch, same trick as the qn keyword dispatch);
  - the chain stage (position select + intersect) runs only for doc blocks
    where some candidate has every phrase term present — selective phrases
    pay ~2 extra compare sweeps per (row-block, doc-block), common-word
    phrases pay the honest dense-check cost.

Reference semantics (retrieval/phrase.go:53-109 + main_retrieve.go:62-78),
identical to ops/phrase.py match_phrase_fwd (equivalence-tested):
  - a doc matches only if EVERY phrase term occurs in title OR body;
  - the title contributes sum(term title weights) only when every term has
    a title entry and the title positional chain intersects; body likewise;
  - chain: some position of term 0 such that term i occurs at pos0 + i
    (positions pre-shifted by the term's phrase offset, phrase.go:144-157);
  - a single-term phrase matches wherever the term occurs (sentinel -100
    anchor/meta positions included);
  - phrase-matched docs are candidates even with zero keyword overlap.

Value-domain invariants the select trick relies on (document + test):
  real positions are -100 or in [0, POS_REAL_MAX); the pad is POS_BIG
  (finite — an inf pad would turn the select's 0*pad into NaN); an
  absent (doc, term) selects position 0.0, which is only ever compared
  when masked by the all-terms-found requirement, and shifted anchors
  (anchor + p, p in [1,16)) can never collide with 0 because no real
  position lies in [-16, -1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .membership import (
    _dispatch_q,
    _q_levels_pow2,
    _qn_blocks,
    _section_scores_unrolled,
)

#: pad value for absent position slots; finite (inf*0 = NaN would poison
#: the one-hot select) and exactly representable in f32, far above any
#: real document position.
POS_BIG = float(1 << 24)
#: everything below this is a real position (real docs are << 1e6 tokens)
POS_REAL_MAX = float(1 << 23)

#: int16 posT planes (bandwidth compression): the kernel streams HALF the
#: HBM bytes for the row-count-independent posT floor (~50 ms of the 1M
#: mixed program, FINDINGS session 6) and dequantizes per VMEM tile back
#: to the exact f32 plane — POS16_PAD encodes POS_BIG, every real value
#: (-100 sentinel included) round-trips exactly, so scores and match sets
#: are bitwise-identical to the f32 path. quantize_posT returns None when
#: any real position exceeds POS16_MAX (pathological giant documents keep
#: the f32 planes; the margin below int16 max keeps PAD16 unambiguous).
POS16_PAD = 32767
POS16_MAX = 32000.0


def quantize_posT(posT_np):
    """Host-side int16 encoding of a doc-major position plane ([C*T, D]
    f32, values in {-100} ∪ [0, POS16_MAX] ∪ {POS_BIG}); None when some
    real position is too large to encode. Chunked to bound transients."""
    import numpy as np

    if posT_np.size == 0:
        return posT_np.astype(np.int16)
    mx = float(
        posT_np.max(initial=-100.0, where=posT_np < POS_REAL_MAX)
    )
    if mx > POS16_MAX:
        return None
    out = np.empty(posT_np.shape, np.int16)
    rows = posT_np.shape[0]
    step = max(1, (64 << 20) // max(posT_np.shape[1] * 4, 1))
    for r0 in range(0, rows, step):
        blk = posT_np[r0 : r0 + step]
        np.copyto(
            out[r0 : r0 + step],
            np.where(blk >= POS_REAL_MAX, np.float32(POS16_PAD), blk).astype(
                np.int16
            ),
        )
    return out


def _deq_posT(x):
    """Per-tile dequant of an int16 posT block back to the exact f32 plane
    (identity on f32 inputs): upcast + one select mapping PAD16 -> POS_BIG."""
    if x.dtype != jnp.int16:
        return x
    xf = x.astype(jnp.float32)
    return jnp.where(xf >= float(POS16_PAD), POS_BIG, xf)


_T_CHUNK = 16  # term-axis chunk: bounds the [Bb, tc, Db] compare temporaries


def _phrase_term_stage(ft, fw, pid_col, vmask_col, posT=None, c=0):
    """One phrase term against one section tile, term axis processed in
    chunks so the [Bb, tc, Db] compare intermediates stay VMEM-small.

    ft/fw: [T, Db]; pid_col: [Bb] int32; vmask_col: [Bb] f32 (1 = slot is a
    real phrase term). -> (found_eff [Bb, Db] bool with invalid slots
    auto-found, w [Bb, Db] f32 zero where invalid/absent, pos) where pos is
    a [c]-list of one-hot-selected position planes [Bb, Db] when posT is
    given (POS_BIG empty slots, 0.0 where the term is absent — callers
    mask absence via the found flags), else None."""
    t = ft.shape[0]
    bb, db = pid_col.shape[0], ft.shape[1]
    pid = pid_col[:, None, None]
    w = jnp.zeros((bb, db), jnp.float32)
    cnt = jnp.zeros((bb, db), jnp.float32)
    pos = [jnp.zeros((bb, db), jnp.float32) for _ in range(c)] if posT is not None else None
    for t0 in range(0, t, _T_CHUNK):
        t1 = min(t0 + _T_CHUNK, t)
        eqf = (ft[t0:t1][None, :, :] == pid).astype(jnp.float32)
        w += jnp.sum(eqf * fw[t0:t1][None, :, :], axis=1)
        cnt += jnp.sum(eqf, axis=1)
        if posT is not None:
            for ci in range(c):
                pos[ci] += jnp.sum(
                    eqf * posT[ci * t + t0 : ci * t + t1, :][None], axis=1
                )
    valid = vmask_col[:, None] > 0.0  # [Bb, 1] -> broadcast
    # f32 mask (1.0/0.0), NOT bool: these flow through scf.for carries and
    # Mosaic fails to legalize i1 vector carries (measured round 3)
    found_eff = jnp.where(valid, (cnt > 0.0).astype(jnp.float32), 1.0)
    return found_eff, jnp.where(valid, w, 0.0), pos


def _phrase_term_stage_ref(
    ft_ref, fw_ref, pid_col, vmask_col, trips, tc: int,
    posT_ref=None, c: int = 0,
):
    """Ref-chunked twin of _phrase_term_stage for the doc-sorted layout:
    the body-section sweep runs as a dynamic-trip fori over tc-row term
    chunks bounded by this doc block's real max distinct-term count
    (`trips`, from SMEM body_tmax). Skipped chunks hold only pad slots
    (eqf == 0 there), so bounding is EXACT — it drops only zero adds.
    Reads stay on the refs (Mosaic has no dynamic_slice on values)."""
    t = ft_ref.shape[0]
    bb, db = pid_col.shape[0], ft_ref.shape[1]
    pid = pid_col[:, None, None]

    def body(ti, carry):
        w, cnt = carry[0], carry[1]
        pos = carry[2:]
        ftc = ft_ref[pl.ds(ti * tc, tc), :]
        eqf = (ftc[None, :, :] == pid).astype(jnp.float32)
        w = w + jnp.sum(eqf * fw_ref[pl.ds(ti * tc, tc), :][None], axis=1)
        cnt = cnt + jnp.sum(eqf, axis=1)
        new_pos = tuple(
            pos[ci]
            + jnp.sum(
                eqf
                * _deq_posT(posT_ref[pl.ds(ci * t + ti * tc, tc), :])[None],
                axis=1,
            )
            for ci in range(c)
        )
        return (w, cnt) + new_pos

    zeros = jnp.zeros((bb, db), jnp.float32)
    out = jax.lax.fori_loop(
        0, trips, body, (zeros, zeros) + tuple(zeros for _ in range(c))
    )
    w, cnt, pos = out[0], out[1], list(out[2:])
    valid = vmask_col[:, None] > 0.0
    found_eff = jnp.where(valid, (cnt > 0.0).astype(jnp.float32), 1.0)
    return found_eff, jnp.where(valid, w, 0.0), pos if c else None


def _phrase_block(
    tft, tfw, bft, bfw, tposT, bposT,
    ph, phv,  # [Bb, P] i32 / f32 (this 8-row block's phrase tiles)
    pnb,  # traced: this block's max phrase slot count
    ct: int, cb: int,
    chain_t_ref, chain_b_ref,  # VMEM scratch [Bb, Db] f32
    body_refs=None,  # (bft_ref, bfw_ref, bposT_ref, ph_trips, ph_tc):
    # bound the BODY-section phrase sweeps by the doc block's tmax
    # (doc-sorted layout); title stays static (Tt is small)
):
    """Compute one 8-row block's phrase contribution against one doc block.

    The phrase-term loops are DYNAMIC-trip fori_loops bounded by the
    block's real max term count (pnb) with small [Bb, Db] carried planes —
    a fully-unrolled 16-step body blew Mosaic's scoped VMEM stack (24 MB,
    measured: the allocator does not reuse stack across long straight-line
    bodies), and dynamic trips also collapse the P-level program split.

    Returns (t_ok, sum_tw, b_ok, sum_bw): boolean match masks per section
    and the summed term weights ([Bb, Db] each)."""
    bb, db = chain_t_ref.shape

    if body_refs is None:
        def bstage(pid, vm, pos=False):
            return _phrase_term_stage(
                bft, bfw, pid, vm, bposT if pos else None, cb if pos else 0
            )
    else:
        bft_ref, bfw_ref, bposT_ref, ph_trips, ph_tc = body_refs

        def bstage(pid, vm, pos=False):
            return _phrase_term_stage_ref(
                bft_ref, bfw_ref, pid, vm, ph_trips, ph_tc,
                bposT_ref if pos else None, cb if pos else 0,
            )

    def col(v, p):
        # slot p of the [Bb, P] tile via one-hot select: Mosaic has no
        # dynamic_slice lowering, and a dynamic LANE offset would be
        # unsupported anyway; P <= 16 makes this a trivial [Bb, P] reduce
        # (exact for int32: where + sum, no float roundtrip)
        sel = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1) == p
        return jnp.sum(jnp.where(sel, v, jnp.zeros_like(v)), axis=1)

    # all fori carries are f32 planes (Mosaic cannot legalize i1 vector
    # carries in scf.for — measured round 3); masks are 1.0/0.0, AND is
    # multiply, OR is maximum
    ones = jnp.ones((bb, db), dtype=jnp.float32)
    zeros = jnp.zeros((bb, db), dtype=jnp.float32)

    def mem_body(p, carry):
        present, t_all, b_all, sum_tw, sum_bw = carry
        pid = col(ph, p)
        vm = col(phv, p)
        tf_found, tw, _ = _phrase_term_stage(tft, tfw, pid, vm)
        bf_found, bw, _ = bstage(pid, vm)
        return (
            present * jnp.maximum(tf_found, bf_found), t_all * tf_found,
            b_all * bf_found, sum_tw + tw, sum_bw + bw,
        )

    present_all, t_all, b_all, sum_tw, sum_bw = jax.lax.fori_loop(
        0, pnb, mem_body, (ones, ones, ones, zeros, zeros)
    )
    hp = (phv[:, 0] > 0.0)[:, None]  # row has a phrase at all
    # positional chain, only where some doc could match at all
    cand_t = (t_all * present_all > 0.0) & hp
    cand_b = (b_all * present_all > 0.0) & hp

    @pl.when(jnp.any(cand_t | cand_b))
    def _():
        # anchor = phrase term 0's positions; loop-invariant across steps
        pid0 = ph[:, 0]
        vm0 = phv[:, 0]
        _, _, anchor_t = _phrase_term_stage(tft, tfw, pid0, vm0, tposT, ct)
        _, _, anchor_b = bstage(pid0, vm0, pos=True)
        hit_t0 = tuple(
            (a < POS_REAL_MAX).astype(jnp.float32) for a in anchor_t
        )
        hit_b0 = tuple(
            (a < POS_REAL_MAX).astype(jnp.float32) for a in anchor_b
        )

        def chain_body(p, hits):
            hit_t, hit_b = hits
            pid = col(ph, p)
            vm = col(phv, p)
            valid = (vm > 0.0)[:, None]
            _, _, pos_t = _phrase_term_stage(tft, tfw, pid, vm, tposT, ct)
            _, _, pos_b = bstage(pid, vm, pos=True)
            fp = p.astype(jnp.float32)
            new_t = []
            for c0 in range(ct):
                m = jnp.zeros((bb, db), dtype=jnp.bool_)
                for c in range(ct):
                    m |= pos_t[c] == anchor_t[c0] + fp
                mf = jnp.where(valid, m.astype(jnp.float32), 1.0)
                new_t.append(hit_t[c0] * mf)
            new_b = []
            for c0 in range(cb):
                m = jnp.zeros((bb, db), dtype=jnp.bool_)
                for c in range(cb):
                    m |= pos_b[c] == anchor_b[c0] + fp
                mf = jnp.where(valid, m.astype(jnp.float32), 1.0)
                new_b.append(hit_b[c0] * mf)
            return (tuple(new_t), tuple(new_b))

        # a 1-term phrase (pnb == 1) runs zero chain steps: it matches
        # wherever the term occurs, any position (-100 included)
        hit_t, hit_b = jax.lax.fori_loop(1, pnb, chain_body, (hit_t0, hit_b0))
        ch_t = hit_t[0]
        for h in hit_t[1:]:
            ch_t = jnp.maximum(ch_t, h)
        ch_b = hit_b[0]
        for h in hit_b[1:]:
            ch_b = jnp.maximum(ch_b, h)
        chain_t_ref[:, :] = ch_t
        chain_b_ref[:, :] = ch_b

    # stale scratch when the pl.when was skipped is harmless: cand_* is
    # then all-false, and the chain bit only matters where cand_* holds
    t_ok = cand_t & (chain_t_ref[:, :] > 0.0)
    b_ok = cand_b & (chain_b_ref[:, :] > 0.0)
    return t_ok, sum_tw, b_ok, sum_bw


def _kernel_mixed(
    qn_ref, qnb_ref, pn_ref, *rest, b_block: int, q: int, ct: int, cb: int,
    emit_counts: bool, tc: int | None = None, ph_tc: int | None = None,
):
    """With tc set (doc-sorted layout, DeviceIndex doc_sort) the body
    KEYWORD sweep becomes a dynamic-trip fori over tc-row term chunks
    bounded by this doc block's real max distinct-term count (SMEM tmaxb,
    indexed by program id) — the same dynamic-T trick as membership
    _kernel2 (known to REGRESS this kernel at 1M: VMEM scheduling vs the
    posT stream; kept for the probe matrix). With ph_tc set the PHRASE
    stage's body sweeps take the same bound instead — phrase work is
    ~2.9 ms per phrase row at 1M and its body sweep dominates, while the
    keyword sweep stays static (no VMEM fight)."""
    if tc is None and ph_tc is None:
        tmaxb_ref = None
        (tq_ref, btq_ref, ph_ref, phv_ref, tft_ref, tfw_ref, bft_ref,
         bfw_ref, tposT_ref, bposT_ref, *refs) = rest
    else:
        (tmaxb_ref, tq_ref, btq_ref, ph_ref, phv_ref, tft_ref, tfw_ref,
         bft_ref, bfw_ref, tposT_ref, bposT_ref, *refs) = rest
    n_out = 4 if emit_counts else 2
    out_refs = refs[:n_out]
    chain_t_ref, chain_b_ref = refs[n_out], refs[n_out + 1]
    tft = tft_ref[:]
    tfw = tfw_ref[:]
    if tc is None:
        bft = bft_ref[:]
        bfw = bfw_ref[:]
        trips = None
    else:
        # bft/bfw stay as refs for the chunked sweep; the phrase stage
        # (rare blocks) materializes them at its pl.when site
        db = bft_ref.shape[1]
        trips = (tmaxb_ref[pl.program_id(0)] + (tc - 1)) // tc
    tposT = _deq_posT(tposT_ref[:])
    if ph_tc is None:
        bposT = _deq_posT(bposT_ref[:])
        body_refs = None
    else:
        bposT = None  # phrase body sweeps read the refs chunk-wise
        ph_trips = (tmaxb_ref[pl.program_id(0)] + (ph_tc - 1)) // ph_tc
        body_refs = (bft_ref, bfw_ref, bposT_ref, ph_trips, ph_tc)

    def b_body(bi, _):
        row = bi * b_block
        tq = tq_ref[pl.ds(row, b_block), :]
        btq = btq_ref[pl.ds(row, b_block), :]

        # the body keyword sweep has its own term tile/count: with the
        # hot-term split, btq holds only cold slots (hot body weight comes
        # from the caller's dense matmul); otherwise btq=tq, qnb=qn
        def emit_kw_t(q_eff):
            s, c = _section_scores_unrolled(tft, tfw, tq, q_eff, emit_counts)
            out_refs[0][pl.ds(row, b_block), :] = s
            if emit_counts:
                out_refs[1][pl.ds(row, b_block), :] = c

        def emit_kw_b(q_eff):
            s, c = _section_scores_unrolled(bft, bfw, btq, q_eff, emit_counts)
            if emit_counts:
                out_refs[2][pl.ds(row, b_block), :] = s
                out_refs[3][pl.ds(row, b_block), :] = c
            else:
                out_refs[1][pl.ds(row, b_block), :] = s

        def emit_kw_b_tb(q_eff):
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

        # pow2 levels ONLY: the 4-level chain regressed this kernel 44->59
        # ms/batch at 100k (VMEM scheduling vs the posT stream; membership
        # _q_levels_pow2 docstring has the measurement)
        _dispatch_q(qn_ref[bi], q, emit_kw_t, levels=_q_levels_pow2(q))
        _dispatch_q(
            qnb_ref[bi], q, emit_kw_b if tc is None else emit_kw_b_tb,
            levels=_q_levels_pow2(q),
        )

        @pl.when(pn_ref[bi] > 0)
        def _():
            ph = ph_ref[pl.ds(row, b_block), :]
            phv = phv_ref[pl.ds(row, b_block), :]
            t_ok, sum_tw, b_ok, sum_bw = _phrase_block(
                tft, tfw,
                None if ph_tc is not None else (bft if tc is None else bft_ref[:]),
                None if ph_tc is not None else (bfw if tc is None else bfw_ref[:]),
                tposT, bposT, ph, phv,
                pn_ref[bi], ct, cb, chain_t_ref, chain_b_ref,
                body_refs=body_refs,
            )
            add_t = jnp.where(t_ok, sum_tw, 0.0)
            add_b = jnp.where(b_ok, sum_bw, 0.0)
            if emit_counts:
                flag = (t_ok | b_ok).astype(jnp.float32)
                out_refs[0][pl.ds(row, b_block), :] += add_t
                out_refs[1][pl.ds(row, b_block), :] += flag
                out_refs[2][pl.ds(row, b_block), :] += add_b
            else:
                out_refs[0][pl.ds(row, b_block), :] += add_t
                out_refs[1][pl.ds(row, b_block), :] += add_b

        return 0

    jax.lax.fori_loop(0, tq_ref.shape[0] // b_block, b_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "doc_block", "b_block", "emit_counts", "interpret", "tc", "tmax_stage",
    ),
)
def pallas_mixed_scores_2sec(
    title_ftT: jax.Array,  # int32 [Tt, D]
    title_fwT: jax.Array,
    body_ftT: jax.Array,  # int32 [Tb, D]
    body_fwT: jax.Array,
    title_posT: jax.Array,  # f32|int16 [Ct*Tt, D] (c-major slot rows;
    # int16 planes are quantize_posT encodings, dequantized per VMEM tile)
    body_posT: jax.Array,  # f32|int16 [Cb*Tb, D]
    term_ids: jax.Array,  # int32 [B, Q]; B % b_block == 0
    qn: jax.Array,  # i32 [B] active keyword slots
    ph_ids: jax.Array,  # int32 [B, P] (sentinel pad)
    ph_valid: jax.Array,  # f32 [B, P] 1/0
    pn: jax.Array,  # i32 [B] active phrase slots (0 = keyword-only row)
    *,
    doc_block: int = 512,
    b_block: int = 8,
    emit_counts: bool = True,
    interpret: bool = False,
    qnb: jax.Array | None = None,  # i32 [B] cold-term counts (hot split)
    body_tmax: jax.Array | None = None,  # i32 [D//doc_block] (doc-sorted)
    tc: int = 32,  # membership.TBOUND_TC; body T is padded to 32 under doc_sort
    tmax_stage: str = "kw",  # which stage body_tmax bounds: "kw" (keyword
    # body sweep — regresses at 1M, probe matrix only), "phrase" (phrase
    # stage's body sweeps — the per-phrase-row cost), or "both"
):
    """Fused keyword + phrase scoring, both sections, one grid sweep.

    -> (title score, title count, body score, body count), each [B, D],
    with phrase weights/candidacy FOLDED IN (counts are None when
    emit_counts=False — candidacy <=> score > 0, valid iff every index
    weight is positive, which phrase sums preserve: a section match
    requires every term present in that section, each with weight > 0).

    The batch should be sorted phrase-rows-first (then by descending qn)
    so phrase-free 8-row blocks skip the phrase stage."""
    from ..scoring import mask_cold

    tt, d = title_ftT.shape
    tb = body_ftT.shape[0]
    ct = title_posT.shape[0] // tt
    cb = body_posT.shape[0] // tb
    b, q = term_ids.shape
    p = ph_ids.shape[1]
    assert d % doc_block == 0 and b % b_block == 0, (d, doc_block, b, b_block)
    if body_tmax is not None:
        assert tb % tc == 0, (tb, tc)
        assert body_tmax.shape == (d // doc_block,), (body_tmax.shape, d, doc_block)
    body_tq = mask_cold(term_ids, qnb) if qnb is not None else term_ids
    qnb_eff = qnb if qnb is not None else qn
    kw_tc = tc if body_tmax is not None and tmax_stage in ("kw", "both") else None
    ph_tc = tc if body_tmax is not None and tmax_stage in ("phrase", "both") else None
    kernel = functools.partial(
        _kernel_mixed, b_block=b_block, q=q, ct=ct, cb=cb,
        emit_counts=emit_counts, tc=kw_tc, ph_tc=ph_tc,
    )
    n_out = 4 if emit_counts else 2
    pn_blocks = jnp.clip(
        pn.reshape(b // b_block, b_block).max(axis=1), 0, p
    ).astype(jnp.int32)
    tmax_spec = (
        [] if body_tmax is None else [pl.BlockSpec(memory_space=pltpu.SMEM)]
    )
    tmax_arg = [] if body_tmax is None else [body_tmax]
    out = pl.pallas_call(
        kernel,
        grid=(d // doc_block,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            *tmax_spec,
            pl.BlockSpec((b, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((ct * tt, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((cb * tb, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM)
        ] * n_out,
        out_shape=[jax.ShapeDtypeStruct((b, d), jnp.float32)] * n_out,
        scratch_shapes=[
            pltpu.VMEM((b_block, doc_block), jnp.float32),
            pltpu.VMEM((b_block, doc_block), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
        interpret=interpret,
    )(_qn_blocks(term_ids, qn, b_block), _qn_blocks(term_ids, qnb_eff, b_block),
      pn_blocks, *tmax_arg, term_ids, body_tq, ph_ids, ph_valid,
      title_ftT, title_fwT, body_ftT, body_fwT, title_posT, body_posT)
    if emit_counts:
        return out[0], out[1], out[2], out[3]
    return out[0], None, out[1], None


def mixed_scores_padded(
    title_ftT, title_fwT, body_ftT, body_fwT, title_posT, body_posT,
    term_ids, qn, ph_ids, ph_valid, pn,
    *, doc_block: int = 256, emit_counts: bool = True,
    qnb=None, derive: bool = True, body_tmax=None, tmax_stage: str = "kw",
    tc: int = 32,
):
    """Row-pad to the kernel's 8-row blocks, run the Pallas mixed kernel,
    slice back to the real batch, and derive candidacy counts when elided
    (all index weights > 0 ⇒ candidacy ⟺ score > 0). The single canonical
    pad/dispatch contract for BOTH the single-chip engine
    (ops/scoring.py score_queries_mixed) and the mesh scorer
    (parallel/sharded.py make_sharded_mixed_scorer) — the two paths must
    score identically (tests/test_sharded.py), so the padding sentinel,
    doc_block choice and count rule live here exactly once.

    doc_block defaults to 256, not the keyword kernels' 512: the posT tiles
    and the phrase-stage temporaries share VMEM with the keyword sweep.

    body_tmax (doc-sorted layout, DeviceIndex doc_sort) arrives at the
    index's canonical DOC_BLOCK granularity and is repeated here to this
    kernel's finer doc_block — each sub-block inherits its parent block's
    (conservative, exact) T bound."""
    b = term_ids.shape[0]
    if body_tmax is not None:
        d = title_ftT.shape[1]
        nb = d // doc_block
        assert nb % body_tmax.shape[0] == 0, (nb, body_tmax.shape)
        body_tmax = jnp.repeat(body_tmax, nb // body_tmax.shape[0])
    pad = -(-b // 8) * 8 - b
    imax = jnp.iinfo(jnp.int32).max
    tq = jnp.pad(term_ids, ((0, pad), (0, 0)), constant_values=imax)
    if qn is None:
        qn = jnp.full((b,), term_ids.shape[1], jnp.int32)
    qn_p = jnp.pad(qn, (0, pad))
    qnb_p = None if qnb is None else jnp.pad(qnb, (0, pad))
    ph_p = jnp.pad(ph_ids, ((0, pad), (0, 0)), constant_values=imax)
    phv_p = jnp.pad(ph_valid, ((0, pad), (0, 0)))
    pn_p = jnp.pad(pn, (0, pad))
    ts, tc, bs, bc = pallas_mixed_scores_2sec(
        title_ftT, title_fwT, body_ftT, body_fwT, title_posT, body_posT,
        tq, qn_p, ph_p, phv_p, pn_p,
        doc_block=doc_block, emit_counts=emit_counts, qnb=qnb_p,
        body_tmax=body_tmax, tmax_stage=tmax_stage, tc=tc,
    )
    ts, bs = ts[:b], bs[:b]
    tc = None if tc is None else tc[:b]
    bc = None if bc is None else bc[:b]
    if not derive:  # caller folds hot-term scores first, then derives
        return ts, tc, bs, bc
    return derive_mixed_counts(ts, tc, bs, bc)


def derive_mixed_counts(ts, tc, bs, bc):
    """Fill in the candidacy counts the count-elided kernel variant drops:
    valid iff every index weight is positive (DeviceIndex.has_zero_weight
    guards the df==N idf-zero corner) — then candidacy ⟺ score > 0, and the
    title count carries the whole flag (finalize sums tc+bc)."""
    if tc is None:
        tc = (ts + bs > 0).astype(ts.dtype)
        bc = jnp.zeros_like(tc)
    return ts, tc, bs, bc


# --------------------------------------------------------------------- #
# XLA reference formulation (CPU tests, sharded meshes, oracle checks)
# --------------------------------------------------------------------- #


def mixed_forward_scores(
    title_ft, title_fw, body_ft, body_fw,  # doc-major [D, T]
    title_posT, body_posT,  # [C*T, D] (same layout the kernel streams)
    term_ids,  # int32 [B, Q]
    ph_ids,  # int32 [B, P]
    ph_valid,  # f32 [B, P]
    n_blocks: int = 16,
    qnb=None,  # i32 [B] cold-term counts (hot split; cold slots first)
):
    """Pure-XLA twin of the Pallas mixed kernel (same math, doc-blocked via
    lax.map). -> (ts, tc, bs, bc) each [B, D], phrase folded in; counts add
    the phrase candidacy flag."""
    from ..scoring import forward_section_scores, mask_cold

    title_posT = _deq_posT(title_posT)
    body_posT = _deq_posT(body_posT)

    d = title_ft.shape[0]
    b = term_ids.shape[0]
    ts, tc = forward_section_scores(title_ft, title_fw, term_ids, n_blocks)
    bs, bc = forward_section_scores(
        body_ft, body_fw, mask_cold(term_ids, qnb), n_blocks
    )

    p = ph_ids.shape[1]
    tt = title_ft.shape[1]
    tb = body_ft.shape[1]
    ct = title_posT.shape[0] // tt
    cb = body_posT.shape[0] // tb

    db = -(-d // n_blocks)
    pad = n_blocks * db - d

    def prep(ft, posT, t, c):
        ftb = jnp.pad(ft, ((0, pad), (0, 0)), constant_values=-1)
        pos = posT.T.reshape(d, c, t).transpose(0, 2, 1)  # [D, T, C]
        posb = jnp.pad(pos, ((0, pad), (0, 0), (0, 0)), constant_values=POS_BIG)
        return ftb.reshape(n_blocks, db, t), posb.reshape(n_blocks, db, t, c)

    tftb, tposb = prep(title_ft, title_posT, tt, ct)
    bftb, bposb = prep(body_ft, body_posT, tb, cb)
    tfwb = jnp.pad(title_fw, ((0, pad), (0, 0))).reshape(n_blocks, db, tt)
    bfwb = jnp.pad(body_fw, ((0, pad), (0, 0))).reshape(n_blocks, db, tb)

    valid = ph_valid > 0.0  # [B, P]
    hp = valid[:, 0]  # [B]

    def block(args):
        tft, tfw, tpos, bft, bfw, bpos = args  # [Db, T], [Db, T, C]

        def term(ft_blk, fw_blk, pos_blk, pid):
            eqf = (ft_blk[None, :, :] == pid[:, None, None]).astype(jnp.float32)
            w = jnp.einsum("bdt,dt->bd", eqf, fw_blk)
            found = eqf.sum(-1) > 0.0
            sel = jnp.einsum("bdt,dtc->bdc", eqf, pos_blk)  # [B, Db, C]
            return found, w, sel

        present = jnp.ones((b, tft.shape[0]), bool)
        t_all = jnp.ones_like(present)
        b_all = jnp.ones_like(present)
        sum_tw = jnp.zeros((b, tft.shape[0]), jnp.float32)
        sum_bw = jnp.zeros_like(sum_tw)
        anchor_t = anchor_b = None
        hit_t = hit_b = None
        for pi in range(p):
            v = valid[:, pi][:, None]
            tf_found, tw, tsel = term(tft, tfw, tpos, ph_ids[:, pi])
            bf_found, bw, bsel = term(bft, bfw, bpos, ph_ids[:, pi])
            tf_eff = tf_found | ~v
            bf_eff = bf_found | ~v
            present &= tf_eff | bf_eff
            t_all &= tf_eff
            b_all &= bf_eff
            sum_tw += jnp.where(v, tw, 0.0)
            sum_bw += jnp.where(v, bw, 0.0)
            if pi == 0:
                anchor_t, anchor_b = tsel, bsel
                hit_t = anchor_t < POS_REAL_MAX  # [B, Db, C]
                hit_b = anchor_b < POS_REAL_MAX
            else:
                fp = float(pi)
                m_t = jnp.any(
                    tsel[:, :, None, :] == anchor_t[:, :, :, None] + fp, axis=-1
                )
                m_b = jnp.any(
                    bsel[:, :, None, :] == anchor_b[:, :, :, None] + fp, axis=-1
                )
                hit_t &= m_t | ~v[..., None]
                hit_b &= m_b | ~v[..., None]
        chain_t = jnp.any(hit_t, axis=-1)
        chain_b = jnp.any(hit_b, axis=-1)
        t_ok = present & t_all & chain_t & hp[:, None]
        b_ok = present & b_all & chain_b & hp[:, None]
        return (
            jnp.where(t_ok, sum_tw, 0.0),
            jnp.where(b_ok, sum_bw, 0.0),
            (t_ok | b_ok).astype(jnp.float32),
        )

    add_t, add_b, flag = jax.lax.map(
        block, (tftb, tfwb, tposb, bftb, bfwb, bposb)
    )  # [M, B, Db]
    add_t = jnp.moveaxis(add_t, 0, 1).reshape(b, -1)[:, :d]
    add_b = jnp.moveaxis(add_b, 0, 1).reshape(b, -1)[:, :d]
    flag = jnp.moveaxis(flag, 0, 1).reshape(b, -1)[:, :d]
    return ts + add_t, tc + flag, bs + add_b, bc
