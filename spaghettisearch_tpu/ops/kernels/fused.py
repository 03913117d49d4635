"""Fused Pallas kernel: title+body membership scoring + score finalization.

One pass over doc blocks producing the FINAL blended score (reference
formula, get_metadata.go:53-69) directly:

    per section s in {title, body}:
        mult_s[b,d,j] = #occurrences of ft_s[d,j] among query b's terms
        score_s[b,d]  = sum_j fw_s[d,j] * mult_s
        count_s[b,d]  = sum_j mult_s
    sqd[b,d]   = topic_probs[b] . pagerank[d]
    norm_s     = score_s / (mag_s[d] * sqrt(qlen[b]))   (NaN -> 0)
    final[b,d] = (0.33*sqd + 0.38*norm_title + 0.29*norm_body) * 100
    final      = -inf where count_title + count_body == 0

vs the unfused pipeline (2 membership kernels + XLA finalize) this reads the
index tiles once and never materializes the 4 intermediate [B, D]
score/count arrays in HBM (4 x 100MB at the headline shapes).

MEASURED RESULT (v5-class chip, 256-query batch, 100k docs): the fused
kernel runs 15.7 ms/batch vs 12.1 ms for the unfused composition — XLA's
pipelining of the three smaller ops beats the single heavyweight kernel, so
production keeps the unfused path (models/blended.py). Kept with its parity
test as the measured data point and for shapes where fusion may win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SCORE_SCALE, W_BODY, W_PAGERANK, W_TITLE


def _kernel(
    tq_ref, qmag_ref, tp_ref,
    tft_ref, tfw_ref, bft_ref, bfw_ref,
    mt_ref, mb_ref, pr_ref,
    out_ref, *, b_block: int, q: int,
):
    tft = tft_ref[:]  # [Tt, Db]
    tfw = tfw_ref[:]
    bft = bft_ref[:]  # [Tb, Db]
    bfw = bfw_ref[:]
    mt = mt_ref[0, :]  # [Db]
    mb = mb_ref[0, :]
    pr = pr_ref[:]  # [C, Db]
    b_total = tq_ref.shape[0]

    def section(ft, fw, tq):
        mult = jnp.zeros((b_block,) + ft.shape, jnp.float32)
        for qi in range(q):
            t = tq[:, qi][:, None, None]
            mult = mult + (ft[None, :, :] == t).astype(jnp.float32)
        return jnp.sum(mult * fw[None, :, :], axis=1), jnp.sum(mult, axis=1)

    def b_body(bi, _):
        row = bi * b_block
        tq = tq_ref[pl.ds(row, b_block), :]  # [Bb, Q]
        qmag = qmag_ref[pl.ds(row, b_block), 0][:, None]  # [Bb, 1]
        tp = tp_ref[pl.ds(row, b_block), :]  # [Bb, C]
        ts, tc = section(tft, tfw, tq)
        bs, bc = section(bft, bfw, tq)
        title_n = ts / (mt[None, :] * qmag)
        body_n = bs / (mb[None, :] * qmag)
        title_n = jnp.where(jnp.isnan(title_n), 0.0, title_n)
        body_n = jnp.where(jnp.isnan(body_n), 0.0, body_n)
        # C is tiny: an unrolled VPU broadcast-sum beats an MXU dot here
        sqd = jnp.zeros((b_block, pr.shape[1]), jnp.float32)
        for ci in range(pr.shape[0]):
            sqd = sqd + tp[:, ci][:, None] * pr[ci, :][None, :]
        final = (W_PAGERANK * sqd + W_TITLE * title_n + W_BODY * body_n) * SCORE_SCALE
        final = jnp.where(tc + bc > 0, final, -jnp.inf)
        out_ref[pl.ds(row, b_block), :] = final
        return 0

    jax.lax.fori_loop(0, b_total // b_block, b_body, 0)


@functools.partial(
    jax.jit, static_argnames=("doc_block", "b_block", "interpret")
)
def pallas_fused_final_scores(
    title_ftT: jax.Array,  # int32 [Tt, D]
    title_fwT: jax.Array,  # f32 [Tt, D]
    body_ftT: jax.Array,  # int32 [Tb, D]
    body_fwT: jax.Array,  # f32 [Tb, D]
    mag_title: jax.Array,  # f32 [D]
    mag_body: jax.Array,  # f32 [D]
    pagerankT: jax.Array,  # f32 [C, D]
    term_ids: jax.Array,  # int32 [B, Q]; B % b_block == 0
    query_len: jax.Array,  # f32 [B]
    topic_probs: jax.Array,  # f32 [B, C]
    *,
    doc_block: int = 512,
    b_block: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """-> final [B, D] blended scores (-inf for non-candidates)."""
    tt, d = title_ftT.shape
    tb = body_ftT.shape[0]
    b, q = term_ids.shape
    c = pagerankT.shape[0]
    assert d % doc_block == 0 and b % b_block == 0, (d, doc_block, b, b_block)
    qmag = jnp.sqrt(query_len)[:, None]  # [B, 1]
    grid = (d // doc_block,)
    kernel = functools.partial(_kernel, b_block=b_block, q=q)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, q), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tt, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (b, doc_block), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, d), jnp.float32),
        interpret=interpret,
    )(
        term_ids, qmag, topic_probs,
        title_ftT, title_fwT, body_ftT, body_fwT,
        mag_title[None, :], mag_body[None, :], pagerankT,
    )
