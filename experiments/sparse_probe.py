"""Probe: sort-based sparse CSR scoring vs the dense membership scan at 1M docs.

VERDICT r1 item 4: the forward scan is O(B*D*T) regardless of selectivity.
This prototypes the exact sparse path: gather each query's posting windows
(title+body, all terms) into a static [B, N] buffer, sort by doc id,
segmented-sum weights/counts, finalize, top-k over N.

Run on the real TPU: python experiments/sparse_probe.py
"""

import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import synth_snapshot
from spaghettisearch_tpu.ops.scoring import (
    exact_top_k,
    pallas_available,
    score_queries_forward,
)
from spaghettisearch_tpu.retrieval.device_index import DeviceIndex


@partial(jax.jit, static_argnames=("topk", "n_docs", "n_entries"))
def score_sparse(
    cat_doc_ids,  # i32 [P] title ++ body doc ids (pad rows -> n_docs)
    cat_weights,  # f32 [P]
    mag_title,
    mag_body,
    pagerank,  # [D, C]
    win_start,  # i32 [B, W] global window starts into cat arrays
    win_len,  # i32 [B, W]
    win_title,  # f32 [W] 1.0 if window is a title window
    query_len,  # f32 [B]
    topic_probs,  # f32 [B, C]
    *,
    topk: int,
    n_docs: int,
    n_entries: int,
):
    b, w = win_start.shape
    n = n_entries
    cl = jnp.cumsum(win_len, axis=1)  # [B, W]
    cl0 = jnp.concatenate([jnp.zeros((b, 1), jnp.int32), cl], axis=1)  # [B, W+1]
    j = jnp.arange(n, dtype=jnp.int32)  # [N]
    # window of entry j: number of window-ends <= j
    t_of = (j[None, :, None] >= cl[:, None, :]).sum(-1).astype(jnp.int32)  # [B, N]
    valid = j[None, :] < cl[:, -1:]
    t_of_c = jnp.minimum(t_of, w - 1)
    local = j[None, :] - jnp.take_along_axis(cl0, t_of_c, axis=1)
    g = jnp.take_along_axis(win_start, t_of_c, axis=1) + local
    g = jnp.where(valid, g, cat_doc_ids.shape[0] - 1)
    d = jnp.where(valid, cat_doc_ids[g], n_docs)
    wgt = jnp.where(valid, cat_weights[g], 0.0)
    is_t = win_title[t_of_c]
    wt = wgt * is_t
    wb = wgt * (1.0 - is_t)
    cnt = valid.astype(jnp.float32)

    d_s, wt_s, wb_s, c_s = jax.lax.sort((d, wt, wb, cnt), dimension=1, num_keys=1)

    # segmented sums via cumsum + head-anchored subtraction
    heads = jnp.concatenate(
        [jnp.ones((b, 1), bool), d_s[:, 1:] != d_s[:, :-1]], axis=1
    )
    tails = jnp.concatenate(
        [d_s[:, 1:] != d_s[:, :-1], jnp.ones((b, 1), bool)], axis=1
    )
    payload = jnp.stack([wt_s, wb_s, c_s], axis=-1)  # [B, N, 3]
    csum = jnp.cumsum(payload, axis=1)
    jrow = jnp.arange(n, dtype=jnp.int32)[None, :]
    hidx = jax.lax.cummax(jnp.where(heads, jrow, -1), axis=1)  # [B, N]
    prev = jnp.where(
        (hidx > 0)[..., None],
        jnp.take_along_axis(csum, jnp.maximum(hidx - 1, 0)[..., None], axis=1),
        0.0,
    )
    seg = csum - prev  # inclusive within segment
    ts, bs, c = seg[..., 0], seg[..., 1], seg[..., 2]

    dg = jnp.minimum(d_s, n_docs - 1)
    qmag = jnp.sqrt(query_len)[:, None]
    tn = ts / (mag_title[dg] * qmag)
    bn = bs / (mag_body[dg] * qmag)
    tn = jnp.where(jnp.isnan(tn), 0.0, tn)
    bn = jnp.where(jnp.isnan(bn), 0.0, bn)
    # sqd[b, j] = topic_probs[b] . pagerank[d_s[b, j]]
    sqd = jnp.einsum("bc,bjc->bj", topic_probs, pagerank[dg])
    final = (0.33 * sqd + 0.38 * tn + 0.29 * bn) * 100.0
    final = jnp.where(tails & (c > 0) & (d_s < n_docs), final, -jnp.inf)
    top_s, pos = exact_top_k(final, topk)
    return top_s, jnp.take_along_axis(d_s, pos, axis=1)


@partial(jax.jit, static_argnames=("topk", "n_entries", "n_block"))
def score_candidates(
    title_ft,  # i32 [Dp, Tt]  (-1 pad)
    title_fw,  # f32 [Dp, Tt]
    body_ft,
    body_fw,
    mag_title,  # f32 [Dp] (0 in pad rows)
    mag_body,
    pagerank,  # f32 [Dp, C]
    cat_doc_ids,  # i32 [P] title ++ body CSR doc ids (pad slots -> pad_doc)
    win_start,  # i32 [B, W]
    win_len,  # i32 [B, W]
    term_ids,  # i32 [B, Q]
    query_len,
    topic_probs,  # [B, C]
    *,
    topk: int,
    n_entries: int,
    n_block: int = 512,
):
    b, w = win_start.shape
    n = n_entries
    pad_doc = title_ft.shape[0] - 1  # all-pad forward row (mag 0, ft -1)
    cl = jnp.cumsum(win_len, axis=1)
    cl0 = jnp.concatenate([jnp.zeros((b, 1), jnp.int32), cl], axis=1)
    j = jnp.arange(n, dtype=jnp.int32)
    t_of = (j[None, :, None] >= cl[:, None, :]).sum(-1).astype(jnp.int32)
    valid = j[None, :] < cl[:, -1:]
    t_of_c = jnp.minimum(t_of, w - 1)
    local = j[None, :] - jnp.take_along_axis(cl0, t_of_c, axis=1)
    g = jnp.take_along_axis(win_start, t_of_c, axis=1) + local
    g = jnp.where(valid, g, cat_doc_ids.shape[0] - 1)
    cand = jnp.where(valid, cat_doc_ids[g], pad_doc)  # [B, N]
    cand = jnp.minimum(cand, pad_doc)

    m = n // n_block
    cand_b = cand.reshape(b, m, n_block).transpose(1, 0, 2)  # [M, B, Nb]

    def block(cb):  # [B, Nb]
        def section(ft, fw):
            f = ft[cb]  # [B, Nb, T]
            eq = f[..., None] == term_ids[:, None, None, :]  # [B,Nb,T,Q]
            mult = eq.sum(-1).astype(jnp.float32)
            sc = jnp.einsum("bnt,bnt->bn", mult, fw[cb])
            return sc, mult.sum(-1)

        ts, tc = section(title_ft, title_fw)
        bs, bc = section(body_ft, body_fw)
        qmag = jnp.sqrt(query_len)[:, None]
        tn = ts / (mag_title[cb] * qmag)
        bn = bs / (mag_body[cb] * qmag)
        tn = jnp.where(jnp.isnan(tn), 0.0, tn)
        bn = jnp.where(jnp.isnan(bn), 0.0, bn)
        sqd = jnp.einsum("bc,bnc->bn", topic_probs, pagerank[cb])
        final = (0.33 * sqd + 0.38 * tn + 0.29 * bn) * 100.0
        return jnp.where((tc + bc > 0) & (cb < pad_doc), final, -jnp.inf)

    scores = jax.lax.map(block, cand_b)  # [M, B, Nb]
    scores = scores.transpose(1, 0, 2).reshape(b, n)
    k_dup = min(topk * 2 * (term_ids.shape[1]), n)
    top_s, pos = exact_top_k(scores, k_dup)
    return top_s, jnp.take_along_axis(cand, pos, axis=1)


def host_dedup(scores, ids, k):
    """[B, k_dup] -> per-row unique docs, first k by (-score, doc)."""
    out_s = np.full((scores.shape[0], k), -np.inf, np.float32)
    out_i = np.zeros((scores.shape[0], k), np.int32)
    for r in range(scores.shape[0]):
        _, first = np.unique(ids[r], return_index=True)
        s, i = scores[r][first], ids[r][first]
        order = np.lexsort((i, -s))[:k]
        out_s[r, : len(order)] = s[order]
        out_i[r, : len(order)] = i[order]
    return out_s, out_i


def main():
    n_docs = 1_000_000
    n_words = 200_000
    batch = 256
    print("backend:", jax.default_backend())
    snap = synth_snapshot(
        n_docs=n_docs, n_words=n_words, body_terms_per_doc=48,
        title_terms_per_doc=4, max_df=32_768,
    )
    idx = DeviceIndex.from_snapshot(snap)
    rng = np.random.default_rng(1)
    df_b = np.diff(snap.body.post_offsets).astype(np.float64)
    p = df_b / df_b.sum()
    q = 4

    # combined CSR arrays: title ++ body
    t_ids, t_w = snap.title.doc_ids, snap.title.weights
    b_ids, b_w = snap.body.doc_ids, snap.body.weights
    cat_ids = jnp.asarray(np.concatenate([t_ids, b_ids]))
    cat_w = jnp.asarray(np.concatenate([t_w, b_w]))
    t_off = snap.title.post_offsets
    b_off = snap.body.post_offsets
    body_base = len(t_ids)

    terms = rng.choice(n_words, size=(batch, q), p=p).astype(np.int32)
    # host window construction
    ws = np.zeros((batch, 2 * q), np.int32)
    wl = np.zeros((batch, 2 * q), np.int32)
    ws[:, :q] = t_off[terms]
    wl[:, :q] = t_off[terms + 1] - t_off[terms]
    ws[:, q:] = b_off[terms] + body_base
    wl[:, q:] = b_off[terms + 1] - b_off[terms]
    mass = wl.sum(1)
    print("query mass: p50", np.percentile(mass, 50), "p90", np.percentile(mass, 90),
          "max", mass.max())
    for N in (8192, 16384, 32768, 65536, 131072):
        print(f"coverage N={N}: {(mass <= N).mean():.3f}")

    win_title = jnp.asarray(
        np.concatenate([np.ones(q, np.float32), np.zeros(q, np.float32)])
    )
    qlen = jnp.full((batch,), float(q), jnp.float32)
    tp = jnp.zeros((batch, 1), jnp.float32)

    # correctness check vs dense on a small eligible sub-batch
    use_pallas = pallas_available()
    small = np.where(mass <= 32768)[0][:64]
    tsub = jnp.asarray(terms[small])
    ds, di = score_queries_forward(
        idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body, idx.pagerank,
        tsub, qlen[: len(small)], tp[: len(small)], topk=10, use_pallas=use_pallas,
    )
    cs, ci = score_candidates(
        idx.title.ft, idx.title.fw, idx.body.ft, idx.body.fw,
        idx.mag_title, idx.mag_body, idx.pagerank, cat_ids,
        jnp.asarray(ws[small]), jnp.asarray(wl[small]), tsub,
        qlen[: len(small)], tp[: len(small)],
        topk=10, n_entries=32768,
    )
    ds, di, cs, ci = map(np.asarray, (ds, di, cs, ci))
    cs, ci = host_dedup(cs, ci, 10)
    ok_s = np.allclose(ds, cs, rtol=2e-5, atol=1e-6)
    fin = np.isfinite(ds)
    ok_i = (di == ci) | ~fin
    print("score match:", ok_s, "id match:", ok_i.all(),
          "max |ds-cs|:", np.abs(np.where(fin, ds - cs, 0)).max())

    # timing sweep
    for N in (16384, 32768, 65536, 131072):
        elig = np.where(mass <= N)[0]
        bb = (len(elig) // 8) * 8 or 8
        sub = elig[:bb]
        args = (
            idx.title.ft, idx.title.fw, idx.body.ft, idx.body.fw,
            idx.mag_title, idx.mag_body, idx.pagerank, cat_ids,
            jnp.asarray(ws[sub]), jnp.asarray(wl[sub]), jnp.asarray(terms[sub]),
            qlen[: len(sub)], tp[: len(sub)],
        )
        out = score_candidates(*args, topk=10, n_entries=N)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 20
        for _ in range(reps):
            out = score_candidates(*args, topk=10, n_entries=N)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"cand   N={N:6d} B={len(sub):3d}: {dt*1e3:8.2f} ms "
              f"({len(sub)/dt:9.0f} qps)")

    # dense baseline at several batch sizes
    for bsz in (32, 64, 256):
        tsub = jnp.asarray(terms[:bsz])
        args = (idx.title.fwd, idx.body.fwd, idx.mag_title, idx.mag_body,
                idx.pagerank, tsub, qlen[:bsz], tp[:bsz])
        out = score_queries_forward(*args, topk=10, use_pallas=use_pallas)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            out = score_queries_forward(*args, topk=10, use_pallas=use_pallas)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(f"dense B={bsz:3d}: {dt*1e3:8.2f} ms ({bsz/dt:9.0f} qps)")


if __name__ == "__main__":
    main()
