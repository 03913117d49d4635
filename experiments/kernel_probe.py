"""Probe alternative TPU formulations of batched keyword scoring.

The scatter-add formulation serializes on TPU (~3.4 s per 256-query batch on
100k docs). Candidates:

  A  scatter-add into [B, D]            (baseline, known slow)
  B  forward-index membership:          score[b,d] = sum_j fw[d,j] *
                                        any_q(ft[d,j] == tq[b,q])
                                        — dense compare/reduce, no scatter
  C  per-(b,q) CSR row expansion via scatter with unique+sorted flags,
     then sum over q
  D  top_k alone (fixed cost floor)

Usage: python experiments/kernel_probe.py [variant ...]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import synth_snapshot
    from spaghettisearch_tpu.retrieval.device_index import DeviceIndex

    n_docs, n_words = 100_000, 50_000
    b, q, topk = 256, 4, 10
    t_doc = 64  # forward-index terms per doc

    snap = synth_snapshot(n_docs=n_docs, n_words=n_words, body_terms_per_doc=t_doc)
    idx = DeviceIndex.from_snapshot(snap)
    cap = idx.posting_cap

    rng = np.random.default_rng(1)
    df = (snap.body.post_offsets[1:] - snap.body.post_offsets[:-1]).astype(np.float64)
    p = df / df.sum()
    tq = jnp.asarray(rng.choice(n_words, size=(b, q), p=p).astype(np.int32))

    # forward index from the CSR (body only, for the probe)
    csr = snap.body
    n_post = csr.n_postings
    word_of_post = np.repeat(
        np.arange(n_words, dtype=np.int32), np.diff(csr.post_offsets)
    )
    ft = np.full((n_docs, t_doc), -1, np.int32)
    fw = np.zeros((n_docs, t_doc), np.float32)
    slot = np.zeros(n_docs, np.int32)
    docs_np = csr.doc_ids[:n_post]
    for j in range(n_post):  # host-side build; fine for a probe
        d = docs_np[j]
        s = slot[d]
        if s < t_doc:
            ft[d, s] = word_of_post[j]
            fw[d, s] = csr.weights[j]
            slot[d] = s + 1
    ft_d = jax.device_put(ft)
    fw_d = jax.device_put(fw)

    def timeit(name, fn, *args, reps=3):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])  # sync incl. compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        for o in jax.tree.leaves(out):
            np.asarray(o)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:32s} {dt*1e3:9.2f} ms/batch  -> {b/dt:9.0f} qps", flush=True)
        return dt

    variants = sys.argv[1:] or ["B", "C", "D", "A"]

    # ---- B: forward membership ----
    @jax.jit
    def fwd(tq):
        def block_scores(ft_blk, fw_blk):
            m = ft_blk[None, :, :, None] == tq[:, None, None, :]  # B,Db,T,Q
            anyq = m.any(-1)
            score = jnp.einsum("bdt,dt->bd", anyq.astype(jnp.float32), fw_blk)
            count = anyq.sum(-1).astype(jnp.float32)
            return score, count

        n_blocks = 16
        db = n_docs // n_blocks
        ftb = ft_d[: n_blocks * db].reshape(n_blocks, db, t_doc)
        fwb = fw_d[: n_blocks * db].reshape(n_blocks, db, t_doc)
        score, count = jax.lax.map(lambda ab: block_scores(*ab), (ftb, fwb))
        score = jnp.moveaxis(score, 0, 1).reshape(b, -1)
        count = jnp.moveaxis(count, 0, 1).reshape(b, -1)
        final = jnp.where(count > 0, score, -jnp.inf)
        return jax.lax.top_k(final, topk)

    # ---- C: unique/sorted expansion scatter ----
    @jax.jit
    def expansion(tq):
        start = idx.body.offsets[tq]
        end = idx.body.offsets[tq + 1]
        j = start[..., None] + jnp.arange(cap, dtype=jnp.int32)
        valid = j < end[..., None]
        j = jnp.where(valid, j, idx.body.doc_ids.shape[0] - 1)
        docs = idx.body.doc_ids[j].reshape(b * q, cap)
        w = jnp.where(valid, idx.body.weights[j], 0.0).reshape(b * q, cap)
        rows = jnp.arange(b * q)[:, None]
        s = jnp.zeros((b * q, n_docs + 1), jnp.float32)
        s = s.at[rows, docs].add(
            w, mode="drop", unique_indices=True, indices_are_sorted=True
        )
        score = s[:, :n_docs].reshape(b, q, n_docs).sum(1)
        return jax.lax.top_k(score, topk)

    # ---- D: top_k alone ----
    x = jnp.asarray(rng.normal(size=(b, n_docs)).astype(np.float32))

    @jax.jit
    def topk_only(x):
        return jax.lax.top_k(x, topk)

    # ---- A: baseline scatter ----
    from spaghettisearch_tpu.ops.scoring import score_queries

    qlen = jnp.full((b,), float(q), jnp.float32)
    tp = jnp.zeros((b, 1), jnp.float32)
    e = 8
    phd = jnp.full((b, e), n_docs, jnp.int32)
    phz = jnp.zeros((b, e), jnp.float32)

    def baseline(tq):
        return score_queries(
            idx.title.offsets, idx.title.doc_ids, idx.title.weights,
            idx.body.offsets, idx.body.doc_ids, idx.body.weights,
            idx.mag_title, idx.mag_body, idx.pagerank,
            tq, qlen, tp, phd, phz, phz, phz,
            posting_cap=cap, topk=topk, n_docs=n_docs,
        )

    for v in variants:
        if v == "B":
            timeit("B forward-membership", fwd, tq)
        elif v == "C":
            timeit("C expansion-scatter", expansion, tq)
        elif v == "D":
            timeit("D top_k only", topk_only, x)
        elif v == "A":
            timeit("A baseline scatter", baseline, tq, reps=1)


if __name__ == "__main__":
    main()
