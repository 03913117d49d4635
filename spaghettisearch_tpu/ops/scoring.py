"""Batched query scoring: the flagship jit'd device program.

One XLA program replaces the reference's entire per-query goroutine pipeline
(reference: retrieval/main_retrieve.go:50-103 + get_metadata.go:16-77):

  gather postings for every (query, term)  ->  scatter-add per-doc weights
  ->  cosine-normalize by precomputed magnitudes  ->  blend with the
  topic-weighted PageRank score (MXU matmul)  ->  top-k.

Scoring semantics match the reference exactly:
- per-doc title/body score = sum of the [0] entries (normTF*idf) of the doc's
  postings across query terms (main_retrieve.go:62-78, 170-187)
- cosine: score /= magnitude * sqrt(query_len); NaN (0/0) -> 0 but +inf kept
  (get_metadata.go:53-66 only guards IsNaN)
- final = (0.33*sqd + 0.38*title + 0.29*body) * 100 (get_metadata.go:69);
  sqd = topic_probs . pagerank[d] — zero when the topic model is off, which
  is the reference's shipped behavior (main_retrieve.go:87-88)
- only candidate docs (appearing in >=1 postings row of >=1 query term, or
  matching a phrase) are ranked; non-candidates come back as -inf.

Postings are gathered with a static per-term cap: rows longer than the cap
contribute their first `posting_cap` entries per term. Callers pick the cap
from the snapshot's max_df so nothing is truncated (engine.py), keeping
result parity; capped multi-pass scoring is a planned optimization.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import SCORE_SCALE, W_BODY, W_PAGERANK, W_TITLE


def _gather_section(
    post_offsets: jax.Array,  # int32 [V+2] (sentinel empty row at V)
    doc_ids: jax.Array,  # int32 [P_pad], pad = n_docs
    weights: jax.Array,  # f32 [P_pad]
    term_ids: jax.Array,  # int32 [B, Q], pad = V (sentinel)
    posting_cap: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """-> (docs [B,Q,L], w [B,Q,L], valid [B,Q,L])"""
    start = post_offsets[term_ids]  # [B, Q]
    end = post_offsets[term_ids + 1]
    idx = start[..., None] + jnp.arange(posting_cap, dtype=jnp.int32)  # [B,Q,L]
    valid = idx < end[..., None]
    idx = jnp.where(valid, idx, doc_ids.shape[0] - 1)
    docs = doc_ids[idx]
    w = jnp.where(valid, weights[idx], 0.0)
    return docs, w, valid


def _scatter_scores(
    docs: jax.Array, w: jax.Array, valid: jax.Array, n_docs: int
) -> tuple[jax.Array, jax.Array]:
    """Scatter (weight, candidate-count) per doc. -> (scores [B,D], count [B,D])"""
    b = docs.shape[0]
    flat_docs = docs.reshape(b, -1)
    payload = jnp.stack(
        [w.reshape(b, -1), valid.reshape(b, -1).astype(w.dtype)], axis=-1
    )  # [B, QL, 2]
    acc = jnp.zeros((b, n_docs + 1, 2), dtype=w.dtype)
    acc = acc.at[jnp.arange(b)[:, None], flat_docs].add(
        payload, mode="drop", unique_indices=False
    )
    return acc[:, :n_docs, 0], acc[:, :n_docs, 1]


def score_dense(
    # section CSRs (device-resident)
    title_offsets: jax.Array,
    title_doc_ids: jax.Array,
    title_weights: jax.Array,
    body_offsets: jax.Array,
    body_doc_ids: jax.Array,
    body_weights: jax.Array,
    # doc-level arrays
    mag_title: jax.Array,  # f32 [D]
    mag_body: jax.Array,  # f32 [D]
    pagerank: jax.Array,  # f32 [D, C]
    # query batch
    term_ids: jax.Array,  # int32 [B, Q]
    query_len: jax.Array,  # f32 [B]
    topic_probs: jax.Array,  # f32 [B, C]
    # sparse phrase contributions (pad doc id = n_docs)
    phrase_doc_ids: jax.Array,  # int32 [B, E]
    phrase_title_w: jax.Array,  # f32 [B, E]
    phrase_body_w: jax.Array,  # f32 [B, E]
    phrase_flag: jax.Array,  # f32 [B, E]
    *,
    posting_cap: int,
    n_docs: int,
) -> jax.Array:
    """Dense final scores [B, D]; -inf for non-candidate docs.

    This is the shared core: the single-chip path tops-k the result; the
    doc-sharded path runs it per shard and merges per-shard top-k over ICI
    (parallel/sharded.py)."""
    b = term_ids.shape[0]
    brow = jnp.arange(b)[:, None]

    t_docs, t_w, t_valid = _gather_section(
        title_offsets, title_doc_ids, title_weights, term_ids, posting_cap
    )
    title_score, title_count = _scatter_scores(t_docs, t_w, t_valid, n_docs)

    b_docs, b_w, b_valid = _gather_section(
        body_offsets, body_doc_ids, body_weights, term_ids, posting_cap
    )
    body_score, body_count = _scatter_scores(b_docs, b_w, b_valid, n_docs)

    # fold in phrase matches (weights + candidacy)
    pacc = jnp.zeros((b, n_docs + 1, 3), dtype=title_score.dtype)
    pacc = pacc.at[brow, phrase_doc_ids].add(
        jnp.stack([phrase_title_w, phrase_body_w, phrase_flag], axis=-1), mode="drop"
    )
    title_score = title_score + pacc[:, :n_docs, 0]
    body_score = body_score + pacc[:, :n_docs, 1]
    count = title_count + body_count + pacc[:, :n_docs, 2]

    # cosine normalization; NaN (0/0) -> 0, +inf preserved
    qmag = jnp.sqrt(query_len)[:, None]  # [B, 1]
    title_n = title_score / (mag_title[None, :] * qmag)
    body_n = body_score / (mag_body[None, :] * qmag)
    title_n = jnp.where(jnp.isnan(title_n), 0.0, title_n)
    body_n = jnp.where(jnp.isnan(body_n), 0.0, body_n)

    # topic-sensitive importance (MXU): sqd[b,d] = topic_probs[b] . pagerank[d]
    sqd = jnp.dot(topic_probs, pagerank.T, preferred_element_type=jnp.float32)

    final = (W_PAGERANK * sqd + W_TITLE * title_n + W_BODY * body_n) * SCORE_SCALE
    return jnp.where(count > 0, final, -jnp.inf)


@partial(
    jax.jit,
    static_argnames=("posting_cap", "topk", "n_docs"),
)
def score_queries(
    # section CSRs (device-resident)
    title_offsets: jax.Array,
    title_doc_ids: jax.Array,
    title_weights: jax.Array,
    body_offsets: jax.Array,
    body_doc_ids: jax.Array,
    body_weights: jax.Array,
    # doc-level arrays
    mag_title: jax.Array,  # f32 [D]
    mag_body: jax.Array,  # f32 [D]
    pagerank: jax.Array,  # f32 [D, C]
    # query batch
    term_ids: jax.Array,  # int32 [B, Q]
    query_len: jax.Array,  # f32 [B]  (len(keywords)+len(phrase terms))
    topic_probs: jax.Array,  # f32 [B, C] (zeros when topic model disabled)
    # sparse phrase contributions (pad doc id = n_docs)
    phrase_doc_ids: jax.Array,  # int32 [B, E]
    phrase_title_w: jax.Array,  # f32 [B, E]
    phrase_body_w: jax.Array,  # f32 [B, E]
    phrase_flag: jax.Array,  # f32 [B, E] 1.0 for real phrase candidates
    *,
    posting_cap: int,
    topk: int,
    n_docs: int,
) -> tuple[jax.Array, jax.Array]:
    """-> (top scores [B, K] f32 with -inf for non-candidates, doc ids [B, K])"""
    final = score_dense(
        title_offsets, title_doc_ids, title_weights,
        body_offsets, body_doc_ids, body_weights,
        mag_title, mag_body, pagerank,
        term_ids, query_len, topic_probs,
        phrase_doc_ids, phrase_title_w, phrase_body_w, phrase_flag,
        posting_cap=posting_cap,
        n_docs=n_docs,
    )
    return jax.lax.top_k(final, topk)
