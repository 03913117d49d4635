"""Device-resident index: the snapshot's arrays placed in HBM with the
padding/sentinel layout the gather kernels expect."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..index.snapshot import IndexSnapshot, SectionCSR


def _round_up(n: int, m: int = 128) -> int:
    return max(((n + m - 1) // m) * m, m)


@dataclass
class DeviceSection:
    offsets: jax.Array  # int32 [V+2]; row V is the sentinel empty row
    doc_ids: jax.Array  # int32 [P_pad]
    weights: jax.Array  # f32 [P_pad]
    pos_offsets: jax.Array  # int32 [P_pad+1]
    positions: jax.Array  # f32 [L_pad]
    # doc-major view for the forward-membership keyword scorer
    ft: jax.Array  # int32 [D, T_pad], -1 padding
    fw: jax.Array  # f32 [D, T_pad]

    @classmethod
    def from_csr(cls, csr: SectionCSR, n_docs: int, device=None) -> "DeviceSection":
        put = lambda x: jax.device_put(x, device)  # noqa: E731
        # append sentinel row (empty range) for unknown/padded term ids
        offsets = np.concatenate([csr.post_offsets, csr.post_offsets[-1:]])
        ft, fw = csr.forward(n_docs)
        return cls(
            offsets=put(offsets.astype(np.int32)),
            doc_ids=put(csr.doc_ids),
            weights=put(csr.weights),
            pos_offsets=put(csr.pos_offsets),
            positions=put(csr.positions),
            ft=put(ft),
            fw=put(fw),
        )


@dataclass
class DeviceIndex:
    title: DeviceSection
    body: DeviceSection
    mag_title: jax.Array  # f32 [D]
    mag_body: jax.Array  # f32 [D]
    pagerank: jax.Array  # f32 [D, C] (C >= 1; zeros when no topics)
    n_docs: int
    n_words: int
    posting_cap: int  # covers max df across both sections
    pos_cap: int  # covers max positions per posting

    @classmethod
    def from_snapshot(cls, snap: IndexSnapshot, device=None) -> "DeviceIndex":
        put = lambda x: jax.device_put(x, device)  # noqa: E731
        if snap.pagerank is not None and snap.pagerank.shape[1] > 0:
            pr = snap.pagerank
        else:
            pr = np.zeros((snap.n_docs, 1), dtype=np.float32)
        posting_cap = _round_up(max(snap.title.max_df, snap.body.max_df, 1))
        pos_cap = _round_up(max(snap.title.max_positions, snap.body.max_positions, 1), 8)
        return cls(
            title=DeviceSection.from_csr(snap.title, snap.n_docs, device),
            body=DeviceSection.from_csr(snap.body, snap.n_docs, device),
            mag_title=put(snap.mag_title),
            mag_body=put(snap.mag_body),
            pagerank=put(pr),
            n_docs=snap.n_docs,
            n_words=snap.n_words,
            posting_cap=posting_cap,
            pos_cap=pos_cap,
        )

    @property
    def n_categories(self) -> int:
        return int(self.pagerank.shape[1])
