"""Device mesh construction helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    """1-D mesh over the doc-shard axis (postings + graph sharded over ICI)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))
