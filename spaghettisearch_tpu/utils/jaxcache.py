"""Persistent XLA compilation cache.

Every jit shape compiles through PJRT (in this deployment, via a remote-TPU
tunnel where a single program can take tens of seconds). The cache is
content-addressed on (HLO, compile options, platform), so re-crawls, server
restarts, and repeated benches reuse programs across processes. Enabled by
the CLI entry points; set SPAGHETTI_JAX_CACHE=0 to disable or =<dir> to
relocate.
"""

from __future__ import annotations

import os


def enable_persistent_cache(default_dir: str | None = None) -> str | None:
    env = os.environ.get("SPAGHETTI_JAX_CACHE", "")
    if env == "0":
        return None
    path = env or default_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "spaghettisearch_jax"
    )
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        return None
    return path
