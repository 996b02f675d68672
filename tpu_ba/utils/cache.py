"""Persistent XLA compilation cache.

The sandbox's remote TPU compile service can take minutes for the large
LM while_loop program; the persistent cache makes every re-run (and the
driver's bench run) hit a local serialized executable instead.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    if path is None:
        path = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                            ".jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: caching is best-effort
