"""Process-level JAX setup: persistent compilation cache.

The axon TPU platform compiles large jitted graphs (especially while_loop
decode bodies) very slowly over the tunnel; the persistent cache makes every
subsequent process start warm. Call ``setup_jax()`` before the first jit.
"""
from __future__ import annotations

import os


def setup_jax(cache_dir: str = None) -> None:
    import jax

    # BMHRL_PLATFORM=cpu (or tpu/axon/...) pins the backend PROGRAMMATICALLY.
    # Needed because platform plugins may set jax_platforms at interpreter
    # startup (e.g. to "axon,cpu"), after which the JAX_PLATFORMS /
    # JAX_PLATFORM_NAME env vars are silently ignored — and if the pinned
    # accelerator is unreachable, even CPU-intended CLI runs die in backend
    # init instead of falling back.
    plat = os.environ.get("BMHRL_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    cache_dir = cache_dir or os.environ.get(
        "BMHRL_JAX_CACHE", os.path.expanduser("~/.cache/bmhrl_jax"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax or read-only fs: run without the cache
