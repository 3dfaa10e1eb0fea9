"""Small JAX runtime helpers."""
from __future__ import annotations

import os


def enable_persistent_compilation_cache(path: str = "") -> None:
    """Turn on JAX's on-disk compilation cache.  First-compile latency on TPU
    (especially through a remote-compile service) dominates cold starts of the
    SLAM pipeline; the cache makes repeat runs start in seconds."""
    import jax
    path = path or os.environ.get("DIFUSION_JAX_CACHE",
                                  os.path.expanduser("~/.cache/difusion_jax"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # persist EVERYTHING: on a remote-compile transport even sub-second
        # compiles cost seconds of round trip, and the incremental mesher's
        # small bucketed programs (slices/packs per size) were re-compiled
        # every run because they fell under the default 1 s threshold
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:   # cache is an optimization; never fail the run for it
        pass
