"""Persistent XLA compile cache setup shared by the CLI entry points.

First compiles on the tunneled TPU backend cost tens of seconds; the
persistent cache makes every later process start warm (the reference's
equivalent cost — FPGA bitstream load at boot, c/main.cpp:14-38 — is
paid once per power-up too).
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> None:
    """Enable jax's on-disk compilation cache (idempotent), plus the
    exported-program cache (utils.progcache) that removes the remaining
    per-process trace+load cost from the hot-path programs."""
    import jax
    cache_dir = (path or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or os.path.expanduser("~/.jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from . import progcache
    progcache.enable(os.path.join(cache_dir, "exported"))
