"""Persistent XLA compilation cache.

TPU compiles of the full training step take minutes in
remote-compile environments; the persistent cache makes every CLI
invocation after the first start instantly. Call before the first
``jit`` execution.
"""

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "AEIC_COMPILE_CACHE", os.path.expanduser("~/.cache/aeic_jax_cache"))


def enable_persistent_cache(cache_dir=DEFAULT_CACHE_DIR):
    """Turns on the JAX persistent compilation cache (best effort) and
    honors the ``AEIC_PLATFORM`` env override.

    ``AEIC_PLATFORM=cpu`` forces the CPU backend even when a
    sitecustomize module latched an accelerator platform at interpreter
    start (env vars are too late by then; ``jax.config.update`` works
    post-import).
    """
    platform = os.environ.get("AEIC_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as error:  # cache support varies by platform
        print(f"persistent compilation cache disabled: {error}")
