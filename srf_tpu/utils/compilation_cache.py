"""Persistent XLA compilation cache.

First compiles through the remote-attached TPU tunnel take minutes; the
persistent cache makes every subsequent process start instantly for already
-seen program shapes (one compile per bucket shape, then never again).
"""

import os

import jax

DEFAULT_CACHE_DIR = os.environ.get(
    "SRF_JAX_CACHE", os.path.expanduser("~/.cache/srf_tpu_xla")
)


def enable_compilation_cache(cache_dir=None, force=None):
    """No-op on CPU-only processes unless forced. XLA:CPU AOT executable
    deserialization is machine-feature-sensitive and has SEGFAULTED
    reading entries written moments earlier on the same machine
    (cpu_aot_loader "machine type ... doesn't match" -> SIGSEGV in
    backend.deserialize_executable). The cache's value is the
    minutes-long remote-TPU compiles; CPU compiles of this framework's
    programs are seconds, so the safe default is to skip.
    ``force=True`` (or SRF_JAX_CACHE_FORCE=1) overrides."""
    if force is None:
        force = os.environ.get("SRF_JAX_CACHE_FORCE") == "1"
    if not force:
        try:
            if jax.default_backend() == "cpu":
                return None
        except Exception:
            return None
    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (AttributeError, ValueError):
        pass
    return cache_dir
