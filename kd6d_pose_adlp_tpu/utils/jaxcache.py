"""Persistent XLA compilation cache.

The first compile of the full KD train step takes ~8 minutes through the
axon remote-compile tunnel; every fresh process paid it again. Enabling
jax's persistent cache stores serialized executables under the repo and
makes warm starts near-instant. Called by every CLI entry point.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def setup_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    path = cache_dir or os.environ.get("KD6D_JAX_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that takes noticeable compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass
