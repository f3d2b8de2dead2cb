"""Persistent XLA compilation cache.

The full two-stage pipeline is a large XLA program (~150 convs + GRU scans);
first compile on a TPU chip is minutes. Enabling JAX's persistent cache makes
every later process start (CLI runs, benchmarks, tests on the same shapes)
reuse the compiled executable from disk.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"),
                            ".cache/voicefixer_tpu/xla_cache")


def enable(cache_dir: str | None = None):
    """Idempotently enable the persistent compilation cache."""
    import jax
    cache_dir = cache_dir or os.environ.get(
        "VOICEFIXER_TPU_XLA_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
