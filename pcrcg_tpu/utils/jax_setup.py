"""Process-level JAX setup helpers.

The full pipeline (pyramid searches + 17-block KPFCNN + RANSAC) is a large
XLA program; per-op TPU compile dominates cold-start (~5-8 s per distinct
top_k/argsort call site, measured on v5e).  The persistent compilation
cache turns that into a one-time cost per machine.
"""
from __future__ import annotations

import os

_DEFAULT_CACHE = os.path.expanduser("~/.cache/pcrcg_tpu_jax")


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get("PCRCG_JAX_CACHE", _DEFAULT_CACHE)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
