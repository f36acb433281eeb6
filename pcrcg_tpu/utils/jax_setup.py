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

    # TPU-only: XLA:CPU AOT executables embed host CPU features (AVX512/
    # AMX flags); loading an entry produced on a different host SIGSEGVs
    # inside cache deserialization (observed: pytest crash at
    # compilation_cache.get_executable_and_time with "+prefer-no-gather
    # not supported on the host machine" warnings).  CPU compiles are
    # cheap; only the multi-minute TPU compiles need persistence.  The
    # env check avoids initializing the backend as a side effect.
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        return
    path = path or os.environ.get("PCRCG_JAX_CACHE", _DEFAULT_CACHE)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
