"""Persistent XLA compilation cache setup.

Frame-function compiles are minutes; caching them across processes is the
analog of the reference shipping precompiled SPIR-V. The JAX env var alone
is not honored by every install, so set the config explicitly.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/sc_tpu_jax")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return path
