"""Persistent XLA compilation cache setup.

On the axon remote-TPU platform cold compiles of nontrivial flow graphs
take minutes and the in-process cache dies with the process; pointing
every entry point at one on-disk cache makes repeated bench/driver runs
warm. Call before the first compilation."""
from __future__ import annotations

import os

import jax


def enable_persistent_compilation_cache(
        path: str | None = None,
        min_compile_secs: float = 1.0) -> str | None:
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser("~/.jax_cache"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        return path
    except Exception:       # pragma: no cover - cache is best-effort
        return None
