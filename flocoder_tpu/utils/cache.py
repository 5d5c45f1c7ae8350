"""Persistent XLA compilation cache setup.

The single-chip tunnel backend pays 60-260 s per U-Net/codec compile; the
persistent cache makes every process after the first start in seconds. Called
by the training scripts and bench at startup; harmless everywhere else."""
from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]


def enable_compilation_cache(cache_dir: str = "~/.cache/flocoder_tpu_xla"
                             ) -> str:
    import jax
    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    return path
