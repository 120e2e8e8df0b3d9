"""Persistent XLA compilation cache (verified to work through the remote
TPU tunnel: a cold ~8-minute kernel compile drops to seconds on the next
process). Enabled by default from the CLI, bench and driver entry points."""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/rambl_xla")


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    try:
        os.makedirs(path or _DEFAULT_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # cache is an optimization; never fail startup over it
