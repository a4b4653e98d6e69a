"""Common JAX runtime setup for CLI entry points."""
from __future__ import annotations

import os


def respect_platform_env():
    """Make JAX_PLATFORMS effective even when a sitecustomize pre-registered
    a TPU PJRT plugin (it may override the env var before our entry point
    runs). Must be called before any backend initializes."""
    plat = os.environ.get("JAX_PLATFORMS_OVERRIDE") or os.environ.get(
        "FOURDGS_PLATFORM")
    if not plat:
        return
    import jax

    jax.config.update("jax_platforms", plat)


def enable_compilation_cache(path: str | None = None):
    """Persistent compilation cache: recompiles of identical programs
    (re-runs, stage restarts, bucket revisits) load from disk instead of
    recompiling — significant when compiles route through a remote-compile
    tunnel taking minutes."""
    import jax

    cache_dir = path or os.path.expanduser("~/.cache/fourdgs_jax")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # pragma: no cover - best effort
        print(f"compilation cache unavailable: {e}")
