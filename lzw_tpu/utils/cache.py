"""Persistent XLA compilation cache setup.

The Pallas kernels take seconds to minutes to compile (the variable-flavor
decode kernel ~4.5 min via the remote compiler); the persistent cache brings
warm-process compiles down to sub-second.  Verified to work through the axon
relay.  Call once before the first jit; idempotent.
"""

from __future__ import annotations

import os
import pathlib

_DEFAULT_DIR = pathlib.Path(__file__).resolve().parents[2] / ".jax_cache"
_enabled = False


def enable_compilation_cache(cache_dir: str | os.PathLike | None = None):
    global _enabled
    if _enabled or os.environ.get("LZW_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    path = pathlib.Path(cache_dir or _DEFAULT_DIR)
    path.mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", str(path))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:
        pass  # older jax or restricted env: compile caching is best-effort
