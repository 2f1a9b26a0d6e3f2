"""Persistent XLA compilation cache setup.

The engine compiles one fused program per stream bucket
(search/engine.py _batches); on a remote-compile TPU tunnel each
compile can cost tens of seconds.  Enabling JAX's persistent cache
amortizes that across processes — the second `fandomsearch search`
run pays zero compile time.  Shared by the CLI and the bench harness.
"""

from __future__ import annotations

import os
import tempfile
from pathlib import Path


def enable_persistent_cache(preferred: Path | None = None) -> Path:
    """Point jax at an on-disk compilation cache; returns its path.

    Must run before the first jit compilation (jax may already be
    imported).  Falls back to a tempdir when the preferred location is
    not writable (e.g. installed read-only).
    """
    import jax

    cache = preferred
    if cache is None:
        env = os.environ.get("FANDOMSEARCH_JIT_CACHE")
        cache = (
            Path(env) if env
            else Path(tempfile.gettempdir()) / "fandom_search_tpu_jax_cache"
        )
    try:
        cache.mkdir(parents=True, exist_ok=True)
    except OSError:
        cache = Path(tempfile.gettempdir()) / "fandom_search_tpu_jax_cache"
        cache.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache
