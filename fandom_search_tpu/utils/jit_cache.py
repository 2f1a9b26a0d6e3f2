"""Persistent XLA compilation cache setup.

The engine compiles one fused program per stream bucket
(search/engine.py _batches); on a remote-compile TPU tunnel each
compile can cost tens of seconds.  Enabling JAX's persistent cache
amortizes that across processes — the second `fandomsearch search`
run pays zero compile time.  Shared by the CLI and the bench harness.
"""

from __future__ import annotations

import logging
import os
import tempfile
from pathlib import Path

log = logging.getLogger(__name__)


def _fallback_cache_dir() -> Path | None:
    """Per-user, mode-0700 tempdir cache — mirrors
    fast_tokenizer._build_dir(): a fixed world-writable /tmp path would
    let another local user pre-plant serialized executables that jax
    deserializes and runs.  Returns None (cache disabled) if a
    non-owned directory squats the path.
    """
    uid = os.getuid() if hasattr(os, "getuid") else 0
    cache = Path(tempfile.gettempdir()) / f"fandom_search_tpu_jax_cache_{uid}"
    cache.mkdir(parents=True, exist_ok=True, mode=0o700)
    if hasattr(os, "getuid") and cache.stat().st_uid != os.getuid():
        log.warning(
            "jit cache dir %s is not owned by this user; persistent "
            "compilation cache disabled", cache,
        )
        return None
    return cache


def enable_persistent_cache(preferred: Path | None = None) -> Path | None:
    """Point jax at an on-disk compilation cache; returns its path
    (None if no safe location exists — cache left disabled).

    Must run before the first jit compilation (jax may already be
    imported).  Falls back to a per-user tempdir when the preferred
    location is not writable (e.g. installed read-only).
    """
    import jax

    cache = preferred
    if cache is None:
        env = os.environ.get("FANDOMSEARCH_JIT_CACHE")
        cache = Path(env) if env else _fallback_cache_dir()
    else:
        try:
            cache.mkdir(parents=True, exist_ok=True)
        except OSError:
            cache = _fallback_cache_dir()
    if cache is None:
        return None
    try:
        cache.mkdir(parents=True, exist_ok=True)
    except OSError:
        cache = _fallback_cache_dir()
        if cache is None:
            return None
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache
