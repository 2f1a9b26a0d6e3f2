"""Hung-tunnel device probing shared by every driver entry point.

On this box the TPU is reached through a tunnel with outage windows
during which jax backend init HANGS rather than errors (observed
2026-08-17, 0.5-4h).  Anything that must always produce its artifact
(`bench.py`, `__graft_entry__.entry`, `dryrun_multichip`) probes device
init in a disposable subprocess first and falls back to the CPU
backend when the probe hangs or fails.

Two short-circuits keep healthy paths cheap and non-recursive:

* a backend already initialized in this process enumerates from cache;
* a process whose ``jax_platforms`` CONFIG is already forced to "cpu"
  initializes locally and deterministically — probing there would
  retry the (possibly dead) default platform, which is exactly the
  recursion trap the virtual-mesh re-exec child would fall into.

The gate reads ``jax.config.jax_platforms`` — NOT the ``JAX_PLATFORMS``
environment variable, which the axon TPU plugin documentedly ignores
(tests/conftest.py): trusting the env var would skip the probe while
jax still initializes the TPU backend.
"""

from __future__ import annotations

import os
import subprocess
import sys

#  Healthy init on this box is 20-40 s; during an outage the probe
#  burns its full timeout, so the default trades a wide safety margin
#  against delaying every degraded capture by that much.
_DEFAULT_TIMEOUT_S = 120


def forced_platforms() -> str:
    """The live jax_platforms config value ("" when unset)."""
    import jax

    try:
        return jax.config.jax_platforms or ""
    except Exception:
        return ""


def probed_device_count(timeout_s: int | None = None) -> int:
    """Device count via a timed subprocess; 0 when init hangs or fails.

    ``timeout_s`` defaults to $FS_DEVICE_PROBE_TIMEOUT (or the legacy
    BENCH_PROBE_TIMEOUT / DRYRUN_PROBE_TIMEOUT names), else 120 s.
    """
    import jax

    # Defensive: the initialized-backend cache is private and may move
    # across jax upgrades (advisor r2 low: device_probe.py:55).  Check
    # every known location WITHOUT calling anything that could
    # initialize a backend (jax.devices()/backends() would hang on a
    # dead tunnel — the exact failure this probe exists to route
    # around).  If no cache is found, fall through to the subprocess
    # probe: slower, but hang-safe and correct.
    backend_up = None
    for mod_attr in ("xla_bridge", "backends"):
        mod = getattr(getattr(jax, "_src", None), mod_attr, None)
        cache = getattr(mod, "_backends", None)
        if cache:
            backend_up = cache
            break
    if backend_up:
        return len(jax.devices())
    if forced_platforms().split(",")[0] == "cpu":
        return len(jax.devices())
    if timeout_s is None:
        timeout_s = int(
            os.environ.get("FS_DEVICE_PROBE_TIMEOUT")
            or os.environ.get("BENCH_PROBE_TIMEOUT")
            or os.environ.get("DRYRUN_PROBE_TIMEOUT")
            or _DEFAULT_TIMEOUT_S
        )
    try:
        r = _run_probe_subprocess(timeout_s)
        if r.returncode == 0:
            return int(r.stdout.strip().splitlines()[-1])
    except (subprocess.TimeoutExpired, ValueError, IndexError):
        pass
    return 0


def _run_probe_subprocess(timeout_s: int):
    """Split out so tests can stub the subprocess without touching
    the short-circuit logic."""
    return subprocess.run(
        [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
        timeout=timeout_s, capture_output=True, text=True,
    )


def fallback_to_cpu(reason: str) -> None:
    """Force the CPU backend for this process and its subprocesses."""
    import jax

    print(f"WARNING: {reason}; falling back to the CPU backend",
          file=sys.stderr)
    os.environ["JAX_PLATFORMS"] = "cpu"  # honored by non-axon plugins
    jax.config.update("jax_platforms", "cpu")
