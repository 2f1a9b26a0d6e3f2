"""Hung-tunnel guards: the shared device probe and its driver entries.

The axon tunnel has outage windows during which jax backend init hangs
forever instead of erroring (observed 2026-08-17).  The driver entry
points must route around a dead tunnel rather than wedge: the dry run
falls back to the virtual CPU mesh, the bench to a degraded CPU
capture.  These tests stub the probe subprocess — a real hang can't be
simulated portably.
"""

import os
import subprocess
import sys

import jax

from fandom_search_tpu.utils import device_probe

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _boom(*a, **k):  # pragma: no cover - must not be reached
    raise AssertionError("probe subprocess spawned despite short-circuit")


def test_probe_uses_initialized_backend(monkeypatch):
    """With a live backend (this test process), no subprocess spawns."""
    jax.devices()  # ensure the (virtual-CPU) backend is initialized
    monkeypatch.setattr(device_probe, "_run_probe_subprocess", _boom)
    assert device_probe.probed_device_count() == len(jax.devices())


def test_probe_short_circuits_on_forced_cpu(monkeypatch):
    """A process already forced to the CPU platform (the virtual-mesh
    re-exec child) must enumerate locally, not spawn a probe — the
    probe child would try the default platform and hang."""
    monkeypatch.setattr(device_probe, "_run_probe_subprocess", _boom)

    class _Bridge:
        _backends = {}

    monkeypatch.setattr(jax._src, "xla_bridge", _Bridge)
    # conftest forces jax_platforms=cpu in this process
    assert device_probe.forced_platforms().split(",")[0] == "cpu"
    assert device_probe.probed_device_count() == len(jax.devices())


def _fresh_probe(monkeypatch, fake_probe):
    """Call probed_device_count with both short-circuits disabled (this
    test process has a live backend and a cpu config, which would
    short-circuit)."""
    monkeypatch.setattr(device_probe, "_run_probe_subprocess", fake_probe)
    monkeypatch.setattr(device_probe, "forced_platforms", lambda: "")

    class _Bridge:
        _backends = {}

    monkeypatch.setattr(jax._src, "xla_bridge", _Bridge)
    return device_probe.probed_device_count()


def test_probe_timeout_reports_zero(monkeypatch):
    def fake(timeout_s):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=timeout_s)

    assert _fresh_probe(monkeypatch, fake) == 0


def test_probe_failure_reports_zero(monkeypatch):
    def fake(timeout_s):
        return subprocess.CompletedProcess("probe", 1, stdout="", stderr="x")

    assert _fresh_probe(monkeypatch, fake) == 0


def test_probe_parses_child_count(monkeypatch):
    def fake(timeout_s):
        return subprocess.CompletedProcess("probe", 0, stdout="4\n", stderr="")

    assert _fresh_probe(monkeypatch, fake) == 4


def test_graft_entry_routes_zero_to_virtual(monkeypatch):
    """__graft_entry__._probed_device_count delegates to the shared
    probe (0 -> dryrun_multichip takes the virtual-mesh path)."""
    import __graft_entry__ as ge

    monkeypatch.setattr(
        device_probe, "probed_device_count", lambda *a, **k: 0
    )
    assert ge._probed_device_count(8) == 0


def test_bench_quick_cpu_fallback_emits_json():
    """bench --quick on a hung tunnel must still print one JSON line
    and exit 0 (no regression compare against TPU-recorded rates)."""
    env = dict(
        BENCH_PROBE_TIMEOUT="1",
        BENCH_NQ="256",
        BENCH_NS="256",
        BENCH_CPU_NQ="64",
    )
    code = (
        "import subprocess, sys, json\n"
        "def hang(*a, **k):\n"
        "    raise subprocess.TimeoutExpired(cmd=a[0], timeout=1)\n"
        "subprocess.run = hang\n"
        "from fandom_search_tpu import bench\n"
        "sys.exit(bench.main(['--quick']))\n"
    )
    full_env = {**os.environ, **env}
    full_env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=600, env=full_env,
        cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    out = __import__("json").loads(line)
    assert out["metric"] == "shingle_pairs_per_sec"
    assert out["value"] > 0
    # degraded captures must be self-identifying IN THE PARSED LINE
    # (VERDICT r2 #2) — not just in stderr/details
    assert out["degraded"] is True
    assert out["backend"] == "cpu"
    assert "falling back to the CPU backend" in r.stderr


def test_bench_forced_degraded_flags_driver_line():
    """BENCH_FORCE_DEGRADED simulates an outage without stubbing
    subprocess: the driver line must carry backend=cpu, degraded=true."""
    env = dict(
        BENCH_FORCE_DEGRADED="1",
        BENCH_NQ="256",
        BENCH_NS="256",
        BENCH_CPU_NQ="64",
    )
    full_env = {**os.environ, **env}
    full_env.pop("JAX_PLATFORMS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys\nfrom fandom_search_tpu import bench\n"
         "sys.exit(bench.main(['--quick']))\n"],
        capture_output=True, text=True, timeout=600, env=full_env,
        cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = __import__("json").loads(r.stdout.strip().splitlines()[-1])
    assert out["degraded"] is True
    assert out["backend"] == "cpu"


def test_cli_ensure_backend_falls_back(monkeypatch):
    """The user-facing CLI commands must probe device init and fall
    back to CPU instead of hanging forever on a dead tunnel (the
    bench/entry outage-proofing, extended to search/index/serve)."""
    import argparse

    from fandom_search_tpu import cli
    from fandom_search_tpu.utils import device_probe

    calls = []
    monkeypatch.setattr(device_probe, "probed_device_count", lambda: 0)
    monkeypatch.setattr(
        device_probe, "fallback_to_cpu",
        lambda reason: calls.append(reason),
    )
    args = argparse.Namespace(cpu=False, multihost=False)
    cli._ensure_backend(args)
    assert calls  # a hung probe routed to the CPU fallback

    # --cpu pins the backend: no probe, no fallback
    calls.clear()
    monkeypatch.setattr(
        device_probe, "probed_device_count",
        lambda: (_ for _ in ()).throw(AssertionError("probed under --cpu")),
    )
    cli._ensure_backend(argparse.Namespace(cpu=True, multihost=False))
    assert not calls
