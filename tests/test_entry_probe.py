"""Hung-tunnel guards: device probing in __graft_entry__ and bench.

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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_probed_count_uses_initialized_backend(monkeypatch):
    """With a live backend (this test process), no subprocess spawns."""
    import __graft_entry__ as ge

    jax.devices()  # ensure the (virtual-CPU) backend is initialized

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("probe subprocess spawned despite live backend")

    monkeypatch.setattr(subprocess, "run", boom)
    assert ge._probed_device_count(8) == len(jax.devices())


def _fresh_probe(monkeypatch, fake_run):
    """Call _probed_device_count with the backend-cache check disabled
    (this test process has a live backend, which would short-circuit)."""
    import __graft_entry__ as ge

    monkeypatch.setattr(subprocess, "run", fake_run)

    # disable both short-circuits: make the bridge lookup report "no
    # backend initialized yet" and the platform config report "unset"
    class _Bridge:
        _backends = {}

    monkeypatch.setattr(jax._src, "xla_bridge", _Bridge)
    monkeypatch.setattr(ge, "_forced_platforms", lambda: "")
    return ge._probed_device_count(8)


def test_probed_count_short_circuits_on_forced_cpu(monkeypatch):
    """A process already forced to the CPU platform (the virtual-mesh
    re-exec child) must enumerate locally, not spawn a probe — the
    probe child would try the default platform and hang."""
    import __graft_entry__ as ge

    def boom(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("probe subprocess spawned despite cpu config")

    monkeypatch.setattr(subprocess, "run", boom)

    class _Bridge:
        _backends = {}

    monkeypatch.setattr(jax._src, "xla_bridge", _Bridge)
    # conftest forces jax_platforms=cpu in this process
    assert ge._forced_platforms().split(",")[0] == "cpu"
    assert ge._probed_device_count(8) == len(jax.devices())


def test_probed_count_timeout_routes_to_virtual(monkeypatch):
    def fake_run(*a, **k):
        raise subprocess.TimeoutExpired(cmd=a[0], timeout=k.get("timeout"))

    assert _fresh_probe(monkeypatch, fake_run) == 0


def test_probed_count_failure_routes_to_virtual(monkeypatch):
    def fake_run(*a, **k):
        return subprocess.CompletedProcess(a[0], 1, stdout="", stderr="boom")

    assert _fresh_probe(monkeypatch, fake_run) == 0


def test_probed_count_parses_child_count(monkeypatch):
    def fake_run(*a, **k):
        # stderr noise lines must not confuse the parse (stdout only)
        return subprocess.CompletedProcess(a[0], 0, stdout="4\n", stderr="")

    assert _fresh_probe(monkeypatch, fake_run) == 4


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
    assert "benchmarked on CPU" in r.stderr
