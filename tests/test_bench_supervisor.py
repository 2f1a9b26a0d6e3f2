"""Crash-proof bench capture (VERDICT r3 #1).

The driver-facing bench is a supervisor around a checkpointing child:
a mid-run backend fault (the tunnel's observed FAILED_PRECONDITION
crashes) or a mid-run hang must never kill the artifact.  The
supervisor re-probes the device, resumes the child from the first
incomplete stage, falls back to the CPU backend after a second death,
and ALWAYS emits one parsed JSON line with backend/degraded/fault
fields and exit 0 (quick-mode regression failures excepted).

Faults are injected with the BENCH_FAULT_STAGE knob — a raise (or
sleep) inside a named stage, exactly where a JaxRuntimeError would
surface.  Each test runs the real bench in subprocesses on the pinned
CPU backend at tiny sizes.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

TINY = {
    "BENCH_CPU": "1",          # pin the CPU backend (not degraded)
    "BENCH_NQ": "256",
    "BENCH_NS": "256",
    "BENCH_CPU_NQ": "128",  # must be a multiple of the kernel tile
    "BENCH_SW_B": "32",
    "BENCH_BIG_NS": "0",
    "BENCH_HUGE_NS": "0",
    "BENCH_ZIPF_NS": "0",
    "BENCH_ENGLISH_NS": "0",
    "BENCH_ENGLISH_HUGE_NS": "0",
    "BENCH_SKIP_E2E": "1",
}


def _run_bench(tmp_path, extra_env, argv=()):
    env = {**os.environ, **TINY, **extra_env}
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = str(REPO)
    code = (
        "import sys\nfrom fandom_search_tpu import bench\n"
        f"sys.exit(bench.main({list(argv)!r}))\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=tmp_path,
    )
    line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
    return r, json.loads(line)


def test_transient_fault_recovers_and_completes(tmp_path):
    """Attempt 1 dies mid-run; the resumed attempt completes every
    remaining stage.  The line carries the fault but stays
    degraded=false: every recorded number ran on the original
    backend."""
    sentinel = tmp_path / "fault_fired"
    r, out = _run_bench(tmp_path, {
        "BENCH_FAULT_STAGE": "sw",
        "BENCH_FAULT_MODE": "once",
        "BENCH_FAULT_SENTINEL": str(sentinel),
    })
    assert r.returncode == 0, r.stderr[-3000:]
    assert out["metric"] == "shingle_pairs_per_sec"
    assert out["value"] > 0
    assert out["degraded"] is False
    assert out["backend"] == "cpu"
    assert out["fault"][0]["stage"] == "sw"
    assert out["fault"][0]["kind"] == "crash"
    assert sentinel.exists()
    details = json.loads((tmp_path / "bench_details.json").read_text())
    assert details["capture_complete"] is True
    done = details["stages_done"]
    # the faulted stage AND everything after it completed on resume
    for stage in ("kernel_engine", "kernel_exact", "cpu_oracle", "sw",
                  "sharded", "lsh", "bucketed_small"):
        assert stage in done, (stage, done)
    assert len(details["fault"]) == 1
    # no stale checkpoint left behind
    assert not (tmp_path / "bench_details.partial.json").exists()


def test_persistent_fault_finishes_on_cpu_fallback(tmp_path):
    """A stage that dies on every non-fallback attempt (the tpu_only
    fault mode models a sick backend): after two deaths the supervisor
    relaunches pinned to CPU and the capture still completes, flagged
    degraded with both faults recorded."""
    r, out = _run_bench(tmp_path, {
        "BENCH_FAULT_STAGE": "cpu_oracle",
        "BENCH_FAULT_MODE": "tpu_only",
    })
    assert r.returncode == 0, r.stderr[-3000:]
    assert out["value"] > 0
    assert out["degraded"] is True
    assert len(out["fault"]) == 2
    assert [f["attempt"] for f in out["fault"]] == [1, 2]
    details = json.loads((tmp_path / "bench_details.json").read_text())
    assert details["capture_complete"] is True
    assert "cpu_oracle" in details["stages_done"]
    # the pre-fault stages were NOT re-run on the fallback attempt
    assert details["stage_backends"]["kernel_engine"] == "cpu"


def test_watchdog_kills_hung_stage_then_resumes(tmp_path):
    """The tunnel's second failure mode is a silent hang, not a crash;
    the supervisor's output watchdog must reap it and resume.

    The injected hang sleeps ~forever, so the watchdog can be generous:
    45s (not the 8s a fast test would like) because a LEGITIMATE stage
    gap — an XLA compile while the whole suite loads the box — must not
    trip it and burn the resumed attempt into a degraded CPU fallback
    (observed flake at 8s under full-suite load)."""
    sentinel = tmp_path / "hang_fired"
    r, out = _run_bench(tmp_path, {
        "BENCH_FAULT_STAGE": "kernel_exact",
        "BENCH_FAULT_MODE": "hang_once",
        "BENCH_FAULT_SENTINEL": str(sentinel),
        "BENCH_WATCHDOG_S": "45",
    })
    assert r.returncode == 0, r.stderr[-3000:]
    assert out["value"] > 0
    assert out["degraded"] is False
    assert out["fault"][0]["kind"] == "watchdog_hang"
    details = json.loads((tmp_path / "bench_details.json").read_text())
    assert details["capture_complete"] is True
    assert "kernel_exact" in details["stages_done"]


def test_quick_regression_failure_propagates(tmp_path):
    """--quick still FAILS the process when the measured rate is below
    the recorded floor (the re-armed guard, VERDICT r3 weak #1) — the
    supervisor must not swallow a genuine regression verdict.  A tiny
    interpret-mode run is guaranteed to be under the recorded TPU
    floor."""
    expected = REPO / "fandom_search_tpu" / "bench_expected.json"
    assert json.loads(expected.read_text())[
        "kernel_engine_pairs_per_sec"] > 130e9
    r, out = _run_bench(tmp_path, {}, argv=["--quick"])
    assert r.returncode == 1, (r.returncode, r.stderr[-2000:])
    assert out["value"] > 0  # the line still emits, parsed, exit code 1
    assert "FAIL" in r.stderr


def test_supervisor_death_resumes_from_partial(tmp_path):
    """Fault mode ABOVE the supervisor (what a session/OOM kill looks
    like): a first supervision dies mid-capture leaving only the stage
    checkpoint; a second supervision with BENCH_RESUME=1 must carry
    every completed stage instead of re-capturing, and a fresh
    supervision WITHOUT the knob must discard the stale partial."""
    # run 1: crash in 'sharded' with mode=always -> all 3 attempts die,
    # supervisor emits an incomplete (degraded) line but the partial it
    # deletes afterward is the contract; simulate the harder case — the
    # SUPERVISOR itself killed — by capturing the partial mid-flight.
    # Simplest faithful setup: run the CHILD directly (BENCH_SUPERVISED)
    # and let it crash, leaving the partial exactly as a dead
    # supervision would.
    env = {"BENCH_SUPERVISED": "1",
           "BENCH_FAULT_STAGE": "sharded",
           "BENCH_FAULT_MODE": "always"}
    r1, _ = _run_bench(tmp_path, env)
    assert r1.returncode != 0
    partial = tmp_path / "bench_details.partial.json"
    assert partial.exists()
    done1 = json.loads(partial.read_text())["stages_done"]
    assert "sw" in done1 and "sharded" not in done1

    # run 2: resumed supervision completes, carrying the recorded stages
    r2, out = _run_bench(tmp_path, {"BENCH_RESUME": "1"})
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert out["value"] > 0
    assert "resuming from existing" in r2.stderr
    assert "[resume] skipping completed stage sw" in r2.stderr
    details = json.loads((tmp_path / "bench_details.json").read_text())
    assert details["capture_complete"] is True
    assert not partial.exists()

    # run 3: a fresh supervision (no knob) must NOT inherit a partial
    partial.write_text(json.dumps({"stages_done": ["kernel_engine"],
                                   "kernel_engine_pairs_per_sec": 1.0}))
    r3, out3 = _run_bench(tmp_path, {})
    assert r3.returncode == 0, r3.stderr[-3000:]
    assert "resuming" not in r3.stderr
    assert out3["value"] > 1.0  # re-measured, not the planted 1.0


def test_all_attempts_dead_keeps_partial_for_salvage(tmp_path):
    """When every attempt dies (fault also kills the CPU fallback) the
    stage checkpoint is the ONLY record of the completed stages: the
    supervisor must emit the incomplete line (degraded, exit 0) and
    KEEP the partial so BENCH_RESUME=1 can salvage the capture once
    the outage clears."""
    r1, out1 = _run_bench(tmp_path, {
        "BENCH_FAULT_STAGE": "sharded",
        "BENCH_FAULT_MODE": "always",
    })
    assert r1.returncode == 0, r1.stderr[-3000:]
    assert out1["degraded"] is True
    assert out1["value"] > 0  # pre-fault stages still carried
    partial = tmp_path / "bench_details.partial.json"
    assert partial.exists()
    done = json.loads(partial.read_text())["stages_done"]
    assert "sw" in done and "sharded" not in done

    # outage clears (fault knob removed): the salvage run completes
    # carrying every recorded stage
    r2, out2 = _run_bench(tmp_path, {"BENCH_RESUME": "1"})
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "[resume] skipping completed stage sw" in r2.stderr
    details = json.loads((tmp_path / "bench_details.json").read_text())
    assert details["capture_complete"] is True
    assert not partial.exists()


def test_salvaged_run_is_not_degraded(tmp_path):
    """ADVICE r4: a forced-CPU attempt that completes ZERO stages must
    not poison a later healthy salvage with degraded=true — degraded
    now flips only when a stage actually COMPLETES on the fallback
    backend."""
    r1, out1 = _run_bench(tmp_path, {
        "BENCH_FAULT_STAGE": "sharded",
        "BENCH_FAULT_MODE": "always",
    })
    assert r1.returncode == 0
    assert out1["degraded"] is True  # incomplete capture => degraded
    partial = tmp_path / "bench_details.partial.json"
    assert partial.exists()
    # attempt 3 ran BENCH_FORCED_CPU but its only new stage (sharded)
    # died before completing: the checkpoint must NOT carry the flag
    assert json.loads(partial.read_text()).get("degraded") is False

    r2, out2 = _run_bench(tmp_path, {"BENCH_RESUME": "1"})
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert out2["degraded"] is False
    details = json.loads((tmp_path / "bench_details.json").read_text())
    assert details["capture_complete"] is True
    assert details["degraded"] is False


def test_sigterm_emits_line_from_checkpoint(tmp_path):
    """VERDICT r4 #1 (the three-dead-rounds fix): the driver enforces
    its budget with `timeout`, which SIGTERMs the supervisor itself.
    A SIGTERM'd supervisor must reap the child and still print the
    parsed driver line — from the stage checkpoint — and exit 0."""
    import signal as _signal
    import time as _time

    env = {**os.environ, **TINY,
           "BENCH_FAULT_STAGE": "lsh",
           "BENCH_FAULT_MODE": "hang_once",
           "BENCH_FAULT_SENTINEL": str(tmp_path / "hang_fired"),
           "PYTHONPATH": str(REPO)}
    env.pop("JAX_PLATFORMS", None)
    code = ("import sys\nfrom fandom_search_tpu import bench\n"
            "sys.exit(bench.main([]))\n")
    proc = subprocess.Popen(
        [sys.executable, "-c", code], cwd=tmp_path, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    partial = tmp_path / "bench_details.partial.json"
    deadline = _time.monotonic() + 240
    while _time.monotonic() < deadline:
        if partial.exists():
            try:
                det = json.loads(partial.read_text())
            except ValueError:
                det = {}
            if det.get("stage_started") == "lsh":
                break
        _time.sleep(0.5)
    else:
        proc.kill()
        raise AssertionError("child never reached the hung lsh stage")
    _time.sleep(1.0)  # let the child settle into the injected hang
    proc.send_signal(_signal.SIGTERM)
    out, err = proc.communicate(timeout=60)
    assert proc.returncode == 0, err[-3000:]
    line = json.loads(out.strip().splitlines()[-1])
    assert line["metric"] == "shingle_pairs_per_sec"
    assert line["value"] > 0          # kernel stage was checkpointed
    assert line["degraded"] is True   # incomplete capture
    kinds = [f.get("kind") for f in line["fault"]]
    assert "supervisor_killed" in kinds
    # the checkpoint survives for BENCH_RESUME salvage
    assert partial.exists()


def test_time_budget_skips_optional_and_snapshots(tmp_path):
    """VERDICT r4 #1b/#2: a blown time budget skips OPTIONAL stages
    (recorded in stages_skipped_for_time) but still completes the
    capture — and a healthy completed capture writes the durable
    per-round snapshot bench_details_rNN.json mechanically."""
    r, out = _run_bench(tmp_path, {
        "BENCH_BIG_NS": "2048",          # give the budget a victim
        "BENCH_TIME_BUDGET_S": "1",      # any elapsed blows it
        "BENCH_SNAPSHOT": "1",
        "BENCH_ROUND": "99",
    })
    assert r.returncode == 0, r.stderr[-3000:]
    assert out["value"] > 0
    assert out["degraded"] is False      # skipping is not degradation
    details = json.loads((tmp_path / "bench_details.json").read_text())
    assert details["capture_complete"] is True
    assert "bucketed_big" in details["stages_skipped_for_time"]
    assert "bucketed_big" not in details["stages_done"]
    # per-stage seconds recorded for every stage that DID run
    assert details["stage_seconds"]["kernel_engine"] >= 0
    snap = tmp_path / "bench_details_r99.json"
    assert snap.exists()
    assert json.loads(snap.read_text())["capture_complete"] is True


def test_stale_partial_archived_not_destroyed(tmp_path):
    """VERDICT r4 #2: a fresh supervision must not inherit a stale
    checkpoint — but must not unlink it either (the r04 post-fix
    capture lived ONLY in the partial a later --quick run deleted).
    It is renamed aside with a timestamp."""
    partial = tmp_path / "bench_details.partial.json"
    planted = {"stages_done": ["kernel_engine"],
               "kernel_engine_pairs_per_sec": 1.0}
    partial.write_text(json.dumps(planted))
    r, out = _run_bench(tmp_path, {})
    assert r.returncode == 0, r.stderr[-3000:]
    assert out["value"] > 1.0  # re-measured, not the planted 1.0
    archives = list(tmp_path.glob("bench_details.partial.stale-*.json"))
    assert len(archives) == 1
    assert json.loads(archives[0].read_text()) == planted


def test_snapshot_path_versions_instead_of_clobbering(tmp_path, monkeypatch):
    """A later same-round capture must not overwrite an earlier
    committed snapshot (the driver's budget-skipped end-of-round run
    vs the builder's fuller capture) — it versions with a letter."""
    from fandom_search_tpu import bench

    monkeypatch.chdir(tmp_path)
    monkeypatch.setenv("BENCH_ROUND", "07")
    p1 = bench._snapshot_path()
    assert p1.name == "bench_details_r07.json"
    p1.write_text("{}")
    p2 = bench._snapshot_path()
    assert p2.name == "bench_details_r07b.json"
    p2.write_text("{}")
    assert bench._snapshot_path().name == "bench_details_r07c.json"
    monkeypatch.delenv("BENCH_ROUND")
    # round inferred from committed driver artifacts: max + 1
    (tmp_path / "BENCH_r04.json").write_text("{}")
    assert bench._snapshot_path().name == "bench_details_r05.json"


def test_skew_recall_accounting_is_identity_not_score_multiset():
    """VERDICT r4 #4a regression: a guaranteed entry whose score ties
    a <=1-match noise entry in the exact top-k must NOT be charged as
    a miss when the hybrid returned it (the pre-r5 score-multiset
    accounting recorded exactly that as the 0.99965 'guarantee leak'
    at 2^22 — all 20 forensic post-mortems showed the entry present)."""
    import numpy as np

    from fandom_search_tpu.bench import skew_recall_accounting

    dim, thr, n = 128, 3.5, 6
    # one query; exact top-k: guaranteed si=5 at 448/128, noise twin
    # si=9 at the SAME 448/128 score, plus si=7 at 472/128
    evn = np.array([[472 / dim, 448 / dim, 448 / dim]], np.float32)
    ein = np.array([[7, 9, 5]], np.int32)  # noise twin ranked first
    # hybrid returned the guaranteed si=5 (and si=7), NOT the noise 9
    got = {0: {(5, 448), (7, 472)}}
    q_wh = np.zeros((1, n), np.uint32)
    sw_h = np.zeros((10, n), np.uint32)
    q_wh[0] = [1, 2, 3, 4, 5, 6]
    sw_h[5] = [1, 2, 99, 98, 97, 96]   # shares 2 positions: guaranteed
    sw_h[7] = [1, 2, 3, 90, 91, 92]    # shares 3: guaranteed
    sw_h[9] = [1, 80, 81, 82, 83, 84]  # shares 1: embedding noise
    tot, hit, g_tot, g_hit = skew_recall_accounting(
        evn, ein, got, q_wh, sw_h, stride=1, thr=thr, dim=dim,
        guarantee_min=2,
    )
    assert (tot, g_tot) == (3, 2)
    assert g_hit == 2, "guaranteed entry aliased away by a score tie"
    assert hit == 2  # the absent noise twin is the only miss
