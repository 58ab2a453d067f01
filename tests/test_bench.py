"""Driver-facing bench.py contract tests.

1. A bounded run killed by SIGTERM before ANY measurement still yields one
   parseable JSON error line (exit code 3, the signal-kill contract; the
   tunnel watchdog uses exit 2).
2. A run whose wall-clock budget expires after the headline (simulated via
   NPS_BENCH_BUDGET_S=0 on tiny shapes) still prints a complete result line
   with a non-null headline value and ``extra.truncated="budget"``.

The SIGTERM send is gated on bench.py's ``bench-reporter-armed`` stderr
line (ADVICE r3: a wall-clock sleep races import timing), and the reporter
uses a sigwait watchdog thread so the kill is honored even while the main
thread is blocked in a C call.
"""

import json
import os
import signal
import subprocess
import sys
import time


def _hermetic_env(tmp_path):
    env = dict(os.environ)
    # hermetic: keep the subprocess off the TPU tunnel (verify-skill recipe)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    # ... and off the REAL chip lock: even though an off-tunnel bench run
    # skips holder preemption entirely, keep the child pointed at a
    # pytest-managed temp path so no configuration drift can ever reach
    # the production lock. NPS_CHIP_LOCK no longer opts in to eviction
    # (that is NPS_BENCH_FORCE_PREEMPT, see test_chip_lock.py).
    env["NPS_CHIP_LOCK"] = str(tmp_path / "chip.lock")
    env.pop("NPS_BENCH_FORCE_PREEMPT", None)
    return env


def _wait_for_armed(p, deadline_s=60):
    t0 = time.monotonic()
    while time.monotonic() - t0 < deadline_s:
        line = p.stderr.readline()
        if not line:  # EOF: process died before arming
            break
        if b"bench-reporter-armed" in line:
            return True
    return False


def test_bench_sigterm_emits_error_json(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    p = subprocess.Popen(
        [sys.executable, "bench.py"], cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        env=_hermetic_env(tmp_path))
    try:
        assert _wait_for_armed(p), "bench.py never armed its reporter"
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=120)
    finally:
        p.kill()
    lines = out.decode().strip().splitlines()
    assert lines, "SIGTERM-killed bench run printed nothing"
    rec = json.loads(lines[-1])
    assert rec["metric"] == "ufno_train_samples_per_sec_per_chip_128x128"
    assert rec["value"] is None
    assert "killed by signal" in rec["error"]
    # exit-code contract: 3 = signal kill (2 = tunnel watchdog)
    assert p.returncode == 3
    # the cached last on-chip measurement rides along when present
    if os.path.exists(os.path.join(repo, "experiments", "bench_last.json")):
        assert rec["last_measured"]["value"] is not None


def test_bench_headline_survives_budget_timeout(tmp_path):
    """Mid-extras timeout simulation: with a zero extras budget the
    headline is still measured, printed, and non-null (the round-3 driver
    record was null because everything printed at the end)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = _hermetic_env(tmp_path)
    env.update(NPS_BENCH_TINY="1", NPS_BENCH_NX="16", NPS_BENCH_TW="5",
               NPS_BENCH_BATCH="2", NPS_BENCH_STEPS="2",
               NPS_BENCH_BUDGET_S="0",
               # keep the hermetic run from touching the shared cache dir
               NPS_COMPILE_CACHE="0",
               HOME=str(tmp_path))
    p = subprocess.Popen(
        [sys.executable, "bench.py"], cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env)
    try:
        out, _ = p.communicate(timeout=600)
    finally:
        p.kill()
    lines = [ln for ln in out.decode().strip().splitlines()
             if ln.startswith("{")]
    assert lines, "budget-limited bench printed no result line"
    rec = json.loads(lines[-1])
    assert p.returncode == 0
    assert rec["value"] is not None and rec["value"] > 0
    assert rec["extra"]["depth1_samples_per_sec"] > 0
    assert rec["extra"]["truncated"] == "budget"
    # extras must NOT have run
    assert "rollout_bundled_steps_per_sec" not in rec["extra"]
    # every printed line is a complete, parseable result (headline-first
    # protocol: the driver may take any line, it takes the last)
    for ln in lines:
        r = json.loads(ln)
        assert r["value"] is not None
