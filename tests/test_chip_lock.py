"""Chip-lock protocol tests (utils/chip_lock.py).

The axon TPU tunnel is single-client; the driver's round-end ``bench.py``
must be able to evict a long-running trainer that holds it. These tests
exercise the advisory PID-file protocol with real subprocesses:

1. a stale lock (dead PID) is ignored and removed,
2. a graceful holder is SIGTERMed and exits within the grace window,
3. a holder ignoring SIGTERM is SIGKILLed after the grace window,
4. end-to-end: a tiny hermetic ``bench.py`` run evicts an advertised
   holder before measuring, and still prints its headline line.
"""

import json
import os
import signal
import subprocess
import sys
import textwrap
import time

import pytest

from nps_tpu.utils import chip_lock

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def lock(tmp_path, monkeypatch):
    path = str(tmp_path / "chip.lock")
    monkeypatch.setenv("NPS_CHIP_LOCK", path)
    return path


def _spawn_holder(lock_path, marker, ignore_sigterm=False):
    """Child that writes its PID to the lock and sleeps; on SIGTERM it
    writes ``marker`` and exits 0 (unless told to ignore the signal)."""
    code = textwrap.dedent(f"""
        import os, signal, sys, time
        with open({lock_path!r}, "w") as f:
            f.write(str(os.getpid()))
        if {ignore_sigterm!r}:
            signal.signal(signal.SIGTERM, signal.SIG_IGN)
        else:
            def bye(sig, frame):
                open({marker!r}, "w").write("checkpointed")
                sys.exit(0)
            signal.signal(signal.SIGTERM, bye)
        print("holder-ready", flush=True)
        while True:
            time.sleep(0.2)
    """)
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE)
    assert b"holder-ready" in p.stdout.readline()
    return p


def test_stale_lock_removed(lock):
    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait()
    with open(lock, "w") as f:
        f.write(str(p.pid))
    assert chip_lock.holder() is None
    assert not os.path.exists(lock)
    assert chip_lock.preempt_holder() is None  # no-op on a free chip


def test_own_pid_is_not_a_holder(lock):
    with open(lock, "w") as f:
        f.write(str(os.getpid()))
    assert chip_lock.holder() is None
    os.unlink(lock)


def test_preempt_graceful_holder(lock, tmp_path):
    marker = str(tmp_path / "ckpt")
    p = _spawn_holder(lock, marker)
    try:
        assert chip_lock.holder() == p.pid
        evicted = chip_lock.preempt_holder(grace_s=30, log=lambda m: None)
        assert evicted == p.pid
        assert p.wait(timeout=10) == 0
        assert os.path.exists(marker), "holder never ran its SIGTERM path"
    finally:
        p.kill()


def test_preempt_stubborn_holder_is_killed(lock, tmp_path):
    p = _spawn_holder(lock, str(tmp_path / "never"), ignore_sigterm=True)
    try:
        evicted = chip_lock.preempt_holder(grace_s=1.0, kill_wait_s=10,
                                           log=lambda m: None)
        assert evicted == p.pid
        assert p.wait(timeout=10) == -signal.SIGKILL
    finally:
        p.kill()


def test_bench_evicts_holder_end_to_end(lock, tmp_path):
    """The driver scenario: bench.py starts while a holder owns the chip.
    Tiny hermetic shapes; the holder must be gone and the headline real."""
    marker = str(tmp_path / "ckpt")
    p = _spawn_holder(lock, marker)
    env = dict(os.environ)
    env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               # hermetic CPU runs skip preemption unless a test explicitly
               # opts in (ADVICE r4: NPS_CHIP_LOCK presence must not arm it)
               NPS_BENCH_FORCE_PREEMPT="1",
               NPS_CHIP_LOCK=lock, NPS_BENCH_TINY="1", NPS_BENCH_NX="16",
               NPS_BENCH_TW="5", NPS_BENCH_BATCH="2", NPS_BENCH_STEPS="2",
               NPS_BENCH_BUDGET_S="0", NPS_BENCH_PREEMPT_S="30")
    try:
        out = subprocess.run(
            [sys.executable, "bench.py"], cwd=REPO, env=env,
            capture_output=True, timeout=600)
        assert out.returncode == 0, out.stderr.decode()[-2000:]
        rec = json.loads(out.stdout.decode().strip().splitlines()[-1])
        assert rec["value"] is not None and rec["value"] > 0
        assert b"preempting advertised chip holder" in out.stderr
        assert p.wait(timeout=10) == 0
        assert os.path.exists(marker)
    finally:
        p.kill()
