"""Advisory single-chip lock for the serialized TPU tunnel.

The axon TPU tunnel admits ONE client process at a time: a second process
calling ``jax.devices()`` blocks in C until the first exits. An unattended
benchmark (the driver runs ``bench.py`` at round end on a timeout) that
starts while a long training run holds the tunnel therefore hangs until its
watchdog kills it — which is exactly how round 3 ended with a null bench
record.

Protocol (advisory, PID-file based — no new dependency):

- A process that is about to hold the chip for a long time (the trainer,
  when its resolved platform is ``tpu``) calls :func:`advertise`, which
  atomically writes its PID to ``$NPS_CHIP_LOCK`` (default
  ``/tmp/nps_chip.lock``) and registers an atexit cleanup that removes the
  file only if it still names this process.
- A latency-critical taker (``bench.py``) calls :func:`preempt_holder`
  first: if a live holder is advertised, it receives SIGTERM — the trainer
  converts that into a batch-boundary checkpoint + clean exit via its
  preemption handlers (``train/base.py _install_preempt_handlers``) — and
  the taker waits for the PID to vanish before touching ``jax.devices()``.
  If the holder survives the grace period (e.g. wedged inside a remote XLA
  compile where Python signal handlers cannot run), it is SIGKILLed: the
  kernel teardown of the client socket frees the tunnel regardless of what
  the process was doing.

Signals are addressed to the exact advertised PID (never pattern-matched),
and a stale lock (dead PID) is removed on sight, so crashed holders do not
block future takers.
"""

import atexit
import errno
import os
import signal
import sys
import time

__all__ = ["lock_path", "advertise", "holder", "release", "preempt_holder"]


def lock_path():
    return os.environ.get("NPS_CHIP_LOCK", "/tmp/nps_chip.lock")


def _pid_alive(pid):
    try:
        os.kill(pid, 0)
    except OSError as e:
        return e.errno == errno.EPERM  # alive but not ours
    return True


def advertise():
    """Record this process as the current chip holder (last writer wins)."""
    path = lock_path()
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        with open(tmp, "w") as f:
            f.write(str(os.getpid()))
        os.replace(tmp, path)
    except OSError:
        return  # advisory: never fail the training run over the lock
    atexit.register(release)


def release():
    """Remove the lock iff it still names this process."""
    path = lock_path()
    try:
        with open(path) as f:
            if int(f.read().strip() or 0) == os.getpid():
                os.unlink(path)
    except (OSError, ValueError):
        pass


def holder():
    """PID of the live advertised holder, or None (stale locks removed)."""
    path = lock_path()
    try:
        with open(path) as f:
            pid = int(f.read().strip())
    except (OSError, ValueError):
        return None
    if pid == os.getpid() or not _pid_alive(pid):
        if pid != os.getpid():
            try:  # stale: holder died without cleanup
                os.unlink(path)
            except OSError:
                pass
        return None
    return pid


def preempt_holder(grace_s=300.0, kill_wait_s=15.0, log=None):
    """Evict a live advertised holder so this process can take the tunnel.

    SIGTERM first (the trainer checkpoints and exits cleanly), SIGKILL if
    it outlives ``grace_s`` (a holder blocked in a C call never runs its
    Python signal handler; killing the client is the documented way to
    unwedge the tunnel). Returns the evicted PID or None if the chip was
    already free. Idempotent and race-tolerant: a holder exiting on its own
    mid-eviction is success.
    """
    log = log or (lambda msg: print(msg, file=sys.stderr, flush=True))
    pid = holder()
    if pid is None:
        return None
    log(f"[chip-lock] preempting advertised chip holder pid={pid} "
        f"(SIGTERM, grace {grace_s:.0f}s)")
    try:
        os.kill(pid, signal.SIGTERM)
    except OSError:
        return pid  # exited between holder() and kill: free
    deadline = time.monotonic() + grace_s
    while time.monotonic() < deadline:
        if not _pid_alive(pid):
            log(f"[chip-lock] holder pid={pid} exited cleanly")
            return pid
        time.sleep(0.5)
    log(f"[chip-lock] holder pid={pid} survived SIGTERM grace; SIGKILL")
    try:
        os.kill(pid, signal.SIGKILL)
    except OSError:
        return pid
    deadline = time.monotonic() + kill_wait_s
    while time.monotonic() < deadline and _pid_alive(pid):
        time.sleep(0.2)
    return pid
