"""Driver-facing bench.py contract: a bounded run always yields one
parseable JSON result line, even when killed by the driver's timeout
mid-compile (bench.py installs a SIGTERM reporter at main() start)."""

import json
import os
import signal
import subprocess
import sys
import time


def test_bench_sigterm_emits_error_json():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # hermetic: keep the subprocess off the TPU tunnel (verify-skill recipe)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    p = subprocess.Popen(
        [sys.executable, "bench.py"], cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env)
    # generous margin for module imports on a loaded 1-vCPU host; the
    # handler installs on main()'s first line, long before any compile
    time.sleep(8)
    p.send_signal(signal.SIGTERM)
    out, _ = p.communicate(timeout=120)
    lines = out.decode().strip().splitlines()
    assert lines, "SIGTERM-killed bench run printed nothing"
    rec = json.loads(lines[-1])
    assert rec["metric"] == "ufno_train_samples_per_sec_per_chip_128x128"
    assert rec["value"] is None
    assert "killed by signal" in rec["error"]
    # the cached last on-chip measurement rides along when present
    if os.path.exists(os.path.join(repo, "experiments", "bench_last.json")):
        assert rec["last_measured"]["value"] is not None
